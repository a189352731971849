"""Offline JSON-LD context loader.

The reference CLI mounts URL prefixes onto directories (FsLoader,
reference: src/bin/main.rs:143-151, tests/common.rs:11-52) with an
optional online fallback.  On a Spark executor, network fetches are
forbidden (determinism + scale), so the loader is a plain dict
``{url -> parsed context document}`` built once per process from the
vendored context corpus and shared via closure capture / broadcast: it is
tiny (~43 KB of JSON) and stateless.

``StaticLoader.default()`` enumerates every file under the packaged
``fixtures/contexts`` tree using the same URL prefix -> directory mounts
as the reference test-suite, producing a finite url->document map.
"""

from __future__ import annotations

import json
import os
from functools import lru_cache
from importlib import resources

from .errors import ContextError


def fixtures_root():
    """Traversable root of the packaged fixtures (zip-safe for --py-files)."""
    return resources.files("cbor_ld_spark") / "fixtures"


def read_fixture_text(*parts: str) -> str:
    node = fixtures_root()
    for p in parts:
        node = node / p
    return node.read_text(encoding="utf-8")

# URL prefix -> path under fixtures/contexts (mirrors tests/common.rs:11-52)
DEFAULT_MOUNTS: tuple[tuple[str, str], ...] = (
    ("https://www.w3.org/ns/activitystreams", "activitystreams"),
    ("https://w3id.org/security", "security"),
    ("https://www.w3.org/2018/credentials", "credentials"),
    ("https://www.w3.org/ns/credentials", "credentials"),
    ("https://w3id.org/age", "age"),
    ("https://w3id.org/cit", "cit"),
    ("https://w3id.org/citizenship", "citizenship"),
    ("https://w3id.org/vc-barcodes", "vc-barcodes"),
    ("https://w3id.org/utopia", "utopia"),
)


class StaticLoader:
    """Finite url -> parsed-JSON-document loader."""

    def __init__(self, documents: dict[str, object]):
        self.documents = documents

    def load(self, url: str):
        try:
            return self.documents[url]
        except KeyError:
            raise ContextError("LoadingDocumentFailed", url) from None

    @staticmethod
    def from_mounts(contexts_root,
                    mounts: tuple[tuple[str, str], ...] = DEFAULT_MOUNTS) -> "StaticLoader":
        """``contexts_root``: filesystem path or importlib Traversable."""
        if isinstance(contexts_root, (str, os.PathLike)):
            from pathlib import Path

            contexts_root = Path(contexts_root)
        docs: dict[str, object] = {}

        def walk(node, url):
            if node.is_file():
                docs[url] = json.loads(node.read_text(encoding="utf-8"))
            elif node.is_dir():
                for child in node.iterdir():
                    if child.name == "__init__.py":
                        continue
                    walk(child, f"{url}/{child.name}")

        for url_prefix, rel in mounts:
            node = contexts_root
            for part in rel.split("/"):
                node = node / part
            try:
                walk(node, url_prefix)
            except (FileNotFoundError, NotADirectoryError):
                continue
        return StaticLoader(docs)

    @staticmethod
    @lru_cache(maxsize=1)
    def default() -> "StaticLoader":
        return StaticLoader.from_mounts(fixtures_root() / "contexts")
