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

from .errors import ContextError

_FIXTURES_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "fixtures")

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
    def from_mounts(contexts_dir: str,
                    mounts: tuple[tuple[str, str], ...] = DEFAULT_MOUNTS) -> "StaticLoader":
        docs: dict[str, object] = {}
        for url_prefix, rel in mounts:
            root = os.path.join(contexts_dir, rel)
            if os.path.isfile(root):
                docs[url_prefix] = _parse_file(root)
            elif os.path.isdir(root):
                for dirpath, _dirs, files in os.walk(root):
                    for fname in files:
                        fpath = os.path.join(dirpath, fname)
                        suffix = os.path.relpath(fpath, root).replace(os.sep, "/")
                        docs[f"{url_prefix}/{suffix}"] = _parse_file(fpath)
        return StaticLoader(docs)

    @staticmethod
    @lru_cache(maxsize=1)
    def default() -> "StaticLoader":
        return StaticLoader.from_mounts(os.path.join(_FIXTURES_DIR, "contexts"))


def _parse_file(path: str):
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)
