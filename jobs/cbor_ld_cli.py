#!/usr/bin/env python3
"""cbor-ld CLI: 1:1 user surface of the reference binary.

Mirrors reference src/bin/main.rs:15-190 flag-for-flag so a user of the
reference tool can switch invocations unchanged:

    python3 jobs/cbor_ld_cli.py encode [INPUT] [-x] [-m IRI=PATH]... \
        [-o] [-t CONFIG.toml]...
    python3 jobs/cbor_ld_cli.py decode [INPUT] [-x] ...

* INPUT omitted -> stdin (main.rs:120-129)
* ``-x/--hexadecimal`` -> hex framing on the byte side (main.rs:60-72)
* ``-m/--mount IRI=PATH`` -> file-system context mounts (main.rs:28-37)
* ``-o/--offline`` accepted for compatibility; this engine is ALWAYS
  offline (remote context fetching does not exist here by design —
  determinism at corpus scale), so unmounted context URLs fail either
  way (main.rs:38-44 is the reference's opt-in for the same behavior)
* ``-t/--config`` TOML files with ``offline`` and a ``[mount]`` table,
  merged left-to-right like the reference (main.rs:27-51,135-140)
* encode writes bytes (or hex) to stdout; decode pretty-prints JSON to
  stderr — matching the reference's (surprising) eprintln choice
  (main.rs:185)

Superset: ``--registry N`` selects the compression-table registry
(default 1); the reference CLI always uses the default registry.
Custom tables — including varint ids >= 128, which the reference
``todo!()``s (src/encode/mod.rs:62) — register from the TOML config:

    [registry.1000.contexts]
    "https://example.org/ctx/v1" = 32768

    [registry.1000.types."https://w3id.org/security#cryptosuiteString"]
    "my-suite-2026" = 1

then ``--registry 1000`` encodes under the varint envelope and decode
recognizes it (the table must be registered on both sides, like any
out-of-band CBOR-LD registry agreement).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _build_loader(mounts):
    from cbor_ld_spark.kernel.loader import StaticLoader

    base = dict(StaticLoader.default().documents)

    def walk(path, url):
        if os.path.isfile(path):
            try:
                with open(path, encoding="utf-8") as f:
                    base[url] = json.load(f)
            except (ValueError, UnicodeDecodeError):
                pass  # non-JSON file inside a mounted tree: not a context
        elif os.path.isdir(path):
            for name in sorted(os.listdir(path)):
                walk(os.path.join(path, name), f"{url}/{name}")

    for iri, path in mounts:
        walk(path, iri.rstrip("/"))
    return StaticLoader(base)


def _parse_mount(value: str):
    if "=" not in value:
        raise argparse.ArgumentTypeError(
            f"invalid mount value {value!r} (expected IRI=PATH)")
    iri, _, path = value.partition("=")
    return iri, path


def _load_config(path: str):
    """TOML config: ``offline = bool``, ``[mount]`` table of iri = path,
    and ``[registry.N]`` custom compression tables (contexts / types).

    A registry entry whose id collides with a built-in table is rejected
    as a typed error unless the entry sets ``replace = true`` — an
    explicit opt-in, because overriding e.g. table 100 silently changes
    decode semantics for every existing payload using that id."""
    import tomllib

    with open(path, "rb") as f:
        cfg = tomllib.load(f)
    mounts = [(iri, p) for iri, p in cfg.get("mount", {}).items()]
    registries = {}
    for rid, spec in cfg.get("registry", {}).items():
        registries[int(rid)] = (dict(spec.get("contexts", {})),
                                {t: dict(m)
                                 for t, m in spec.get("types", {}).items()},
                                bool(spec.get("replace", False)))
    return mounts, bool(cfg.get("offline", False)), registries


def _read_input(path):
    if path:
        with open(path, "rb") as f:
            return f.read()
    return sys.stdin.buffer.read()


def main(argv=None) -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    ap = argparse.ArgumentParser(prog="cbor-ld")
    ap.add_argument("-m", "--mount", type=_parse_mount, action="append",
                    default=[], help="context mount IRI=PATH")
    ap.add_argument("-o", "--offline", action="store_true",
                    help="offline loader (always true in this engine)")
    ap.add_argument("-t", "--config", action="append", default=[],
                    help="TOML configuration file")
    sub = ap.add_subparsers(dest="command", required=True)
    for name in ("encode", "decode"):
        p = sub.add_parser(name)
        p.add_argument("input", nargs="?", default=None)
        p.add_argument("-x", "--hexadecimal", action="store_true")
        p.add_argument("--registry", type=int, default=1)
        if name == "decode":
            p.add_argument(
                "-p", "--pretty", action="store_true",
                help="write pretty-printed JSON to STDOUT (scriptable; "
                     "the default mirrors the reference CLI, which "
                     "pretty-prints to stderr — src/bin/main.rs:186)")
            p.add_argument(
                "--canonical", action="store_true",
                help="write canonical JSON (sorted keys, compact — the "
                     "content_sha256 serialization) to STDOUT: "
                     "deterministic bytes for shell round-trip checks")
    args = ap.parse_args(argv)

    mounts = list(args.mount)
    registries = {}
    for cfg_path in args.config:
        cfg_mounts, _offline, cfg_registries = _load_config(cfg_path)
        mounts.extend(cfg_mounts)
        registries.update(cfg_registries)  # left-to-right merge

    from cbor_ld_spark.kernel import (
        CborLdError,
        decode_document,
        encode_document,
        parse_json_document,
    )
    from cbor_ld_spark.kernel.tables import Tables, register_tables

    loader = _build_loader(mounts)
    try:
        # inside the error envelope: a TOML registry id colliding with a
        # built-in table (e.g. 100) is a typed EncodeError, not a
        # traceback, unless the entry opts in with ``replace = true``
        for rid, (contexts, types, replace) in registries.items():
            register_tables(rid, Tables(contexts=contexts, types=types),
                            replace=replace)
        if args.command == "encode":
            doc = parse_json_document(_read_input(args.input))
            data = encode_document(doc, registry_id=args.registry,
                                   loader=loader)
            if args.hexadecimal:
                sys.stdout.write(data.hex())
            else:
                sys.stdout.buffer.write(data)
        else:
            raw = _read_input(args.input)
            if args.hexadecimal:
                raw = bytes.fromhex(raw.decode("ascii").strip())
            doc = decode_document(raw, loader=loader)
            if getattr(args, "canonical", False):
                from cbor_ld_spark.kernel.canonical import canonical_json

                # canonical form: sha256(stdout bytes) == the pipeline's
                # content_sha256 invariant, so shell scripts can verify
                # round-trips without Python
                sys.stdout.write(canonical_json(doc))
            elif getattr(args, "pretty", False):
                print(json.dumps(doc, indent=2, ensure_ascii=False))
            else:
                # the reference pretty-prints decoded JSON to stderr
                # (src/bin/main.rs:186)
                print(json.dumps(doc, indent=2, ensure_ascii=False),
                      file=sys.stderr)
        return 0
    except (CborLdError, ValueError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
