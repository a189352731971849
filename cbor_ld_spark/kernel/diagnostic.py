"""CBOR diagnostic notation (RFC 8949 §8) renderer.

Parity with the reference's human-readable CBOR printer
(reference: src/diagnostic.rs:28-85); used in error messages and for
eyeballing encoded documents (``cbor-diag``-style output).
"""

from __future__ import annotations

from .cbor import CborMap, CborTag


def diagnostic(value, indent: int = 0, step: int = 2) -> str:
    pad = " " * indent
    nxt = indent + step
    if value is None:
        return "null"
    if value is True:
        return "true"
    if value is False:
        return "false"
    if isinstance(value, (int, float)):
        return repr(value)
    if isinstance(value, str):
        return '"' + value.replace("\\", "\\\\").replace('"', '\\"') + '"'
    if isinstance(value, (bytes, bytearray)):
        return f"h'{bytes(value).hex()}'"
    if isinstance(value, CborTag):
        return f"{value.tag}({diagnostic(value.value, indent, step)})"
    if isinstance(value, list):
        if not value:
            return "[]"
        inner = ",\n".join(
            " " * nxt + diagnostic(v, nxt, step) for v in value)
        return "[\n" + inner + "\n" + pad + "]"
    if isinstance(value, CborMap):
        if not len(value):
            return "{}"
        inner = ",\n".join(
            " " * nxt + f"{diagnostic(k, nxt, step)}: "
            f"{diagnostic(v, nxt, step)}" for k, v in value)
        return "{\n" + inner + "\n" + pad + "}"
    raise TypeError(f"not a CBOR value: {type(value)!r}")
