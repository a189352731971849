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


def byte_diff(value: bytes, expected: bytes, color: bool = False) -> str:
    """Positional hex diff of two byte strings (F6; reference
    tests/common.rs:107-155).

    Walks both buffers in lockstep and renders ``value``'s hex with the
    reference's four states: equal, different, missing (expected has
    more bytes), added (value has more bytes).  ``color=True`` emits
    the reference's ANSI styling (green / red / white-on-red-strike /
    white-on-green); the default plain form wraps runs in ``!{...}``,
    ``-{...}``, ``+{...}`` markers so pytest failure output stays
    readable without a terminal.
    """
    EQ, NEQ, MISSING, ADDED = range(4)
    ansi = {EQ: "\x1b[32m", NEQ: "\x1b[31m",
            MISSING: "\x1b[37;41;9m", ADDED: "\x1b[37;42m"}
    open_m = {NEQ: "!{", MISSING: "-{", ADDED: "+{"}

    out: list[str] = []
    state = None

    def emit(b: int, next_state: int) -> None:
        nonlocal state
        if state != next_state:
            if color:
                out.append(ansi[next_state])
            else:
                if state in open_m:
                    out.append("}")
                if next_state in open_m:
                    out.append(open_m[next_state])
            state = next_state
        out.append(f"{b:02x}")

    for i in range(max(len(value), len(expected))):
        if i < len(value) and i < len(expected):
            emit(value[i], EQ if value[i] == expected[i] else NEQ)
        elif i < len(value):
            emit(value[i], ADDED)
        else:
            emit(expected[i], MISSING)
    if color:
        out.append("\x1b[0m")
    elif state in open_m:
        out.append("}")
    return "".join(out)
