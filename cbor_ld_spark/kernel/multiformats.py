"""Multibase + base58btc support (pure Python, no external deps).

The reference relies on the ``multibase`` crate for two codecs:

* ``MultibaseCodec`` — multibase string <-> [base-code-byte ++ raw bytes]
  (reference: src/codecs/multibase.rs:7-42),
* ``Base58DidMethodCodec`` — did:key / did:v1:nym suffixes
  (reference: src/codecs/iri/did.rs:8-61).

Only the bases that actually occur in CBOR-LD credential payloads are
implemented: base58btc (``z``), base64url-no-pad (``u``), base64-no-pad
(``m``), base64pad (``M``), base16 (``f``), base32 (``b``).  Unknown base
prefixes raise ValueError which the codecs surface as per-row errors.
"""

from __future__ import annotations

import base64
from functools import lru_cache

B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
_B58_INDEX = {c: i for i, c in enumerate(B58_ALPHABET)}


# Corpus documents repeat the same did:key / proofValue strings heavily;
# big-int base58 is ~10% of kernel time, so memoize both directions.
@lru_cache(maxsize=8192)
def base58btc_encode(data: bytes) -> str:
    n = int.from_bytes(data, "big")
    out = []
    while n:
        n, r = divmod(n, 58)
        out.append(B58_ALPHABET[r])
    pad = 0
    for b in data:
        if b == 0:
            pad += 1
        else:
            break
    return "1" * pad + "".join(reversed(out))


@lru_cache(maxsize=8192)
def base58btc_decode(s: str) -> bytes:
    n = 0
    for c in s:
        try:
            n = n * 58 + _B58_INDEX[c]
        except KeyError:
            raise ValueError(f"invalid base58 character {c!r}")
    raw = n.to_bytes((n.bit_length() + 7) // 8, "big") if n else b""
    pad = 0
    for c in s:
        if c == "1":
            pad += 1
        else:
            break
    return b"\x00" * pad + raw


import re as _re

_B64_RE = _re.compile(r"^[A-Za-z0-9+/]*$")
_B64URL_RE = _re.compile(r"^[A-Za-z0-9\-_]*$")


def _b64_decode_nopad(s: str, urlsafe: bool) -> bytes:
    # strict: Python's b64decode silently drops invalid characters unless
    # validated, which would corrupt values across a round trip (the
    # reference's multibase crate rejects them)
    if "=" in s:
        raise ValueError("unexpected base64 padding")
    if not (_B64URL_RE if urlsafe else _B64_RE).match(s):
        raise ValueError("invalid base64 character")
    padded = s + "=" * (-len(s) % 4)
    fn = base64.urlsafe_b64decode if urlsafe else base64.b64decode
    return fn(padded.encode("ascii"))


def _b64_encode_nopad(b: bytes, urlsafe: bool) -> str:
    fn = base64.urlsafe_b64encode if urlsafe else base64.b64encode
    return fn(b).decode("ascii").rstrip("=")


def multibase_decode(value: str) -> tuple[str, bytes]:
    """Return (base_code_char, raw bytes)."""
    if not value:
        raise ValueError("empty multibase string")
    code, rest = value[0], value[1:]
    if code == "z":
        return code, base58btc_decode(rest)
    if code == "u":
        return code, _b64_decode_nopad(rest, urlsafe=True)
    if code == "m":
        return code, _b64_decode_nopad(rest, urlsafe=False)
    if code == "M":
        return code, base64.b64decode(rest.encode("ascii"), validate=True)
    if code == "f":
        return code, bytes.fromhex(rest)
    if code == "b":
        s = rest.upper() + "=" * (-len(rest) % 8)
        return code, base64.b32decode(s.encode("ascii"))
    raise ValueError(f"unknown multibase prefix {code!r}")


def multibase_encode(code: str, data: bytes) -> str:
    if code == "z":
        return "z" + base58btc_encode(data)
    if code == "u":
        return "u" + _b64_encode_nopad(data, urlsafe=True)
    if code == "m":
        return "m" + _b64_encode_nopad(data, urlsafe=False)
    if code == "M":
        return "M" + base64.b64encode(data).decode("ascii")
    if code == "f":
        return "f" + data.hex()
    if code == "b":
        return "b" + base64.b32encode(data).decode("ascii").rstrip("=").lower()
    raise ValueError(f"unknown multibase prefix {code!r}")
