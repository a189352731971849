"""Compression-table registry (CBOR-LD tag dispatch).

Mirrors the reference registry (reference: src/tables/registry.rs:11-82,
src/tables/mod.rs:11-102): registry id 1 = Default (empty tables), 100 =
VC Barcodes (3 pinned context URLs + the cryptosuiteString value
dictionary).  The CBOR-LD envelope tag is ``0x06 << 8 | registry_id``
(reference: src/lib.rs:113-114, src/encode/mod.rs:55-63).

These tables are tiny read-only dicts: on Spark they ride along in the
UDF closure (equivalent to a broadcast variable for objects this small).
"""

from __future__ import annotations

from .errors import DecodeError, EncodeError

CBOR_LD_TAG_HIGH = 0x06

CRYPTOSUITE_STRING = "https://w3id.org/security#cryptosuiteString"


class Tables:
    __slots__ = ("context_to_id", "id_to_context", "type_tables", "type_tables_rev")

    def __init__(self,
                 contexts: dict[str, int] | None = None,
                 types: dict[str, dict[str, int]] | None = None):
        self.context_to_id = dict(contexts or {})
        self.id_to_context = {v: k for k, v in self.context_to_id.items()}
        self.type_tables = {t: dict(m) for t, m in (types or {}).items()}
        self.type_tables_rev = {
            t: {v: k for k, v in m.items()} for t, m in self.type_tables.items()
        }

    # TypeTable::encode / decode (reference: src/tables/mod.rs:68-83)
    def encode_typed(self, type_iri: str, value: str):
        table = self.type_tables.get(type_iri)
        if table is None:
            return None  # no table for this type
        tid = table.get(value)
        return tid if tid is not None else value

    def decode_typed(self, type_iri: str, value):
        rev = self.type_tables_rev.get(type_iri)
        if rev is None:
            return None
        if isinstance(value, str):
            # encode emits out-of-table values as verbatim text
            # (reference src/tables/mod.rs:72) but its decode then
            # rejects them (reference asymmetry); a text passthrough
            # keeps the encoder's own output decodable
            return value
        if isinstance(value, bool) or not isinstance(value, int):
            raise DecodeError("InvalidValue", f"type table expects integer, got {value!r}")
        out = rev.get(value)
        if out is None:
            raise DecodeError("InvalidValue", f"unknown {type_iri} id {value}")
        return out

    def has_type_table(self, type_iri: str) -> bool:
        return type_iri in self.type_tables


DEFAULT_TABLES = Tables()

VC_BARCODES_TABLES = Tables(
    contexts={
        "https://www.w3.org/ns/credentials/v2": 32768,
        "https://w3id.org/vc-barcodes/v1": 32769,
        "https://w3id.org/utopia/v2": 32770,
    },
    types={
        CRYPTOSUITE_STRING: {
            "ecdsa-rdfc-2019": 1,
            "ecdsa-sd-2023": 2,
            "eddsa-rdfc-2022": 3,
            "ecdsa-xi-2023": 4,
        }
    },
)

REGISTRY: dict[int, Tables] = {
    1: DEFAULT_TABLES,
    100: VC_BARCODES_TABLES,
}


def tables_for_registry(registry_id: int) -> Tables:
    try:
        return REGISTRY[registry_id]
    except KeyError:
        raise EncodeError("UnknownCompressionTable", str(registry_id)) from None


_BUILTIN_IDS = frozenset(REGISTRY)


def register_tables(registry_id: int, tables: Tables,
                    replace: bool = False) -> None:
    """Register a custom compression table (spec: registry entries >= 2
    are open for private/registered use).  Ids 0 (uncompressed) and 1
    (default) are reserved.  Registering over a built-in id (e.g. 100,
    VC barcodes) silently changes decode semantics for existing
    payloads, so it is rejected unless ``replace=True`` is passed
    explicitly."""
    if registry_id in (0, 1):
        raise EncodeError("UnsupportedRegistryId",
                          f"{registry_id} is reserved")
    if registry_id in _BUILTIN_IDS and not replace:
        raise EncodeError(
            "UnsupportedRegistryId",
            f"{registry_id} is a built-in table (pass replace=True to "
            "override)")
    REGISTRY[registry_id] = tables


# --- varint registry ids (>= 128) ------------------------------------------
#
# CBOR-LD encodes the registry entry as an unsigned LEB128 varint: the
# FIRST varint byte rides in the envelope tag's low byte, and for ids
# >= 128 (first byte has the continuation bit set) the REMAINING varint
# bytes are prepended to the payload as ``[bstr(rest), payload]``.
# Ids < 128 are a single varint byte == the id itself, so the classic
# 0x06NN single-byte scheme is the varint scheme's degenerate case.
# The Rust reference leaves this ``todo!()`` (src/encode/mod.rs:62,
# src/decode/mod.rs:50); the CBOR-LD spec and the JS implementation
# define it, so we support it.


def varint_encode(n: int) -> bytes:
    if n < 0:
        raise EncodeError("UnsupportedRegistryId", str(n))
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def varint_decode(bs: bytes) -> int:
    n, shift = 0, 0
    for i, b in enumerate(bs):
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            if i != len(bs) - 1:
                raise EncodeError("UnsupportedRegistryId",
                                  "trailing bytes after registry varint")
            if i > 0 and b == 0:
                # minimal-encoding rule: a multi-byte varint whose final
                # byte is 0 aliases a shorter encoding (e.g. 0x81 0x00
                # decodes to 1, colliding with the single-byte tag form) —
                # two distinct byte forms must not decode identically
                raise EncodeError("UnsupportedRegistryId",
                                  "non-minimal registry varint")
            return n
        shift += 7
        if shift > 63:
            raise EncodeError("UnsupportedRegistryId",
                              "registry varint too long")
    raise EncodeError("UnsupportedRegistryId", "truncated registry varint")


def registry_tag(registry_id: int) -> tuple[int, bytes]:
    """(envelope tag, remaining varint bytes) for a registry id."""
    v = varint_encode(registry_id)
    return (CBOR_LD_TAG_HIGH << 8) | v[0], v[1:]
