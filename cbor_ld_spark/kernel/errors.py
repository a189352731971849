"""Error taxonomy for the CBOR-LD kernel.

Mirrors the reference's split into encode/decode error families
(reference: src/encode/error.rs:7-53, src/decode/error.rs:7-59) but as a
single lightweight hierarchy: in the distributed pipeline every error is
captured per-row into an ``error`` column (quarantine path) — a bad
document must never kill a partition, so errors carry a stable ``kind``
string that survives serialization into a DataFrame column.
"""

from __future__ import annotations


class CborLdError(Exception):
    """Base class for all kernel errors."""

    def __init__(self, kind: str, message: str = ""):
        self.kind = kind
        self.message = message
        super().__init__(f"{kind}: {message}" if message else kind)


class EncodeError(CborLdError):
    """JSON-LD -> CBOR-LD failures (reference: src/encode/error.rs)."""


class DecodeError(CborLdError):
    """CBOR-LD -> JSON-LD failures (reference: src/decode/error.rs)."""


class ContextError(CborLdError):
    """JSON-LD context processing failures (W3C JSON-LD 1.1 §4.1 error codes)."""


# Common constructors -------------------------------------------------------

def duplicate_key(key: object) -> CborLdError:
    return CborLdError("DuplicateEntry", f"duplicate key {key!r}")


def expected_object() -> CborLdError:
    return CborLdError("ExpectedObject", "document root must be an object")


def undefined_term(term: str) -> CborLdError:
    return CborLdError("UndefinedTerm", term)


def missing_id_for(term: str) -> EncodeError:
    return EncodeError("MissingIdFor", term)


def invalid_context_entry() -> EncodeError:
    # Inline (non-URL) context entries are uncompressible by design
    # (reference: src/encode/mod.rs:142-148, tests/suite.rs:60-67).
    return EncodeError("InvalidContextEntry", "context entry must be an IRI string")


def not_cbor_ld() -> DecodeError:
    return DecodeError("NotCborLd", "missing or invalid CBOR-LD tag")
