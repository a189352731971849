"""The CBOR-LD node transform: JSON-LD <-> CBOR-LD, both directions.

This is the row-level kernel of the distributed pipeline.  The encode and
decode directions are the *same* recursive algorithm instantiated twice
(reference: src/transform.rs:322-486, src/encode/mod.rs:126-259,
src/decode/mod.rs:129-272):

1. process the embedded ``@context`` (fold arrays left-to-right, emit the
   context-table id or verbatim URL, allocate term ids in sorted order),
2. collect the node's types (via ``@type``-alias detection), sort them,
   apply each type-scoped context with ``propagate=false``,
3. list entries as ``(term, plural, def, out_key, value)``, **sort by term
   name**, dispatch each: ``@id`` -> IRI codec, ``@type`` -> vocab terms,
   typed string leaf -> type table / type codec, otherwise recurse with
   the property-scoped context,
4. sort output entries by output key (integers ascending on encode,
   strings lexicographic on decode).

Everything is per-document and deterministic — both sides re-derive the
identical term-id table from the context chain, so there is no shared
state and each corpus row is independent (the invariant that lets Spark
run this in Arrow-batched pandas UDFs with zero coordination).
"""

from __future__ import annotations

import json
from typing import Any

from . import codecs
from .cbor import CborMap, CborTag, cbor_key_sort_key, dumps, loads
from .context import EMPTY_CONTEXT, ActiveContext, TermDefinition, process_context
from .errors import (
    CborLdError,
    DecodeError,
    EncodeError,
    duplicate_key,
    expected_object,
    invalid_context_entry,
    missing_id_for,
    not_cbor_ld,
    undefined_term,
)
from .idalloc import IdAllocator
from .keywords import is_keyword
from .loader import StaticLoader
from .tables import CBOR_LD_TAG_HIGH, Tables, registry_tag, tables_for_registry


def _force_as_array(value: Any, plural: bool) -> list:
    if plural and isinstance(value, list):
        return value
    return [value]


def _is_alias(active: ActiveContext, term: str, keyword: str) -> bool:
    if term == keyword:
        return True
    d = active.get(term)
    return d is not None and d.iri == keyword


def _is_alias_with_def(term: str, d: TermDefinition | None, keyword: str) -> bool:
    return term == keyword or (d is not None and d.iri == keyword)


class _TransformerBase:
    """Shared state + context machinery for both directions."""

    error_cls: type[CborLdError] = CborLdError

    def __init__(self, loader: StaticLoader, tables: Tables):
        self.loader = loader
        self.tables = tables
        self.allocator = IdAllocator()
        # context fingerprints whose allocation pass already ran for this
        # document; re-applying (nested repeats of the same chain) is a
        # no-op, so skip the whole term loop (~20% of kernel time)
        self._applied: set = set()
        # ordered sequence of first-applied fingerprints: allocator state
        # is a pure function of this sequence, so it can be snapshot-
        # cached process-wide and restored with two dict copies
        self._fp_seq: tuple = ()

    # -- context handling ----------------------------------------------------

    def _process_context_value(self, active: ActiveContext, context_value,
                               propagate: bool,
                               base_url: str | None = None,
                               override_protected: bool = False) -> ActiveContext:
        """Process one context (URL or inline syntax) + allocate term ids."""
        result = process_context(active, context_value, self.loader,
                                 base_url=base_url, propagate=propagate,
                                 override_protected=override_protected)
        fp = result.fingerprint
        if fp not in self._applied:
            self._applied.add(fp)
            new_seq = (*self._fp_seq, fp)
            snap = _ALLOC_SNAPSHOTS.get(new_seq)
            alloc = self.allocator
            if snap is not None:
                alloc.term_to_id = dict(snap[0])
                alloc.id_to_term = dict(snap[1])
                alloc.next_id = snap[2]
            else:
                allocate = alloc.allocate
                for term in result.alloc_terms:
                    allocate(term)
                if len(_ALLOC_SNAPSHOTS) >= 512:
                    _ALLOC_SNAPSHOTS.clear()
                _ALLOC_SNAPSHOTS[new_seq] = (dict(alloc.term_to_id),
                                             dict(alloc.id_to_term),
                                             alloc.next_id)
            self._fp_seq = new_seq
        return result

    def _process_context_url(self, active: ActiveContext, url: str,
                             propagate: bool) -> ActiveContext:
        return self._process_context_value(active, url, propagate)

    def process_global_context(self, active: ActiveContext, context_value,
                               propagate: bool):
        """Returns (output value for the @context entry, new active context)."""
        if self._is_input_array(context_value):
            out_entries = []
            for entry in context_value:
                out_value, active = self._process_global_context_entry(
                    active, entry, propagate)
                out_entries.append(out_value)
            return out_entries, active
        return self._process_global_context_entry(active, context_value, propagate)

    def _process_global_context_entry(self, active: ActiveContext, entry,
                                      propagate: bool):
        url = self.context_iri_ref(entry)
        out_value = self.context_id(entry, url)
        active = self._process_context_url(active, url, propagate)
        return out_value, active

    # -- node transform (the shared core) ------------------------------------

    def transform(self, active: ActiveContext, value):
        obj = self._as_input_object(value)
        if obj is None:
            raise expected_object()
        return self._wrap_object(self.transform_node(active, obj))

    def transform_node(self, active: ActiveContext, entries: list):
        result = []

        # 1. Embedded context.
        context_value = self._get_context_entry(entries)
        if context_value is not _MISSING:
            out_key = self.term_key("@context", self._is_input_array(context_value))
            out_value, active = self.process_global_context(
                active, context_value, propagate=True)
            result.append((out_key, out_value))

        # 2. Find + sort types, apply type-scoped contexts.
        types = []
        for key, value in entries:
            kt = self.key_term(key, value)
            if kt is None:
                continue
            term, plural = kt
            if _is_alias(active, term, "@type"):
                for ty in _force_as_array(value, plural):
                    types.append(self.value_term(active, ty))
        types.sort()
        for ty in types:
            d = active.get(ty)
            if d is not None and d.local_context is not None:
                active = self._process_context_value(
                    active, d.local_context, propagate=False,
                    base_url=d.base_url)

        # 3. Sort entries by term name.
        sorted_entries = []
        for key, value in entries:
            term, plural = self.required_key_term(key, value)
            if term == "@context":
                continue
            d = active.get(term)
            out_key = self.term_key(term, self._is_input_array(value))
            sorted_entries.append((term, plural, d, out_key, value))
        sorted_entries.sort(key=lambda e: e[0])

        # 4. Dispatch entries.
        for term, plural, d, out_key, value in sorted_entries:
            if _is_alias_with_def(term, d, "@id"):
                result.append((out_key, self.transform_id(value)))
                continue

            if _is_alias_with_def(term, d, "@type"):
                if plural:
                    if not self._is_input_array(value):
                        raise self.error_cls("InvalidTypeKind", term)
                    out_value = [self.transform_vocab(active, v) for v in value]
                else:
                    out_value = self.transform_vocab(active, value)
                result.append((out_key, out_value))
                continue

            if d is None:
                raise undefined_term(term)

            property_context = active
            if d.local_context is not None:
                # property-scoped: override protected (spec expansion §13.9)
                property_context = self._process_context_value(
                    active, d.local_context, propagate=True,
                    base_url=d.base_url, override_protected=True)

            values = _force_as_array(value, plural)
            out_values = []
            for v in values:
                out_v = self.transform_typed_value(active, v, d.type_)
                if out_v is _MISSING:
                    out_v = self.transform_object(property_context, v)
                out_values.append(out_v)

            result.append((out_key, out_values if plural else out_values[0]))

        result.sort(key=lambda e: self._out_key_sort_key(e[0]))
        return result

    # -- shared vocab term machinery (reference: src/transform.rs:541-588) ---

    def encode_vocab_term_str(self, active: ActiveContext, value: str):
        tid = self.allocator.encode_term(value, False)
        if tid is not None:
            return tid
        expanded = value
        if ":" in value:
            prefix, _, suffix = value.partition(":")
            pd = active.get(prefix)
            if pd is not None and pd.prefix:
                if pd.iri is None:
                    raise EncodeError("InvalidTermDefinition", prefix)
                expanded = f"{pd.iri}:{suffix}"
        if codecs.is_absolute_iri(expanded):
            return codecs.encode_iri(expanded)
        return value

    def decode_vocab_term_value(self, active: ActiveContext, value) -> str:
        if isinstance(value, bool):
            raise DecodeError("InvalidValue", repr(value))
        if isinstance(value, int):
            if value < 0:
                raise DecodeError("InvalidValue", str(value))
            decoded = self.allocator.decode_term(value)
            if decoded is None:
                raise DecodeError("UndefinedCompressedTerm", str(value))
            return decoded[0]
        if isinstance(value, str):
            return value
        return codecs.decode_iri(value)


_MISSING = object()

# (sequence of first-applied context fingerprints) -> allocator snapshot.
# Corpora reuse a handful of context chains, so after warmup every
# document restores its allocation table with two dict copies instead of
# replaying hundreds of idempotent allocations.
_ALLOC_SNAPSHOTS: dict[tuple, tuple[dict, dict, int]] = {}


class CborLdEncoder(_TransformerBase):
    """JSON-LD -> CBOR-LD (reference: src/encode/mod.rs:93-259)."""

    error_cls = EncodeError

    # input = parsed JSON (dict/list/scalars); input objects iterated as entries
    @staticmethod
    def _is_input_array(value) -> bool:
        return isinstance(value, list)

    @staticmethod
    def _as_input_object(value):
        if isinstance(value, dict):
            return list(value.items())
        return None

    @staticmethod
    def _wrap_object(entries: list):
        return CborMap(entries)

    @staticmethod
    def _get_context_entry(entries: list):
        found = _MISSING
        for k, v in entries:
            if k == "@context":
                if found is not _MISSING:
                    raise duplicate_key(k)
                found = v
        return found

    @staticmethod
    def _out_key_sort_key(key):
        return cbor_key_sort_key(key)

    def context_iri_ref(self, entry) -> str:
        if not isinstance(entry, str):
            raise invalid_context_entry()
        return entry

    def context_id(self, _entry, url: str):
        cid = self.tables.context_to_id.get(url)
        return cid if cid is not None else url

    def term_key(self, term: str, plural: bool) -> int:
        tid = self.allocator.encode_term(term, plural)
        if tid is None:
            raise missing_id_for(term)
        return tid

    def key_term(self, key: str, value) -> tuple[str, bool] | None:
        return key, isinstance(value, list)

    def required_key_term(self, key: str, value) -> tuple[str, bool]:
        return key, isinstance(value, list)

    def value_term(self, active: ActiveContext, value) -> str:
        if not isinstance(value, str):
            raise EncodeError("InvalidVocabTermKind", repr(value))
        return value

    def transform_id(self, value):
        if not isinstance(value, str):
            raise EncodeError("InvalidIdKind", repr(value))
        if not codecs.is_absolute_iri(value):
            raise EncodeError("InvalidId", value)
        return codecs.encode_iri(value)

    def transform_vocab(self, active: ActiveContext, value):
        if not isinstance(value, str):
            raise EncodeError("InvalidVocabTermKind", repr(value))
        return self.encode_vocab_term_str(active, value)

    def transform_typed_value(self, active: ActiveContext, value, type_):
        if not isinstance(value, str) or type_ is None:
            return _MISSING
        if self.tables.has_type_table(type_):
            return self.tables.encode_typed(type_, value)
        if type_ in ("@id", "@vocab"):
            return self.encode_vocab_term_str(active, value)
        if type_ == codecs.MULTIBASE_TYPE:
            return codecs.encode_multibase(value)
        if type_ == codecs.XSD_DATE:
            return codecs.encode_xsd_date(value)
        if type_ == codecs.XSD_DATE_TIME:
            return codecs.encode_xsd_date_time(value)
        return _MISSING

    def transform_object(self, active: ActiveContext, value):
        if value is None or isinstance(value, bool):
            return value
        if isinstance(value, int):
            # CBOR major 0/1 holds |n| < 2^64; the reference silently
            # degrades larger ints to lossy f64 (src/encode/mod.rs:241) —
            # a typed error keeps the round-trip invariant honest instead
            if not -(2 ** 64) < value < 2 ** 64:
                raise EncodeError("IntegerOverflow", str(value))
            return value
        if isinstance(value, float):
            # text input can't produce these (parse_json_document rejects
            # NaN/Infinity) but dict input can; emitting them would break
            # the JSON round-trip invariant the decoder enforces
            if value != value or value in (float("inf"), float("-inf")):
                raise EncodeError("NonFiniteFloat", repr(value))
            return value
        if isinstance(value, str):
            return value
        if isinstance(value, list):
            return [self.transform(active, item) for item in value]
        if isinstance(value, dict):
            return CborMap(self.transform_node(active, list(value.items())))
        raise EncodeError("InvalidValue", repr(type(value)))


class CborLdDecoder(_TransformerBase):
    """CBOR-LD -> JSON-LD (reference: src/decode/mod.rs:89-272)."""

    error_cls = DecodeError

    @staticmethod
    def _is_input_array(value) -> bool:
        return isinstance(value, list)

    @staticmethod
    def _as_input_object(value):
        if isinstance(value, CborMap):
            return list(value.entries)
        return None

    @staticmethod
    def _wrap_object(entries: list):
        # dict() would silently collapse duplicate decoded keys (e.g. a
        # crafted map carrying both singular id and plural id+1 of one
        # term) — reject instead of losing data
        out = {}
        for k, v in entries:
            if k in out:
                raise duplicate_key(k)
            out[k] = v
        return out

    @staticmethod
    def _get_context_entry(entries: list):
        # @context is id 0 (singular) or 1 (plural) (reference:
        # src/transform.rs:133-152).
        found = _MISSING
        for k, v in entries:
            if isinstance(k, int) and not isinstance(k, bool) and k in (0, 1):
                if found is not _MISSING:
                    raise duplicate_key(k)
                found = v
        return found

    @staticmethod
    def _out_key_sort_key(key):
        return key  # JSON keys: plain string sort

    def context_iri_ref(self, entry) -> str:
        if isinstance(entry, bool):
            raise DecodeError("InvalidContextTermKind", repr(entry))
        if isinstance(entry, int):
            url = self.tables.id_to_context.get(entry)
            if url is None:
                raise DecodeError("UndefinedCompressedContext", str(entry))
            return url
        if isinstance(entry, str):
            return entry
        raise DecodeError("InvalidContextTermKind", repr(entry))

    def context_id(self, _entry, url: str):
        return url

    def term_key(self, term: str, _plural: bool) -> str:
        return term

    def key_term(self, key, _value) -> tuple[str, bool] | None:
        if isinstance(key, bool) or not isinstance(key, int):
            raise DecodeError("InvalidVocabTermKind", repr(key))
        if key < 0:
            raise DecodeError("UndefinedCompressedTerm", str(key))
        return self.allocator.decode_term(key)

    def required_key_term(self, key, value) -> tuple[str, bool]:
        kt = self.key_term(key, value)
        if kt is None:
            # reference: MissingKeyTerm converts to
            # DecodeError::UndefinedCompressedTerm (src/decode/error.rs:73)
            raise DecodeError("UndefinedCompressedTerm", repr(key))
        return kt

    def value_term(self, active: ActiveContext, value) -> str:
        return self.decode_vocab_term_value(active, value)

    def transform_id(self, value):
        return codecs.decode_iri(value)

    def transform_vocab(self, active: ActiveContext, value):
        return self.decode_vocab_term_value(active, value)

    def transform_typed_value(self, active: ActiveContext, value, type_):
        if isinstance(value, CborMap):
            return _MISSING
        if type_ is None:
            return _MISSING
        if self.tables.has_type_table(type_):
            return self.tables.decode_typed(type_, value)
        if type_ in ("@id", "@vocab"):
            return self.decode_vocab_term_value(active, value)
        if type_ == codecs.MULTIBASE_TYPE:
            return codecs.decode_multibase(value)
        if type_ == codecs.XSD_DATE:
            return codecs.decode_xsd_date(value)
        if type_ == codecs.XSD_DATE_TIME:
            return codecs.decode_xsd_date_time(value)
        return _MISSING

    def transform_object(self, active: ActiveContext, value):
        if value is None or isinstance(value, bool):
            return value
        if isinstance(value, int):
            return value
        if isinstance(value, float):
            if value != value or value in (float("inf"), float("-inf")):
                raise DecodeError("NonFiniteFloat", repr(value))
            return value
        if isinstance(value, str):
            return value
        if isinstance(value, list):
            return [self.transform(active, item) for item in value]
        if isinstance(value, CborMap):
            return self._wrap_object(
                self.transform_node(active, list(value.entries)))
        raise DecodeError("InvalidValue", repr(type(value)))


# --- public per-document API ------------------------------------------------

def _reject_duplicates(pairs):
    seen = set()
    for k, _ in pairs:
        if k in seen:
            raise duplicate_key(k)
        seen.add(k)
    return dict(pairs)


def parse_json_document(text: str | bytes) -> dict:
    """JSON parse with duplicate-key rejection (reference: src/transform.rs:94).

    Tolerates a UTF-8 BOM (ubiquitous in real repositories even though
    RFC 8259 forbids it); rejects the non-JSON literals NaN/Infinity
    (the reference's serde_json rejects them at parse too — accepting
    them would emit non-finite CBOR floats no decoder takes back).
    """
    if isinstance(text, bytes):
        text = text.decode("utf-8-sig")
    else:
        text = text.lstrip("﻿")
    return json.loads(text, object_pairs_hook=_reject_duplicates,
                      parse_constant=_reject_constant)


def _reject_constant(name: str):
    raise CborLdError("InvalidValue", f"non-JSON literal {name}")


def _json_to_plain_cbor(value):
    """Uncompressed CBOR-LD payload: JSON tree -> CBOR verbatim (text keys)."""
    if isinstance(value, float) and (value != value or value in
                                     (float("inf"), float("-inf"))):
        raise EncodeError("NonFiniteFloat", repr(value))
    if isinstance(value, dict):
        return CborMap([(k, _json_to_plain_cbor(v)) for k, v in value.items()])
    if isinstance(value, list):
        return [_json_to_plain_cbor(v) for v in value]
    return value


def _plain_cbor_to_json(value):
    if isinstance(value, float) and (value != value or value in
                                     (float("inf"), float("-inf"))):
        raise DecodeError("NonFiniteFloat", repr(value))
    if isinstance(value, CborMap):
        out = {}
        for k, v in value.entries:
            if not isinstance(k, str):
                raise DecodeError("InvalidValue", "uncompressed map key must be text")
            out[k] = _plain_cbor_to_json(v)
        return out
    if isinstance(value, list):
        return [_plain_cbor_to_json(v) for v in value]
    if isinstance(value, bytes):
        raise DecodeError("InvalidValue", "bytes not representable in JSON")
    return value


def encode_document(doc: dict | str | bytes, registry_id: int = 1,
                    loader: StaticLoader | None = None) -> bytes:
    """JSON-LD document -> CBOR-LD bytes with the 0x06xx envelope tag.

    ``registry_id=0`` is the uncompressed mode: the document is CBOR
    encoded verbatim under tag 0x0600 (the reference leaves this
    ``todo!()`` at src/encode/mod.rs:44-46; the CBOR-LD spec defines it,
    so we support it).
    """
    if not isinstance(doc, dict):
        if not isinstance(doc, (str, bytes)):
            raise expected_object()
        doc = parse_json_document(doc)
        if not isinstance(doc, dict):
            raise expected_object()
    if registry_id == 0:
        return dumps(CborTag(CBOR_LD_TAG_HIGH << 8, _json_to_plain_cbor(doc)))
    loader = loader or StaticLoader.default()
    enc = CborLdEncoder(loader, tables_for_registry(registry_id))
    inner = enc.transform(EMPTY_CONTEXT, doc)
    tag, varint_rest = registry_tag(registry_id)
    if varint_rest:
        # id >= 128: remaining varint bytes prepend as [bstr, payload]
        return dumps(CborTag(tag, [varint_rest, inner]))
    return dumps(CborTag(tag, inner))


def decode_document(data: bytes, loader: StaticLoader | None = None) -> dict:
    """CBOR-LD bytes -> JSON-LD document (dict)."""
    try:
        value = loads(data)
    except ValueError as e:
        # reference: DecodeError::Cbor(ciborium::de::Error) — truncated or
        # malformed CBOR gets a typed kind instead of a raw ValueError
        raise DecodeError("Cbor", str(e)) from None
    if not isinstance(value, CborTag):
        raise not_cbor_ld()
    if value.tag >> 8 != CBOR_LD_TAG_HIGH:
        raise not_cbor_ld()
    first = value.tag & 0xFF
    if first & 0x80:
        # varint registry id (>= 128): payload is [bstr(rest), payload]
        from .tables import varint_decode

        if (not isinstance(value.value, list) or len(value.value) != 2
                or not isinstance(value.value[0], bytes)):
            raise DecodeError("NotCborLd",
                              "varint-registry payload must be [bstr, value]")
        try:
            registry_id = varint_decode(bytes([first]) + value.value[0])
        except EncodeError as e:
            raise DecodeError(e.kind, e.message) from None
        value = CborTag(value.tag, value.value[1])
    else:
        registry_id = first
    if registry_id == 0:
        out = _plain_cbor_to_json(value.value)
        if not isinstance(out, dict):
            raise expected_object()
        return out
    loader = loader or StaticLoader.default()
    try:
        tables = tables_for_registry(registry_id)
    except EncodeError as e:
        raise DecodeError(e.kind, e.message) from None
    dec = CborLdDecoder(loader, tables)
    return dec.transform(EMPTY_CONTEXT, value.value)
