"""Registry-mode coverage: VcBarcodes (id 100) and uncompressed (id 0).

The reference checkout lacks the vcb-* golden fixtures (its suite.rs
references them but tests/samples does not ship them), so VcBarcodes is
pinned by structural assertions: the registry tag, the compressed
context-table ids (32768-32770, reference src/tables/registry.rs:60-66),
the cryptosuiteString value dictionary (ecdsa-xi-2023 -> 4,
src/tables/registry.rs:67-79), and exact round-trip.

Uncompressed mode (id 0) is todo!() in the reference
(src/encode/mod.rs:44-46); we implement the spec behavior.
"""

import json
import os

import pytest

from cbor_ld_spark.kernel import (
    canonical_json,
    decode_document,
    encode_document,
)
from cbor_ld_spark.kernel.cbor import CborMap, CborTag, loads

SAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "cbor_ld_spark", "fixtures", "samples",
)


def _vcb_doc():
    with open(os.path.join(SAMPLES, "vcb.jsonld"), encoding="utf-8") as f:
        return json.load(f)


def test_vcb_registry_tag_and_roundtrip():
    doc = _vcb_doc()
    data = encode_document(doc, registry_id=100)
    tree = loads(data)
    assert isinstance(tree, CborTag) and tree.tag == 0x0664  # 0x06<<8 | 100
    back = decode_document(data)
    assert canonical_json(back) == canonical_json(doc)


def test_vcb_context_table_ids_used():
    data = encode_document(_vcb_doc(), registry_id=100)
    tree = loads(data)
    ctx_entry = dict(tree.value.entries)[1]  # @context plural key = 1
    assert ctx_entry == [32768, 32769, 32770]


def test_vcb_cryptosuite_dictionary_used():
    """ecdsa-xi-2023 encodes to the table id 4, not text."""
    data = encode_document(_vcb_doc(), registry_id=100)
    assert b"ecdsa-xi-2023" not in data
    # default registry has no cryptosuite table -> stays text
    data1 = encode_document(_vcb_doc(), registry_id=1)
    assert b"ecdsa-xi-2023" in data1


def test_vcb_smaller_than_default_registry():
    doc = _vcb_doc()
    assert len(encode_document(doc, registry_id=100)) < \
        len(encode_document(doc, registry_id=1))


def test_vcb_utopia_did_terms_compressed():
    """utopia/v2 pins the did:key IRIs as terms -> integer ids."""
    data = encode_document(_vcb_doc(), registry_id=100)
    assert b"zDnaeZSD9XcuULaS8qmgDUa6TMg2QjF9xABnZK42awDH3BEzj" not in data


def test_uncompressed_mode_roundtrip():
    doc = _vcb_doc()
    data = encode_document(doc, registry_id=0)
    tree = loads(data)
    assert isinstance(tree, CborTag) and tree.tag == 0x0600
    assert isinstance(tree.value, CborMap)
    back = decode_document(data)
    assert canonical_json(back) == canonical_json(doc)


def test_uncompressed_larger_than_compressed():
    doc = _vcb_doc()
    assert len(encode_document(doc, registry_id=0)) > \
        len(encode_document(doc, registry_id=100))


def test_unknown_registry_rejected():
    with pytest.raises(Exception):
        encode_document(_vcb_doc(), registry_id=7)
