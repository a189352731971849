"""Decode-side hostility: malformed CBOR-LD payloads hit the typed error
taxonomy (reference: src/decode/error.rs:7-59), never crash untyped.
"""

import pytest

from cbor_ld_spark.kernel import CborLdError, DecodeError, decode_document
from cbor_ld_spark.kernel.cbor import CborMap, CborTag, dumps

AS = "https://www.w3.org/ns/activitystreams"


def _doc(entries):
    return dumps(CborTag(0x0601, CborMap(entries)))


def _kind(data) -> str:
    with pytest.raises((CborLdError, ValueError)) as e:
        decode_document(data)
    return getattr(e.value, "kind", type(e.value).__name__)


def test_undefined_term_id():
    # context allocates ~200 terms; id 60000 was never allocated
    assert _kind(_doc([(0, AS), (60000, "x")])) == "UndefinedCompressedTerm"


def test_text_key_rejected():
    assert _kind(_doc([(0, AS), ("summary", "x")])) == "InvalidVocabTermKind"


def test_unknown_compressed_context():
    # default registry has an empty context table -> integer context ids
    # are undefined
    assert _kind(_doc([(0, 32768), (2, 1)])) == "UndefinedCompressedContext"


def test_negative_term_id():
    assert _kind(_doc([(0, AS), (-4, "x")])) == "UndefinedCompressedTerm"


def test_undefined_vocab_value():
    # @type value id never allocated
    ts = 380  # 'type' term under activitystreams
    assert _kind(_doc([(0, AS), (ts, 60000)])) == "UndefinedCompressedTerm"


def test_bad_iri_codec_id():
    # id-coerced value: [codec 999, ...] is unknown
    doc = _doc([(0, "https://www.w3.org/2018/credentials/v1"),
                (2, 1), ])
    # build a credential with issuer = [999, "x"]
    from cbor_ld_spark.kernel import encode_document, parse_json_document
    from cbor_ld_spark.kernel.cbor import loads

    good = encode_document({
        "@context": "https://www.w3.org/2018/credentials/v1",
        "type": "VerifiableCredential",
        "issuer": "https://i.example/x",
        "credentialSubject": {"id": "https://s.example/y"},
    })
    tree = loads(good)
    # replace the issuer payload with an unknown codec id
    for i, (k, v) in enumerate(tree.value.entries):
        if isinstance(v, list) and v and v[0] == 2:  # https codec
            tree.value.entries[i] = (k, [999, "x"])
            break
    assert _kind(dumps(tree)) == "Codec"


def test_float_keys_rejected():
    assert _kind(_doc([(0, AS), (1.5, "x")])) == "InvalidVocabTermKind"


def test_duplicate_context_keys():
    assert _kind(_doc([(0, AS), (1, [AS])])) == "DuplicateEntry"


def test_non_finite_float_value():
    # a plain float value inside a node: NaN/inf rejected like the
    # reference's NonFiniteFloat (src/decode/mod.rs:253-255)
    ts = 380
    data = dumps(CborTag(0x0601, CborMap(
        [(0, AS), (244, float("inf"))])))  # 'content' term id under AS
    assert _kind(data) == "NonFiniteFloat"
