"""Property-based round-trip: random JSON-LD docs over vendored contexts.

Generates documents whose terms are drawn from the actual term
definitions of the vendored context chain, with values shaped to the
term's coercion (plain strings, ints, valid xsd:dateTime, multibase,
nested credential-subject objects) — every generated doc must encode,
decode back canonically equal, and expand deterministically.
"""

import json

from hypothesis import given, settings, strategies as st

from cbor_ld_spark.kernel import (
    canonical_json,
    content_sha256,
    decode_document,
    encode_document,
)
from cbor_ld_spark.kernel.cbor import loads
from cbor_ld_spark.kernel.expand import expand_to_triples

CTX = "https://www.w3.org/2018/credentials/v1"

# term -> value strategy (terms from credentials/v1 VerifiableCredential
# scoped context; all active once the type is present)
_dt = st.builds(
    lambda y, mo, d, h, mi, s: f"{y:04d}-{mo:02d}-{d:02d}T{h:02d}:{mi:02d}:{s:02d}Z",
    st.integers(1970, 2100), st.integers(1, 12), st.integers(1, 28),
    st.integers(0, 23), st.integers(0, 59), st.integers(0, 59),
)
_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=30)
_iri = st.builds(lambda n: f"https://example.org/e/{n}", st.integers(0, 10**9))
_urn = st.builds(
    lambda n: f"urn:uuid:{n:032x}"[:9] + f"{n:032x}"[0:8] + "-" +
    f"{n:032x}"[8:12] + "-" + f"{n:032x}"[12:16] + "-" +
    f"{n:032x}"[16:20] + "-" + f"{n:032x}"[20:32],
    st.integers(0, 2**128 - 1))


@st.composite
def credential_doc(draw):
    subject = {"id": draw(_iri)}
    doc = {
        "@context": CTX,
        "type": "VerifiableCredential",
        "issuer": draw(_iri),
        "issuanceDate": draw(_dt),
        "credentialSubject": subject,
    }
    if draw(st.booleans()):
        doc["expirationDate"] = draw(_dt)
    if draw(st.booleans()):
        doc["id"] = draw(_urn)
    if draw(st.booleans()):
        doc["holder"] = draw(_iri)
    return doc


@settings(max_examples=60, deadline=None)
@given(credential_doc())
def test_roundtrip_invariant(doc):
    data = encode_document(doc)
    back = decode_document(data)
    assert content_sha256(back) == content_sha256(doc)


@settings(max_examples=30, deadline=None)
@given(credential_doc())
def test_encode_deterministic_and_compact(doc):
    a = encode_document(doc)
    b = encode_document(json.loads(canonical_json(doc)))  # key order shuffled
    assert a == b
    tree = loads(a)
    assert tree.tag == 0x0601


@settings(max_examples=30, deadline=None)
@given(credential_doc())
def test_expansion_deterministic(doc):
    t1 = sorted(t.key() for t in expand_to_triples(doc))
    t2 = sorted(t.key() for t in
                expand_to_triples(decode_document(encode_document(doc))))
    assert t1 == t2
    assert len(t1) >= 3
