"""Expansion edge cases: @list containers, language maps, value objects.

Exercised against the vendored activitystreams context (the only one
defining @container: @list / @language terms).
"""

import pytest

from cbor_ld_spark.kernel import CborLdError, encode_document
from cbor_ld_spark.kernel.expand import (
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_BOOLEAN,
    XSD_INTEGER,
    expand_to_triples,
)

AS = "https://www.w3.org/ns/activitystreams"


def test_list_container_builds_rdf_list():
    doc = {
        "@context": AS,
        "type": "OrderedCollection",
        "orderedItems": ["https://a.example/1", "https://a.example/2"],
    }
    ts = expand_to_triples(doc)
    firsts = [t for t in ts if t.pred == RDF_FIRST]
    rests = [t for t in ts if t.pred == RDF_REST]
    assert [t.obj for t in firsts] == ["https://a.example/1",
                                       "https://a.example/2"]
    assert rests[0].obj.startswith("_:")
    assert rests[-1].obj == RDF_NIL


def test_empty_list_is_nil():
    doc = {"@context": AS, "type": "OrderedCollection", "orderedItems": []}
    ts = expand_to_triples(doc)
    nil_edges = [t for t in ts if t.obj == RDF_NIL and t.pred != RDF_REST]
    assert len(nil_edges) == 1


def test_language_map_emits_tagged_literals():
    doc = {
        "@context": AS,
        "type": "Note",
        "contentMap": {"en": "hello", "fr": "bonjour"},
    }
    ts = expand_to_triples(doc)
    tagged = {(t.obj, t.obj_lang) for t in ts if t.obj_lang}
    assert tagged == {("hello", "en"), ("bonjour", "fr")}


def test_language_map_uncompressible_like_reference():
    # transform_node requires term definitions for every key; language
    # tags are not terms, so CBOR-LD encoding fails (same as the
    # reference's UndefinedTerm path, src/transform.rs:450).
    doc = {
        "@context": AS,
        "type": "Note",
        "contentMap": {"en": "hello"},
    }
    with pytest.raises(CborLdError):
        encode_document(doc)


def test_value_object_with_type_and_language():
    doc = {
        "@context": AS,
        "type": "Note",
        "summary": {"@value": "les notes", "@language": "fr"},
        "totalItems": 4,
    }
    ts = expand_to_triples(doc)
    by_pred = {t.pred.split("#")[-1]: t for t in ts if t.pred != RDF_TYPE}
    assert by_pred["summary"].obj_lang == "fr"
    assert by_pred["totalItems"].obj == "4"
    assert by_pred["totalItems"].obj_datatype == XSD_INTEGER


def test_scalar_typed_literals():
    doc = {
        "@context": "https://www.w3.org/2018/credentials/v1",
        "type": "VerifiableCredential",
        "issuer": "https://i.example/x",
        "issuanceDate": "2020-01-01T00:00:00Z",
        "credentialSubject": {"id": "https://s.example/y"},
    }
    ts = expand_to_triples(doc)
    dt = {t.pred.split("#")[-1]: t.obj_datatype for t in ts
          if not t.obj_is_iri}
    assert dt["issuanceDate"].endswith("dateTime")
    assert XSD_BOOLEAN  # imported symbols used


def test_reverse_property():
    doc = {
        "@context": {
            "knownBy": {"@reverse": "https://x.example/knows"},
            "id": "@id",
        },
        "id": "https://p.example/alice",
        "knownBy": {"id": "https://p.example/bob"},
    }
    ts = expand_to_triples(doc)
    rev = [t for t in ts if t.pred == "https://x.example/knows"]
    assert len(rev) == 1
    assert rev[0].subj == "https://p.example/bob"
    assert rev[0].obj == "https://p.example/alice"


def test_json_typed_literal():
    from cbor_ld_spark.kernel.expand import RDF_JSON

    doc = {
        "@context": {
            "blob": {"@id": "https://x.example/blob", "@type": "@json"},
            "id": "@id",
        },
        "id": "https://p.example/x",
        "blob": {"b": 1, "a": [True, None]},
    }
    ts = expand_to_triples(doc)
    lit = [t for t in ts if t.obj_datatype == RDF_JSON]
    assert len(lit) == 1
    assert lit[0].obj == '{"a":[true,null],"b":1}'  # canonical JSON


def test_canonical_double_textual_form():
    """ADVICE r1: log10-based exponent was off by one near powers of 10
    and %.15g collapsed 16-17-digit mantissas; the repr-derived form
    must round-trip every double exactly."""
    from cbor_ld_spark.kernel.expand import _canonical_double as c

    assert c(1e23) == "1.0E23"          # the off-by-one case
    assert c(21.0) == "2.1E1"
    assert c(0.00123) == "1.23E-3"
    assert c(123456789012345680.0) == "1.2345678901234568E17"
    assert c(0.0) == "0.0E0" and c(-0.0) == "-0.0E0"
    assert c(float("inf")) == "INF" and c(float("-inf")) == "-INF"
    assert c(float("nan")) == "NaN"

    import random

    rng = random.Random(7)
    for _ in range(5000):
        v = rng.uniform(-1, 1) * 10 ** rng.randint(-300, 300)
        s = c(v)
        mant, _, exp = s.partition("E")
        assert float(mant + "e" + exp) == v, (v, s)
        assert "." in mant


_CTX11 = {"https://ctx.example/v11": {"@context": {
    "@version": 1.1,
    "name": "https://ex.org/name",
    "tags": {"@id": "https://ex.org/tags", "@container": "@index"},
    "friends": {"@id": "https://ex.org/friends", "@container": "@id"},
    "byType": {"@id": "https://ex.org/byType", "@container": "@type"},
}}}


def _expand11(doc):
    from cbor_ld_spark.kernel.expand import expand_to_triples
    from cbor_ld_spark.kernel.loader import StaticLoader

    return expand_to_triples(doc, StaticLoader(_CTX11))


def test_included_nodes_expand_as_siblings():
    ts = _expand11({"@context": "https://ctx.example/v11",
                    "@id": "https://a.example/1", "name": "root",
                    "@included": [{"@id": "https://a.example/2",
                                   "name": "inc"}]})
    trip = {(t.subj, t.pred, t.obj) for t in ts}
    assert ("https://a.example/2", "https://ex.org/name", "inc") in trip
    assert ("https://a.example/1", "https://ex.org/name", "root") in trip


def test_index_map_drops_keys():
    ts = _expand11({"@context": "https://ctx.example/v11",
                    "@id": "https://a.example/1",
                    "tags": {"i2": "beta", "i1": "alpha"}})
    assert sorted(t.obj for t in ts
                  if t.pred == "https://ex.org/tags") == ["alpha", "beta"]


def test_id_map_keys_become_node_ids():
    ts = _expand11({"@context": "https://ctx.example/v11",
                    "@id": "https://a.example/1",
                    "friends": {"https://a.example/2": {"name": "f2"}}})
    trip = {(t.subj, t.pred, t.obj) for t in ts}
    assert ("https://a.example/1", "https://ex.org/friends",
            "https://a.example/2") in trip
    assert ("https://a.example/2", "https://ex.org/name", "f2") in trip


def test_type_map_keys_become_types():
    from cbor_ld_spark.kernel.expand import RDF_TYPE

    ts = _expand11({"@context": "https://ctx.example/v11",
                    "@id": "https://a.example/1",
                    "byType": {"https://ex.org/T":
                               {"@id": "https://a.example/3"}}})
    trip = {(t.subj, t.pred, t.obj) for t in ts}
    assert ("https://a.example/3", RDF_TYPE, "https://ex.org/T") in trip


def test_none_key_in_id_map_yields_blank_node():
    ts = _expand11({"@context": "https://ctx.example/v11",
                    "@id": "https://a.example/1",
                    "friends": {"@none": {"name": "anon"}}})
    assert any(t.pred == "https://ex.org/friends"
               and t.obj.startswith("_:") for t in ts)


def test_id_map_non_node_value_raises():
    """Advice r2: non-dict @id-map values must quarantine loudly, not be
    silently dropped."""
    from cbor_ld_spark.kernel.errors import CborLdError

    with pytest.raises(CborLdError, match="InvalidIdMapValue"):
        _expand11({"@context": "https://ctx.example/v11",
                   "@id": "https://a.example/1",
                   "friends": {"https://a.example/2": "just-a-string"}})


def test_type_map_non_node_value_raises():
    from cbor_ld_spark.kernel.errors import CborLdError

    with pytest.raises(CborLdError, match="InvalidTypeMapValue"):
        _expand11({"@context": "https://ctx.example/v11",
                   "@id": "https://a.example/1",
                   "byType": {"https://ex.org/T": 42}})
