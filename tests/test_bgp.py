"""BGP matcher: hand-checkable conjunctive pattern semantics."""

import pytest


def _triples(spark, rows):
    return spark.createDataFrame(
        [r + ("g",) for r in rows],
        "subj string, pred string, obj string, graph string")


_DATA = [
    ("c1", "issuer", "org1"), ("c1", "subject", "p1"),
    ("c2", "issuer", "org2"), ("c2", "subject", "p2"),
    ("c3", "issuer", "org1"),  # no subject
    ("p1", "age", "21"), ("p2", "age", "65"),
    ("x", "loves", "x"), ("y", "loves", "z"),
]


def test_bgp_chain_join(spark):
    from cbor_ld_spark.operators.bgp import match_bgp

    out = match_bgp(_triples(spark, _DATA), [
        ("?c", "issuer", "?o"),
        ("?c", "subject", "?p"),
        ("?p", "age", "?a"),
    ])
    assert out.columns == ["c", "o", "p", "a"]
    got = {tuple(r) for r in out.collect()}
    assert got == {("c1", "org1", "p1", "21"), ("c2", "org2", "p2", "65")}


def test_bgp_repeated_var_in_one_pattern(spark):
    from cbor_ld_spark.operators.bgp import match_bgp

    out = match_bgp(_triples(spark, _DATA), [("?v", "loves", "?v")])
    assert [r["v"] for r in out.collect()] == ["x"]


def test_bgp_ground_pattern_exists_guard(spark):
    from cbor_ld_spark.operators.bgp import match_bgp

    t = _triples(spark, _DATA)
    present = match_bgp(t, [("?p", "age", "?a"),
                            ("c1", "issuer", "org1")])
    assert present.count() == 2  # guard passes, bindings unaffected
    absent = match_bgp(t, [("?p", "age", "?a"),
                           ("c1", "issuer", "org999")])
    assert absent.count() == 0


def test_bgp_distinct_collapses_duplicate_assertions(spark):
    from cbor_ld_spark.operators.bgp import match_bgp

    t = _triples(spark, _DATA + [("c1", "issuer", "org1")] * 3)
    out = match_bgp(t, [("?c", "issuer", "org1")])
    assert sorted(r["c"] for r in out.collect()) == ["c1", "c3"]


def test_bgp_rejects_degenerate_inputs(spark):
    from cbor_ld_spark.operators.bgp import match_bgp

    t = _triples(spark, _DATA)
    with pytest.raises(ValueError):
        match_bgp(t, [])
    with pytest.raises(ValueError):
        match_bgp(t, [("c1", "issuer", "org1")])  # no variables
    with pytest.raises(ValueError):
        match_bgp(t, [("?", "issuer", "?x")])  # bare '?'
