"""CONSTRUCT + forward chaining: hand-checkable fixpoints."""

import pytest


def _t(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_construct_template_instantiation(spark):
    from cbor_ld_spark.operators.rules import construct

    t = _t(spark, [("c1", "issuer", "i1"), ("c1", "subject", "p1"),
                   ("c2", "issuer", "i2")])
    out = construct(t, [("?c", "issuer", "?i"), ("?c", "subject", "?p")],
                    [("?i", "vouches", "?p")])
    assert [tuple(r) for r in out.collect()] == [("i1", "vouches", "p1")]
    with pytest.raises(ValueError, match="not bound"):
        construct(t, [("?c", "issuer", "?i")], [("?i", "x", "?zzz")])


def test_construct_optional_null_rows_dropped(spark):
    from cbor_ld_spark.operators.rules import construct

    t = _t(spark, [("c1", "subject", "p1"), ("c2", "subject", "p2"),
                   ("p1", "age", "21")])
    out = construct(t, [("?c", "subject", "?p")],
                    [("?p", "hasAge", "?a")],
                    optional=[("?p", "age", "?a")])
    # p2 has no age -> NULL ?a -> CONSTRUCT drops the row
    assert [tuple(r) for r in out.collect()] == [("p1", "hasAge", "21")]


def test_forward_chain_two_round_fixpoint(spark):
    """R2 consumes R1's derived edge: transitive 'ancestor' over a
    3-chain needs two rounds; fixpoint = 3 derived triples."""
    from cbor_ld_spark.operators.rules import forward_chain

    t = _t(spark, [("a", "parent", "b"), ("b", "parent", "c")])
    rules = [
        ([("?x", "parent", "?y")], [("?x", "anc", "?y")]),
        ([("?x", "anc", "?y"), ("?y", "anc", "?z")], [("?x", "anc", "?z")]),
    ]
    got = {tuple(r) for r in forward_chain(t, rules).collect()}
    assert got == {("a", "anc", "b"), ("b", "anc", "c"), ("a", "anc", "c")}


def test_forward_chain_no_derivations_empty(spark):
    from cbor_ld_spark.operators.rules import forward_chain

    t = _t(spark, [("a", "p", "b")])
    out = forward_chain(t, [([("?x", "q", "?y")], [("?x", "r", "?y")])])
    assert out.count() == 0


def test_forward_chain_max_rounds_loud(spark):
    """A 12-chain's transitive closure needs ~4 doubling rounds — but a
    cap of 1 must raise, never silently truncate."""
    from cbor_ld_spark.operators.rules import forward_chain

    t = _t(spark, [(f"n{i}", "p", f"n{i+1}") for i in range(4)])
    rules = [
        ([("?x", "p", "?y")], [("?x", "tc", "?y")]),
        ([("?x", "tc", "?y"), ("?y", "tc", "?z")], [("?x", "tc", "?z")]),
    ]
    with pytest.raises(RuntimeError, match="fixpoint"):
        forward_chain(t, rules, max_rounds=1)
    # with room it closes: C(5,2) = 10 tc pairs
    got = forward_chain(t, rules, max_rounds=6)
    assert got.count() == 10


def test_forward_chain_semi_naive_equivalent(spark):
    """Semi-naive delta evaluation derives the identical fixpoint on
    the hand-checked two-round rule set."""
    from cbor_ld_spark.operators.rules import forward_chain

    t = _t(spark, [("a", "parent", "b"), ("b", "parent", "c")])
    rules = [
        ([("?x", "parent", "?y")], [("?x", "anc", "?y")]),
        ([("?x", "anc", "?y"), ("?y", "anc", "?z")], [("?x", "anc", "?z")]),
    ]
    naive = {tuple(r) for r in forward_chain(t, rules).collect()}
    semi = {tuple(r) for r in
            forward_chain(t, rules, semi_naive=True).collect()}
    assert semi == naive == {("a", "anc", "b"), ("b", "anc", "c"),
                             ("a", "anc", "c")}


def test_forward_chain_semi_naive_deep_chain(spark):
    """A 13-node linear chain closes to C(13,2)=78 'tc' pairs; both
    tiers reach the identical fixpoint (doubling depth ~4 rounds)."""
    from cbor_ld_spark.operators.rules import forward_chain

    t = _t(spark, [(f"n{i:02d}", "p", f"n{i+1:02d}") for i in range(12)])
    rules = [
        ([("?x", "p", "?y")], [("?x", "tc", "?y")]),
        ([("?x", "tc", "?y"), ("?y", "tc", "?z")], [("?x", "tc", "?z")]),
    ]
    naive = {tuple(r) for r in forward_chain(t, rules).collect()}
    semi = {tuple(r) for r in
            forward_chain(t, rules, semi_naive=True).collect()}
    assert semi == naive
    assert sum(1 for s, p, o in semi if p == "tc") == 78


def test_forward_chain_semi_naive_random_equivalence(spark):
    """Seeded-random edge sets x transitive+projection rules: the two
    tiers must agree exactly (the classic datalog delta-correctness
    property)."""
    import random

    from cbor_ld_spark.operators.rules import forward_chain

    rng = random.Random(20260817)
    for case in range(4):
        nodes = [f"v{i}" for i in range(8)]
        edges = sorted({(rng.choice(nodes), "e", rng.choice(nodes))
                        for _ in range(10)})
        t = _t(spark, edges)
        rules = [
            ([("?x", "e", "?y")], [("?x", "r", "?y")]),
            ([("?x", "r", "?y"), ("?y", "r", "?z")], [("?x", "r", "?z")]),
            ([("?x", "r", "?y")], [("?y", "seen", "true")]),
        ]
        naive = {tuple(r) for r in
                 forward_chain(t, rules, max_rounds=12).collect()}
        semi = {tuple(r) for r in
                forward_chain(t, rules, max_rounds=12,
                              semi_naive=True).collect()}
        assert semi == naive, (case, edges)
