"""Graph analytics: PageRank + k-hop on hand-checkable graphs."""

from pyspark.sql import functions as F


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_pagerank_star(spark):
    """Star a->c, b->c, c->a: c has two inbound, a one, b none.
    Hand-checked 1-iteration values from rank_0 = 1/3:
    a = 0.05 + 0.85*(1/3); b = 0.05; c = 0.05 + 0.85*(2/3)."""
    from cbor_ld_spark.operators.graph import pagerank

    e = _edges(spark, [("a", "c"), ("b", "c"), ("c", "a")])
    r1 = {r["node"]: r["rank"]
          for r in pagerank(e, iters=1, round_to=6).collect()}
    assert r1 == {"a": round(0.05 + 0.85 / 3, 6),
                  "b": 0.05,
                  "c": round(0.05 + 0.85 * 2 / 3, 6)}
    # more iterations keep the ordering and stay a distribution-ish set
    r5 = {r["node"]: r["rank"] for r in pagerank(e, iters=5).collect()}
    assert r5["c"] > r5["a"] > r5["b"]


def test_pagerank_cycle_uniform(spark):
    """A pure cycle is stationary at 1/N for every damping/iters."""
    from cbor_ld_spark.operators.graph import pagerank

    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    ranks = {r["rank"] for r in pagerank(e, iters=7).collect()}
    assert ranks == {round(1 / 3, 6)}


def test_k_hop_layers_and_multi_seed(spark):
    """Chain a->b->c->d plus shortcut a->c: BFS first_hop layering must
    record c at hop 1 (not 2); multiple seeds batch in one dataflow."""
    from cbor_ld_spark.operators.graph import k_hop

    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")])
    seeds = spark.createDataFrame([("a",), ("b",)], "node string")
    got = {(r["root"], r["node"]): r["first_hop"]
           for r in k_hop(e, seeds, k=3).collect()}
    assert got == {
        ("a", "b"): 1, ("a", "c"): 1, ("a", "d"): 2,
        ("b", "c"): 1, ("b", "d"): 2,
    }


def test_k_hop_bounded_by_k(spark):
    from cbor_ld_spark.operators.graph import k_hop

    chain = _edges(spark, [(f"n{i}", f"n{i+1}") for i in range(6)])
    seeds = spark.createDataFrame([("n0",)], "node string")
    got = k_hop(chain, seeds, k=2).collect()
    assert {r["node"] for r in got} == {"n1", "n2"}
    assert max(r["first_hop"] for r in got) == 2


def test_entity_edges_iri_only(spark):
    from cbor_ld_spark.operators.graph import entity_edges

    t = spark.createDataFrame(
        [("s1", "p", "o1", True), ("s1", "p", "lit", False),
         ("s1", "p", "o1", True)],
        "subj string, pred string, obj string, obj_is_iri boolean")
    rows = entity_edges(t).collect()
    assert [(r["src"], r["dst"]) for r in rows] == [("s1", "o1")]


def test_pagerank_dangling_redistribution_sums_to_one(spark):
    """redistribute_dangling=True conserves rank mass: sums stay ~1.0
    every iteration even with out-degree-0 nodes (b, d are dangling);
    the default variant leaks that mass (sum < 1)."""
    from cbor_ld_spark.operators.graph import pagerank

    e = _edges(spark, [("a", "b"), ("a", "d"), ("c", "b"), ("c", "a")])
    for iters in (1, 3, 5):
        redis = pagerank(e, iters=iters, redistribute_dangling=True)
        total = sum(r["rank"] for r in redis.collect())
        assert abs(total - 1.0) < 1e-4, (iters, total)
    dropped = sum(r["rank"] for r in pagerank(e, iters=3).collect())
    assert dropped < 1.0 - 1e-3


def test_pagerank_dangling_matches_reference_replay(spark):
    """Hand-replay of 2 redistributed iterations on the star graph
    (b dangling): every value matches the Spark dataflow to round-6."""
    from cbor_ld_spark.operators.graph import pagerank

    edges = [("a", "c"), ("b", "c"), ("c", "a")]  # b -> c makes b non-dangling
    # replay in pure python
    nodes = sorted({x for p in edges for x in p})
    out_deg = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    n = len(nodes)
    ranks = {v: 1.0 / n for v in nodes}
    d = 0.85
    for _ in range(2):
        dm = sum(r for v, r in ranks.items() if v not in out_deg)
        base = (1 - d) / n + d * dm / n
        inbound = {v: 0.0 for v in nodes}
        for s, t in edges:
            inbound[t] += ranks[s] / out_deg[s]
        ranks = {v: base + d * inbound[v] for v in nodes}
    got = {r["node"]: r["rank"]
           for r in pagerank(_edges(spark, edges), iters=2,
                             redistribute_dangling=True).collect()}
    assert got == {v: round(r, 6) for v, r in ranks.items()}


def test_k_hop_plan_single_anti_join_per_hop(spark):
    """The visited-set rework keeps the join count linear in k: one
    left_anti per hop in the final plan, not one per (hop, layer)."""
    from cbor_ld_spark.operators.graph import k_hop

    chain = _edges(spark, [(f"n{i}", f"n{i+1}") for i in range(12)])
    seeds = spark.createDataFrame([("n0",)], "node string")
    k = 6
    out = k_hop(chain, seeds, k=k)
    got = {r["node"]: r["first_hop"] for r in out.collect()}
    assert got == {f"n{i}": i for i in range(1, k + 1)}
    # the returned frame is a filter over the checkpointed visited set —
    # all per-hop work already ran, one materializing job per hop
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan, plan
    assert "LeftAnti" not in plan, plan
