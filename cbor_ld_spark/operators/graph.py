"""Graph analytics over the extracted entity graph (KG tier).

The pipeline's end product is a node/edge graph (triples with IRI
objects are the entity->entity edges); these operators answer the
questions a KG consumer asks first: who is central (PageRank, degree)
and what is reachable (k-hop neighborhoods).  Both are deterministic
fixed-iteration dataflows so the DuckDB oracle can replay them exactly
(unrolled CTEs), same bar as every other operator here.

Scale shapes:

* ``pagerank`` — the classic iterative join: contributions =
  edges join ranks on src (shuffle on src, uniform after dedup),
  summed per dst with map-side partial aggregation.  The edge frame is
  localCheckpoint'd once and reused every iteration (lineage cut —
  round-1 lesson: each unpersisted reuse would replay the kernel), and
  ranks persist per iteration with the previous handle released.
  Fixed ``iters`` (no convergence check) keeps the job count bounded
  and the result a pure function of the input.
* ``k_hop`` — frontier expansion: k semi-join rounds, each a join on
  the uniform edge key; the frontier stays (node, root) pairs so
  multiple seeds batch in ONE dataflow instead of one traversal per
  seed (the 100 TB shape: seeds come in thousands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def entity_edges(triples: DataFrame) -> DataFrame:
    """Distinct subject->object edges between IRIs (the entity graph)."""
    return (triples
            .filter(F.col("obj_is_iri"))
            .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
            .distinct())


def out_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))


def pagerank(edges: DataFrame, iters: int = 5,
             damping: float = 0.85, round_to: int = 6,
             redistribute_dangling: bool = False) -> DataFrame:
    """Fixed-iteration PageRank over the distinct edge list.

    rank_0 = 1/N for the N distinct nodes (sources + destinations);
    rank_{t+1}(v) = (1-d)/N + d * sum(rank_t(u)/out_deg(u), u->v).
    By default dangling-node mass is dropped (not redistributed) —
    deterministic and mirrored verbatim by the oracle's replay; ranks
    are a relative centrality ordering, not a probability distribution.
    With ``redistribute_dangling=True`` each iteration adds the summed
    rank of out-degree-0 nodes back uniformly (d * dangling/N per node)
    — one extra 1-row aggregation per iteration — and rank sums stay
    ~1.0, the variant a consumer comparing ranks ACROSS graphs wants.

    Float note: the inbound sum's addition order is partition-dependent
    (FP non-associative), while the oracle sums sequentially.  The
    divergence is ~1e-16 relative per iteration against a round-6
    output granularity of 1e-6 — a boundary flip needs a rank within
    ~1e-18 of a 0.5e-6 rounding edge (odds ~1e-12 per value), the
    accepted residual for an order-free distributed aggregation.
    """
    edges = edges.localCheckpoint()  # cut lineage once; reused 5+1 times
    # nodes is joined every iteration: materialize it once too, or each
    # new_ranks join would re-run the union+distinct shuffle
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .distinct()
             .localCheckpoint())
    n = nodes.count()
    if n == 0:
        return edges.sparkSession.createDataFrame(
            [], "node string, rank double")
    deg = out_degrees(edges)
    # (src, dst, out_deg) reused every iteration
    e = edges.join(deg, "src").localCheckpoint()

    if redistribute_dangling:
        # out-degree-0 nodes, fixed across iterations: checkpointed once
        dangling_nodes = nodes.join(
            deg.select(F.col("src").alias("node")), "node", "left_anti"
        ).localCheckpoint()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).persist()
    ranks.count()
    for _ in range(iters):
        base = (1.0 - damping) / n
        if redistribute_dangling:
            dm = (dangling_nodes.join(ranks, "node")
                  .agg(F.sum("rank")).collect()[0][0]) or 0.0
            base += damping * dm / n
        contribs = (
            e.join(ranks, e.src == ranks.node)
            .select(F.col("dst").alias("node"),
                    (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inbound")))
        new_ranks = (
            nodes.join(contribs, "node", "left")
            .select("node",
                    (F.lit(base)
                     + F.lit(damping) * F.coalesce("inbound", F.lit(0.0)))
                    .alias("rank"))
            .persist())
        new_ranks.count()
        old = ranks
        ranks = new_ranks
        old.unpersist()
    out = ranks.select("node", F.round("rank", round_to).alias("rank"))
    result = out.localCheckpoint()
    ranks.unpersist()
    return result


def k_hop(edges: DataFrame, seeds: DataFrame, k: int = 3) -> DataFrame:
    """Nodes reachable within k hops of each seed (excluding the seed).

    ``seeds`` carries a ``node`` column; output is (root, node,
    first_hop) — the hop at which each node was FIRST reached from that
    root (BFS layering, deterministic).

    One unioned ``visited`` frame (localCheckpoint'd per hop: a single
    materializing job) replaces the per-layer anti-join chain — O(k)
    joins in the whole plan instead of O(k^2), which is what survives
    k=10+ traversals.  The frontier is a filter on the checkpointed
    visited set, not a separate materialization.
    """
    edges = edges.localCheckpoint()
    visited = (seeds.select(F.col("node").alias("root"), F.col("node"),
                            F.lit(0).alias("first_hop"))
               .localCheckpoint())
    for hop in range(1, k + 1):
        frontier = visited.filter(F.col("first_hop") == hop - 1)
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select("root", F.col("dst").alias("node"))
            .distinct()
            .join(visited, ["root", "node"], "left_anti")
            .withColumn("first_hop", F.lit(hop)))
        visited = visited.unionByName(nxt).localCheckpoint()
    return visited.filter(F.col("first_hop") > 0)
