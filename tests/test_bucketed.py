"""Bucketed tables: co-located joins plan with zero Exchange nodes."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    from cbor_ld_spark.plans.bucketed import write_bucketed

    a = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 97).alias("grp"))
    b = spark.range(0, 500).select(
        F.col("id"), F.concat(F.lit("n"), F.col("id")).alias("name"))
    write_bucketed(a, "tb_a", "id", n_buckets=8)
    write_bucketed(b, "tb_b", "id", n_buckets=8)
    yield "tb_a", "tb_b"
    spark.sql("DROP TABLE IF EXISTS tb_a")
    spark.sql("DROP TABLE IF EXISTS tb_b")


def test_cogrouped_join_has_no_exchange(spark, bucketed_tables):
    from cbor_ld_spark.plans.bucketed import cogrouped_join

    ta, tb = bucketed_tables
    joined = cogrouped_join(spark, ta, tb, "id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # no shuffle: both sides read bucket files directly into the
    # sort-merge join (broadcast is suppressed by the merge hint)
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" in plan
    assert joined.count() == 500


def test_cogrouped_join_values_correct(spark, bucketed_tables):
    ta, tb = bucketed_tables
    from cbor_ld_spark.plans.bucketed import cogrouped_join

    rows = {r["id"]: r["name"]
            for r in cogrouped_join(spark, ta, tb, "id").collect()}
    assert rows[7] == "n7" and len(rows) == 500


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    """Control: the same join off plain frames plans at least one
    Exchange — proving the bucketed zero-Exchange plan is the bucket
    spec at work, not a trivial plan."""
    a = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 97).alias("grp"))
    b = spark.range(0, 500).select(
        F.col("id"), F.concat(F.lit("n"), F.col("id")).alias("name"))
    # force sort-merge (broadcast would hide the shuffle)
    joined = a.hint("merge").join(b, "id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan


def test_graph_bucketed_materialization(spark, tmp_path):
    from cbor_ld_spark.operators import process_corpus, triples_table
    from cbor_ld_spark.operators.canonicalize import canonical_triples
    from cbor_ld_spark.plans.bucketed import (
        cogrouped_join,
        materialize_graph_bucketed,
    )
    from cbor_ld_spark.sources import corpus_from_documents

    canon = canonical_triples(triples_table(process_corpus(
        corpus_from_documents(spark, "/root/testdata/sf0.001",
                              limit_ids=300))))
    try:
        materialize_graph_bucketed(spark, canon, db="kgtest", n_buckets=4)
        edges = spark.table("kgtest.edges")
        nodes = spark.table("kgtest.nodes")
        deg = (edges.hint("merge")
               .join(nodes, edges.subj_canon == nodes.canon_iri)
               .groupBy("subj_canon").agg(F.count(F.lit(1)).alias("deg")))
        plan = deg._jdf.queryExecution().executedPlan().toString()
        # the join itself must not shuffle (bucket co-location); the
        # groupBy on the same key reuses the bucket distribution too
        assert "Exchange hashpartitioning" not in plan, plan
        assert deg.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS kgtest.edges")
        spark.sql("DROP TABLE IF EXISTS kgtest.nodes")
        spark.sql("DROP DATABASE IF EXISTS kgtest")


def test_dedup_first_pipeline_plan_hygiene(spark, tmp_path):
    """The dedup-first kernel dataflow plans exactly one shuffle (the
    content_sha dropDuplicates), exactly one Python stage (the kernel
    mapInArrow over *distinct* contents, below the join-back), and no
    row-at-a-time Python anywhere — same plan-hygiene bar as the
    bucketed-join assertions above."""
    from cbor_ld_spark.operators import process_corpus
    from cbor_ld_spark.sources import corpus_from_documents

    src = str(tmp_path / "repos.parquet")
    corpus_from_documents(spark, "/root/testdata/sf0.001") \
        .write.parquet(src)
    repos = spark.read.parquet(src)
    out = process_corpus(repos)
    out.count()  # resolve AQE to the final plan
    plan = out._jdf.queryExecution().executedPlan().toString()

    assert plan.count("MapInArrow") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    # the single Python stage sits BELOW the join-back (parents print
    # first): everything after the provenance join is JVM-side
    join_pos = max(plan.find("BroadcastHashJoin"), plan.find("SortMergeJoin"))
    assert join_pos >= 0, plan
    assert plan.find("MapInArrow") > join_pos, plan


def test_pq_topk_plan_hygiene(spark):
    """PQ: exactly ONE Python stage (the encode+ADC-score mapInArrow);
    candidate join-back and query join are broadcast (the corpus never
    shuffles for the join); no row-at-a-time Python."""
    from cbor_ld_spark.operators.similarity import pq_topk

    out = pq_topk(spark, "/root/testdata/sf0.001")
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInArrow") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_pagerank_plan_no_python_no_kernel_rerun(spark):
    """PageRank iterations run on the localCheckpoint'd edge/node frames:
    the final plan contains no Python stages and scans checkpointed
    RDDs, never the original lineage."""
    from cbor_ld_spark.operators.graph import pagerank

    e = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 7) % 50}") for i in range(200)],
        "src string, dst string")
    pr = pagerank(e, iters=3)
    plan = pr._jdf.queryExecution().executedPlan().toString()
    # result frame is itself a checkpoint scan: iterations already ran
    assert "Scan ExistingRDD" in plan, plan
    assert "BatchEvalPython" not in plan and "MapInArrow" not in plan
