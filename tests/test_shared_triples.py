"""Session-scoped shared triples tier (plans/shared.py): one kernel
materialization feeds the whole graph-query family."""

import pytest  # noqa: F401


def test_shared_triples_single_materialization(spark):
    from cbor_ld_spark.plans import clear_shared_triples, shared_triples

    clear_shared_triples()
    try:
        a = shared_triples(spark, "/root/testdata/sf0.001")
        b = shared_triples(spark, "/root/testdata/sf0.001")
        assert a is b  # cache hit: the SAME materialized frame
        # lineage is cut: downstream actions scan the checkpointed RDD,
        # the Python kernel never re-runs
        plan = a._jdf.queryExecution().executedPlan().toString()
        assert "Scan ExistingRDD" in plan, plan
        assert "MapInArrow" not in plan and "BatchEvalPython" not in plan
    finally:
        clear_shared_triples()


def test_shared_triples_matches_direct_derivation(spark):
    from cbor_ld_spark.operators import process_corpus, triples_table
    from cbor_ld_spark.plans import clear_shared_triples, shared_triples
    from cbor_ld_spark.sources import corpus_from_documents

    clear_shared_triples()
    try:
        shared = shared_triples(spark, "/root/testdata/sf0.001")
        direct = triples_table(
            process_corpus(corpus_from_documents(
                spark, "/root/testdata/sf0.001")))
        assert shared.columns == direct.columns
        key = [c for c in shared.columns]
        assert (sorted(map(tuple, shared.select(*key).collect()))
                == sorted(map(tuple, direct.select(*key).collect())))
    finally:
        clear_shared_triples()


def test_shared_triples_keyed_by_dir_and_clearable(spark):
    from cbor_ld_spark.plans import clear_shared_triples, shared_triples
    from cbor_ld_spark.plans.shared import _TRIPLES_CACHE

    clear_shared_triples()
    try:
        a = shared_triples(spark, "/root/testdata/sf0.001")
        b = shared_triples(spark, "/root/testdata/sf0.01")
        assert a is not b
        assert len(_TRIPLES_CACHE) == 2
        clear_shared_triples()
        assert not _TRIPLES_CACHE
        c = shared_triples(spark, "/root/testdata/sf0.001")
        assert c is not a  # fresh materialization after clear
    finally:
        clear_shared_triples()


def test_shared_canonical_triples_single_materialization(spark):
    from cbor_ld_spark.plans import (
        clear_shared_triples,
        shared_canonical_triples,
    )

    clear_shared_triples()
    try:
        a = shared_canonical_triples(spark, "/root/testdata/sf0.001")
        b = shared_canonical_triples(spark, "/root/testdata/sf0.001")
        assert a is b
        plan = a._jdf.queryExecution().executedPlan().toString()
        assert "Scan ExistingRDD" in plan, plan
        assert "MapInArrow" not in plan and "BatchEvalPython" not in plan
    finally:
        clear_shared_triples()


def test_shared_canonical_matches_direct(spark):
    from cbor_ld_spark.operators import process_corpus, triples_table
    from cbor_ld_spark.operators.canonicalize import canonical_triples
    from cbor_ld_spark.plans import (
        clear_shared_triples,
        shared_canonical_triples,
    )
    from cbor_ld_spark.sources import corpus_from_documents

    clear_shared_triples()
    try:
        shared = shared_canonical_triples(spark, "/root/testdata/sf0.001")
        direct = canonical_triples(triples_table(process_corpus(
            corpus_from_documents(spark, "/root/testdata/sf0.001"))))
        assert shared.columns == direct.columns
        assert (sorted(map(tuple, shared.collect()))
                == sorted(map(tuple, direct.collect())))
    finally:
        clear_shared_triples()
