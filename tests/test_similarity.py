"""ANN operators: brute-force baseline vs LSH and IVF approximations."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def exact(spark):
    from cbor_ld_spark.operators.similarity import cosine_topk

    return {(r["query_id"], r["vec_id"]) for r in
            cosine_topk(spark, SF, n_queries=5, k=5).collect()}


def test_exact_topk_shape(spark, exact):
    assert len(exact) == 25


def test_lsh_recall(spark, exact):
    from cbor_ld_spark.operators.similarity import lsh_topk

    got = {(r["query_id"], r["vec_id"]) for r in
           lsh_topk(spark, SF, n_queries=5, k=5, n_planes=4).collect()}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.4, recall  # approximate, bucket-limited


def test_ivf_recall(spark, exact):
    from cbor_ld_spark.operators.similarity import ivf_topk

    got = {(r["query_id"], r["vec_id"]) for r in
           ivf_topk(spark, SF, n_queries=5, k=5,
                    n_cells=8, n_probe=4).collect()}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.6, recall


def test_ivf_deterministic(spark):
    from cbor_ld_spark.operators.similarity import ivf_topk

    a = ivf_topk(spark, SF, n_queries=3, k=3).collect()
    b = ivf_topk(spark, SF, n_queries=3, k=3).collect()
    assert a == b
