"""Similarity search over the ``embeddings`` table.

Two tiers, as a large-scale pipeline needs:

* ``cosine_topk``      — exact brute-force top-k for a (small) query set:
                         broadcast the queries, one scan over the corpus,
                         per-query top-k via window.  This is the
                         correctness baseline and is oracle-checkable in
                         DuckDB bit-for-bit (double-precision ordered
                         folds on both sides).
* ``lsh_topk``         — random-hyperplane LSH: deterministic
                         pseudo-random planes from xxhash64, bucket join,
                         exact rerank inside buckets.  At 10^12 scale the
                         bucket join bounds the candidate set; the plan
                         is scan + one uniform-key shuffle.

No Python UDFs anywhere — vector math is Column-level array algebra
(zip_with/aggregate), which Catalyst keeps inside codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm2(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(spark: SparkSession, sf_dir: str, n_queries: int = 5,
                k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors.

    The query side is tiny -> broadcast join (no shuffle of the corpus);
    ranking window partitions by query (n_queries partitions, trivially
    balanced).
    """
    emb = load_embeddings(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    scored = (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            F.round(_dot("qv", "v") / (_norm2("qv") * _norm2("v")), 6)
            .alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
        .orderBy("query_id", "rank")
    )


def _lsh_bucket(v, n_planes: int, dim: int, seed: int = 7):
    """Sign signature against n deterministic pseudo-random hyperplanes.

    Plane p component d = xxhash64(seed, p, d) scaled to [-1, 1]; the
    bucket is the integer formed by the sign bits.  Deterministic across
    executors and runs — no RNG state anywhere.
    """
    def plane_component(p, d):
        h = F.xxhash64(F.lit(seed), F.lit(p), d)
        return (h % 10000).cast("double") / 10000.0

    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(v, F.sequence(F.lit(0), F.lit(dim - 1)),
                       lambda x, d: x * plane_component(p, d)),
            F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out


def lsh_topk(spark: SparkSession, sf_dir: str, n_queries: int = 5,
             k: int = 5, n_planes: int = 6) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucket join + exact rerank."""
    emb = load_embeddings(spark, sf_dir)
    dim = len(emb.select("v").first()["v"])
    bucketed = emb.select("vec_id", "v",
                          _lsh_bucket(F.col("v"), n_planes, dim)
                          .alias("bucket"))
    queries = bucketed.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("bucket"))
    scored = (
        bucketed.join(F.broadcast(queries), on="bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id",
                F.round(_dot("qv", "v") / (_norm2("qv") * _norm2("v")), 6)
                .alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
        .orderBy("query_id", "rank")
    )
