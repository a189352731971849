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


def lsh_plane(p: int, dim: int, seed: int = 7) -> list[float]:
    """Deterministic pseudo-random hyperplane in [-1, 1]^dim.

    Lehmer LCG (mod 2^31-1, multiplier 48271) keyed by (seed, p, d):
    pure 62-bit-safe integer arithmetic, so the exact same plane is
    reproducible anywhere — including the DuckDB oracle — with no RNG
    state and no engine-specific hash function.
    """
    m, a = 2147483647, 48271
    out = []
    for d in range(dim):
        x = (seed * 1_000_003 + p * dim + d + 1) % m
        x = (a * x) % m
        x = (a * x) % m  # two rounds decorrelate adjacent (p, d)
        out.append(x / m * 2.0 - 1.0)
    return out


def _lsh_bucket(v, n_planes: int, dim: int, seed: int = 7):
    """Sign signature against ``n_planes`` deterministic hyperplanes.

    Planes are plan-time literal arrays (``lsh_plane``); the bucket is
    the integer formed by the sign bits of the projections.
    """
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(x) for x in lsh_plane(p, dim, seed)])
        proj = _dot(v, plane)
        bits.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out


def ivf_topk(spark: SparkSession, sf_dir: str, n_queries: int = 5,
             k: int = 5, n_cells: int = 16, n_probe: int = 4,
             kmeans_iters: int = 5) -> DataFrame:
    """IVF (inverted-file) approximate top-k cosine search.

    Train: deterministic k-means on a driver-side sample (centroid seeds
    = the first ``n_cells`` vectors, Lloyd iterations in numpy — at
    corpus scale this is a fixed-size sample, not the corpus).
    Index: assign every vector to its nearest centroid (one broadcast of
    the tiny centroid matrix; assignment is a JVM-side argmax over
    ``n_cells`` dot products).  Search: each query probes its ``n_probe``
    nearest cells; the candidate scan is ~``n_probe/n_cells`` of the
    corpus, and the shuffle key (cell) has bounded fan-in.
    """
    import numpy as np

    emb = load_embeddings(spark, sf_dir)

    sample = np.array(
        [r["v"] for r in emb.orderBy("vec_id").limit(4096).collect()])
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1.0  # zero vectors stay zero instead of NaN
    sample = sample / norms
    n_cells = min(n_cells, len(sample))  # tiny corpora: fewer cells
    if n_cells == 0:
        return spark.createDataFrame(
            [], "query_id long, rank int, vec_id long, cosine double")
    centroids = sample[:n_cells].copy()
    for _ in range(kmeans_iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(n_cells):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                centroids[c] = m / np.linalg.norm(m)

    def cell_of(vcol):
        # argmax over n_cells dot products via one scores array (a
        # when-chain would duplicate subtrees exponentially)
        scores = F.array(*[
            _dot(vcol, F.array(*[F.lit(float(x)) for x in centroids[c]]))
            for c in range(n_cells)
        ])
        return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")

    # localCheckpoint: blocks are ContextCleaner-released when the frame
    # goes out of scope (a persist here would leak across a query suite)
    indexed = emb.withColumn("cell", cell_of(F.col("v"))).localCheckpoint()

    queries = indexed.filter(F.col("vec_id") < n_queries).collect()
    probe_rows = []
    for q in queries:
        qv = np.array(q["v"])
        qn = np.linalg.norm(qv)
        qv = qv / (qn if qn else 1.0)
        order = np.argsort(-(centroids @ qv))[:n_probe]
        for c in order:
            probe_rows.append((q["vec_id"], int(c), q["v"]))
    probes = spark.createDataFrame(
        probe_rows, "query_id long, cell int, qv array<double>")

    scored = (
        indexed.join(F.broadcast(probes), on="cell")
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


def lsh_topk(spark: SparkSession, sf_dir: str, n_queries: int = 5,
             k: int = 5, n_planes: int = 4, n_tables: int = 8) -> DataFrame:
    """Approximate top-k: multi-table hyperplane LSH + exact rerank.

    L independent tables of b planes each; a corpus vector is a candidate
    if it shares a bucket with the query in *any* table (standard
    recall/cost dial: candidate fraction ~ L/2^b for near-random data,
    sharply less for clustered data).  The join key (table, bucket) is
    uniform; candidates dedupe before rerank so each pair scores once.
    """
    emb = load_embeddings(spark, sf_dir)
    dim = len(emb.select("v").first()["v"])
    tables = emb.select(
        "vec_id", "v",
        F.explode(F.array(*[
            F.struct(F.lit(t).alias("tbl"),
                     _lsh_bucket(F.col("v"), n_planes, dim, seed=7 + 13 * t)
                     .alias("bucket"))
            for t in range(n_tables)
        ])).alias("tb"),
    ).select("vec_id", "v", "tb.tbl", "tb.bucket")

    queries = tables.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        "tbl", "bucket")
    candidates = (
        tables.join(F.broadcast(queries), on=["tbl", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "qv", "v")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = candidates.select(
        "query_id", "vec_id",
        F.round(_dot("qv", "v") / (_norm2("qv") * _norm2("v")), 6)
        .alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
        .orderBy("query_id", "rank")
    )
