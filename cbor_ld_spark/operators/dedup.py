"""Deduplication operators over the ``documents`` table.

Training-data-pipeline dedup at corpus scale, four tiers:

* exact          — hash-groupBy on the normalized content hash; one
                   shuffle on a uniform key (the hash), inherently
                   skew-free.  SQL-oracle-able.
* minhash + LSH  — shingle -> 64-bit hash -> k minima -> band buckets ->
                   bucket join.  The only shuffle is on (band, bucket_sig)
                   whose cardinality ~ corpus size / avg cluster, so the
                   candidate join never goes quadratic.  Hashes are
                   xxhash64 (JVM, whole-stage codegen) — no Python.
* simhash        — 64-bit sign-aggregated token hashes; near-dup =
                   identical simhash (0-distance buckets at scale;
                   banded hamming for distance>0).
* embedding      — cosine near-dup via exact normalized dot product over
                   the ``embeddings`` table (self-join pruned by vec_id <
                   vec_id2; at 10^12 scale the LSH variant in
                   operators.similarity bounds candidates first).

Everything is DataFrame ops; the minhash pipeline is ~6 narrow maps +
1 groupBy, no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .text import _norm


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Duplicate groups by normalized-content hash (size > 1)."""
    return (
        docs
        .select("doc_id", F.md5(_norm(F.col("text"))).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count("doc_id").alias("group_size"),
             F.min("doc_id").alias("canonical_doc_id"))
        .filter(F.col("group_size") > 1)
        .orderBy("canonical_doc_id")
    )


def dedup_keep_first(docs: DataFrame) -> DataFrame:
    """Corpus after exact dedup: keep the lowest doc_id per content hash."""
    h = docs.select("doc_id", F.md5(_norm(F.col("text"))).alias("content_hash"))
    keep = h.groupBy("content_hash").agg(F.min("doc_id").alias("doc_id"))
    return keep.select("doc_id", "content_hash")


def _shingles_of_tokens(toks_col, n: int = 3):
    """Word n-gram shingles via shifted-slice zips.

    An element_at-per-position formulation re-evaluates the token
    expression once per lookup (Catalyst's CollapseProject re-inlines it
    through projections — a cache column does not help), i.e. 3n regex
    splits per shingle.  ``slice`` + ``zip_with`` evaluates the source
    array exactly ``n`` times per row and zips element-wise: measured
    25x faster on sf0.1.
    """
    k = F.greatest(F.size(toks_col) - (n - 1), F.lit(1))
    out = F.slice(toks_col, 1, k)
    for j in range(1, n):
        out = F.zip_with(out, F.slice(toks_col, 1 + j, k),
                         lambda a, b: F.concat_ws(" ", a, b))
    return out


def _with_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """docs -> (doc_id, shingles)."""
    toks = F.split(_norm(F.col("text")), " ")
    return docs.select("doc_id",
                       _shingles_of_tokens(toks, n).alias("shingles"))


def minhash_signatures(docs: DataFrame, num_hashes: int = 16,
                       shingle_n: int = 3) -> DataFrame:
    """MinHash signatures: k independent min-of-xxhash64 over shingles.

    Shape: explode shingles -> k seeded xxhash64 columns -> groupBy(doc)
    with k ``min`` aggregates.  Everything stays in whole-stage codegen
    (higher-order array folds would be interpreted row-at-a-time, ~5x
    slower); the shuffle key is doc_id (uniform) and partial min
    aggregation collapses each doc's shingles map-side.
    """
    exploded = (
        _with_shingles(docs, shingle_n)
        .select("doc_id", F.explode("shingles").alias("shingle"))
    )
    aggs = [F.min(F.xxhash64("shingle", F.lit(i))).alias(f"mh_{i}")
            for i in range(num_hashes)]
    per_doc = exploded.groupBy("doc_id").agg(*aggs)
    return per_doc.select(
        "doc_id",
        F.array(*[F.col(f"mh_{i}") for i in range(num_hashes)])
        .alias("signature"))


def minhash_lsh_pairs(docs: DataFrame, num_hashes: int = 16, bands: int = 4,
                      shingle_n: int = 3,
                      signatures: DataFrame | None = None) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    rows_per_band = num_hashes / bands; docs sharing any band bucket are
    candidates.  Shuffle key = (band, bucket hash): uniform by
    construction, so no salting needed here even on skewed corpora.
    Pass precomputed ``signatures`` to share the (dominant) signature
    cost with other consumers.
    """
    rows_per_band = num_hashes // bands
    sigs = (signatures if signatures is not None
            else minhash_signatures(docs, num_hashes, shingle_n))
    band_rows = sigs.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(F.concat_ws(
                    ",",
                    *[F.element_at("signature", b * rows_per_band + r + 1)
                      .cast("string") for r in range(rows_per_band)],
                )).alias("bucket"),
            )
            for b in range(bands)
        ])).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    # eager localCheckpoint: the band table feeds both self-join sides
    # (alias plans defeat exchange reuse) and its blocks are released by
    # the ContextCleaner when unreferenced, unlike a leaked persist
    band_rows = band_rows.localCheckpoint()
    left = band_rows.alias("l")
    right = band_rows.alias("r")
    pairs = (
        left.join(right, on=["band", "bucket"])
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("doc_a"),
                F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    return pairs


def minhash_jaccard_estimate(docs: DataFrame, num_hashes: int = 16,
                             threshold: float = 0.5) -> DataFrame:
    """LSH candidates refined by signature-overlap Jaccard estimate."""
    # one signature computation shared by the LSH step and both joins
    sigs = minhash_signatures(docs, num_hashes).localCheckpoint()
    pairs = minhash_lsh_pairs(docs, num_hashes, signatures=sigs)
    a = sigs.select(F.col("doc_id").alias("doc_a"),
                    F.col("signature").alias("sig_a"))
    b = sigs.select(F.col("doc_id").alias("doc_b"),
                    F.col("signature").alias("sig_b"))
    est = (
        pairs.join(a, "doc_a").join(b, "doc_b")
        .select(
            "doc_a", "doc_b",
            (F.size(F.filter(F.zip_with("sig_a", "sig_b",
                                        lambda x, y: x == y),
                             lambda eq: eq)).cast("double")
             / num_hashes).alias("jaccard_est"),
        )
        .filter(F.col("jaccard_est") >= threshold)
        .orderBy("doc_a", "doc_b")
    )
    return est


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """SimHash over tokens (sign of per-bit weighted sums).

    Pure Column algebra: token -> xxhash64 once per row, then per bit
    the popcount of set bits vs tokens decides the sign.  Identical
    simhash = near-dup bucket.  ``bits`` is a compile-time constant so
    every shift is a literal (whole-stage codegen friendly).
    """
    toks = F.split(_norm(F.col("text")), " ")
    base = docs.select(
        "doc_id",
        F.transform(toks, lambda t: F.xxhash64(t)).alias("hashes"),
        F.size(toks).alias("n"),
    )
    def _bit_pred(b: int):
        # single-arg lambda factory: a default arg would make PySpark treat
        # the lambda as the 2-arg (element, index) form
        return lambda h: F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1

    sim = F.lit(0).cast("long")
    for b in range(bits):
        ones = F.size(F.filter("hashes", _bit_pred(b)))
        bit = F.when(ones * 2 > F.col("n"),
                     F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = sim.bitwiseOR(bit)
    return base.select("doc_id", sim.alias("simhash"))


def simhash_duplicate_groups(docs: DataFrame) -> DataFrame:
    """Groups of documents sharing an identical simhash."""
    return (
        simhash(docs)
        .groupBy("simhash")
        .agg(F.count("doc_id").alias("group_size"),
             F.min("doc_id").alias("canonical_doc_id"))
        .filter(F.col("group_size") > 1)
        .orderBy("canonical_doc_id")
    )


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3,
                        threshold: float = 0.8) -> DataFrame:
    """Exact n-gram Jaccard over LSH-pruned candidates (verification tier)."""
    sh = _with_shingles(docs, n).select(
        "doc_id", F.array_distinct("shingles").alias("sh"))
    cand = minhash_lsh_pairs(docs)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(a, "doc_a").join(b, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def embedding_near_duplicates(spark: SparkSession, sf_dir: str,
                              threshold: float = 0.95,
                              max_vectors: int | None = None) -> DataFrame:
    """Cosine near-duplicate pairs over the embeddings table (exact).

    Exact all-pairs with id-ordering pruning; double-precision *ordered*
    folds so the DuckDB oracle computes bit-identical scores.  Norms are
    computed once per vector before the join (1 higher-order fold per
    pair instead of 3 — Spark HOFs are interpreted, not codegen'd).
    For corpora beyond ~10^4 vectors use
    :func:`embedding_near_duplicates_blocked` (numpy block matmul) or
    the LSH bucketing in operators.similarity to bound candidates.
    """
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    if max_vectors is not None:
        emb = emb.filter(F.col("vec_id") < max_vectors)
    v = F.transform("embedding", lambda x: x.cast("double"))
    emb = emb.select(
        "vec_id", v.alias("v"),
        F.sqrt(F.aggregate(F.transform(v, lambda x: x * x),
                           F.lit(0.0), lambda acc, x: acc + x)).alias("nrm"),
    ).localCheckpoint()  # ContextCleaner-released, unlike a leaked persist
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
                   F.col("nrm").alias("na"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
                   F.col("nrm").alias("nb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b",
                F.round(dot / (F.col("na") * F.col("nb")), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .orderBy("vec_a", "vec_b")
    )


def embedding_near_duplicates_blocked(spark: SparkSession, sf_dir: str,
                                      threshold: float = 0.95) -> DataFrame:
    """Cosine near-dup at scale: numpy block matmul inside mapInPandas.

    The full embedding matrix is broadcast (fine up to ~10^6 x few-hundred
    dims ~ GBs; beyond that, IVF/LSH partitioning first); each Arrow
    batch of rows multiplies against it with BLAS.  This is the 100 TB
    shape: O(n/batch) tasks, no crossjoin rows ever materialized.
    """
    import numpy as np

    pdf = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", "embedding").toPandas())
    ids = pdf["vec_id"].to_numpy()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    bids = spark.sparkContext.broadcast(ids)
    bmat = spark.sparkContext.broadcast(mat)

    def fn(batches):
        import pandas as pd

        all_ids = bids.value
        all_mat = bmat.value
        id_to_row = {int(i): k for k, i in enumerate(all_ids)}
        for pdf_b in batches:
            rows = [id_to_row[int(i)] for i in pdf_b["vec_id"]]
            block = all_mat[rows]                       # (b, d)
            sims = block @ all_mat.T                    # (b, n) BLAS
            out_a, out_b, out_c = [], [], []
            for r, i in zip(range(len(rows)), pdf_b["vec_id"]):
                js = (sims[r] >= threshold).nonzero()[0]
                for j in js:
                    jid = int(all_ids[j])
                    if int(i) < jid:
                        out_a.append(int(i))
                        out_b.append(jid)
                        out_c.append(round(float(sims[r, j]), 6))
            yield pd.DataFrame({"vec_a": out_a, "vec_b": out_b,
                                "cosine": out_c})

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id")
    return emb.mapInPandas(
        fn, schema="vec_a long, vec_b long, cosine double"
    ).orderBy("vec_a", "vec_b")
