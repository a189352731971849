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
    from cbor_ld_spark.plans.partitioning import parquet_rows, spread_input

    # single-file scan = one input partition: spread so the shingle/
    # hash map stages downstream run at machine width (guide §2.5)
    p = f"{sf_dir}/documents.parquet"
    return spread_input(spark.read.parquet(p), rows=parquet_rows(p))


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
    sigs = (signatures if signatures is not None
            else minhash_signatures(docs, num_hashes, shingle_n))
    return banded_signature_pairs(sigs, num_hashes, bands,
                                  id_col="doc_id",
                                  out_a="doc_a", out_b="doc_b")


def banded_signature_pairs(sigs: DataFrame, num_hashes: int, bands: int,
                           id_col: str = "doc_id",
                           out_a: str = "id_a",
                           out_b: str = "id_b") -> DataFrame:
    """Banded-LSH candidate pairs from (id, signature array<long>) rows.

    Shared machinery: document MinHash (``minhash_lsh_pairs``) and
    adjacency-set MinHash (``graph.neighborhood_overlap_lsh``) bucket
    identically — band bucket = xxhash64 of the comma-joined signature
    slice; ids sharing any band bucket pair up (id_a < id_b).  Shuffle
    key = (band, bucket): uniform by construction, so no salting needed
    even on skewed inputs — a mega-hub only collides with genuinely
    similar sets, never with its whole neighborhood.
    """
    rows_per_band = num_hashes // bands
    band_rows = sigs.select(
        F.col(id_col),
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
    ).select(id_col, "bb.band", "bb.bucket")
    # eager localCheckpoint: the band table feeds both self-join sides
    # (alias plans defeat exchange reuse) and its blocks are released by
    # the ContextCleaner when unreferenced, unlike a leaked persist
    band_rows = band_rows.localCheckpoint()
    left = band_rows.alias("l")
    right = band_rows.alias("r")
    pairs = (
        left.join(right, on=["band", "bucket"])
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(F.col(f"l.{id_col}").alias(out_a),
                F.col(f"r.{id_col}").alias(out_b))
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

    Shape: explode tokens -> xxhash64 once -> groupBy(doc_id) with one
    ``sum`` per bit + a count, then compose the hash from the bit
    majorities.  Everything stays in whole-stage codegen; the per-doc
    partial aggregation collapses each document's tokens map-side, so
    the shuffle moves exactly one row per document on a uniform key.
    (The previous formulation ran ``bits`` interpreted higher-order
    ``filter`` passes per row — ~30x more expression evaluation.)
    """
    # coalesce: a NULL text must still yield a simhash row (explode of a
    # NULL array would silently drop the document)
    toks = F.split(_norm(F.coalesce(F.col("text"), F.lit(""))), " ")
    ex = docs.select("doc_id", F.explode(toks).alias("tok"))
    h = F.xxhash64("tok")
    aggs = [F.sum(F.shiftright(h, b).bitwiseAND(F.lit(1))).alias(f"_o{b}")
            for b in range(bits)]
    per = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_n"), *aggs)
    sim = F.lit(0).cast("long")
    for b in range(bits):
        # linear OR-chain (each step references the previous tree once;
        # a when(...).otherwise(prev) rebind would double it per step)
        sim = sim.bitwiseOR(
            F.when(F.col(f"_o{b}") * 2 > F.col("_n"),
                   F.lit(1 << b).cast("long"))
            .otherwise(F.lit(0).cast("long")))
    return per.select("doc_id", sim.alias("simhash"))


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


def simhash_near_pairs(docs: DataFrame, bits: int = 32, bands: int = 4,
                       max_distance: int = 3,
                       simhashes: DataFrame | None = None) -> DataFrame:
    """Near-duplicate pairs within ``max_distance`` hamming bits.

    Banded-hamming bucketing: split the ``bits``-bit simhash into
    ``bands`` disjoint bit-bands; by pigeonhole, two hashes differing in
    at most ``max_distance`` < ``bands`` bits agree exactly on at least
    one band.  Bucket-join on (band, band_bits) — the only shuffle, on a
    uniform key — then exact ``bit_count(xor)`` rerank JVM-side.  Never
    all-pairs: candidate count ~ corpus / bucket cardinality.
    """
    if max_distance >= bands:
        raise ValueError(
            f"max_distance ({max_distance}) must be < bands ({bands}) "
            "for the pigeonhole guarantee to hold")
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    sims = simhashes if simhashes is not None else simhash(docs, bits)
    # band table feeds both self-join sides; checkpoint so the simhash
    # aggregation runs once (alias plans defeat exchange reuse)
    band_rows = sims.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright("simhash", b * band_bits)
                .bitwiseAND(F.lit(mask)).alias("val"))
            for b in range(bands)
        ])).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.val").localCheckpoint()
    left = band_rows.alias("l")
    right = band_rows.alias("r")
    dist = F.bit_count(
        F.col("l.simhash").bitwiseXOR(F.col("r.simhash")))
    return (
        left.join(right, on=["band", "val"])
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .filter(dist <= max_distance)
        .select(F.col("l.doc_id").alias("doc_a"),
                F.col("r.doc_id").alias("doc_b"),
                dist.cast("int").alias("distance"))
        .distinct()
        .orderBy("doc_a", "doc_b")
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
    from cbor_ld_spark.plans.partitioning import spread_input

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    if max_vectors is not None:
        emb = emb.filter(F.col("vec_id") < max_vectors)
    # single-file scan = one partition; the all-pairs fold below is the
    # expensive stage, so spread the vectors first (guide §2.5)
    emb = spread_input(emb)
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


def embedding_near_duplicates_lsh(spark: SparkSession, sf_dir: str,
                                  threshold: float = 0.4,
                                  n_planes: int = 6,
                                  n_tables: int = 8) -> DataFrame:
    """Cosine near-dup via hyperplane LSH — the 100 TB scale path.

    The exact tiers (:func:`embedding_near_duplicates` /
    ``_blocked``) are inherently O(n^2) compute; this tier bounds
    candidates first: one ``mapInArrow`` matmul assigns every vector a
    sign-bucket per table (operators/similarity._with_lsh_buckets —
    deterministic Lehmer planes, replayed by the DuckDB oracle; the
    matmul's summation order differs from the oracle's sequential fold,
    so sign decisions could in principle diverge for projections within
    float-ulp of zero — none observed at gate scale), candidates are
    pairs sharing a bucket in *any* table
    (recall dial ~ n_tables x collision prob^n_planes), and only
    candidates pay the exact rerank.  The only shuffle is the bucket
    join on the uniform (tbl, bucket) key — never all-pairs.
    """
    from .similarity import _with_lsh_buckets, embedding_dim, load_embeddings

    emb = load_embeddings(spark, sf_dir).select("vec_id", "v")
    dim = embedding_dim(sf_dir, fallback=emb)
    tabled = (
        _with_lsh_buckets(emb, dim, n_planes, n_tables)
        .select("vec_id", "v", F.posexplode("buckets").alias("tbl", "bucket"))
        .localCheckpoint()  # feeds both self-join sides exactly once
    )
    a, b = tabled.alias("a"), tabled.alias("b")
    # NO dedup here: deduping candidate pairs would shuffle the vector
    # payloads (~1 KB/pair); instead rerank every bucket collision (a
    # pair repeats at most n_tables times, and the rerank is vectorized)
    # and distinct() the tiny (vec_a, vec_b, cosine) rows afterwards
    cand = (
        a.join(b, on=["tbl", "bucket"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
                F.col("a.v").alias("va"), F.col("b.v").alias("vb"))
    )

    # vectorized rerank: per-Arrow-batch row dots (an interpreted HOF
    # fold per candidate pair was ~3x the query wall at sf0.1).  Same
    # precedent as the blocked tier: BLAS vs sequential-fold summation
    # agree after round(6) at this dimensionality (verified vs the
    # fold-based DuckDB oracle at the gate scale).
    import numpy as np
    import pyarrow as pa

    thr = float(threshold)

    def rerank(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            va = np.asarray(batch.column(2).flatten(),
                            dtype=np.float64).reshape(n, -1)
            vb = np.asarray(batch.column(3).flatten(),
                            dtype=np.float64).reshape(n, -1)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.round(
                    np.einsum("ij,ij->i", va, vb)
                    / (np.linalg.norm(va, axis=1)
                       * np.linalg.norm(vb, axis=1)),
                    6)
            # Spark/DuckDB order NaN above every number, so a zero-norm
            # pair (cos = 0/0 = NaN) passes `cosine >= thr` there;
            # `~(cos < thr)` reproduces that, where `cos >= thr` would
            # silently drop it (numpy NaN comparisons are all-False)
            keep = ~(cos < thr)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0).filter(pa.array(keep)),
                 batch.column(1).filter(pa.array(keep)),
                 pa.array(cos[keep])],
                ["vec_a", "vec_b", "cosine"])

    return (
        cand.mapInArrow(rerank, "vec_a long, vec_b long, cosine double")
        .distinct()
        .orderBy("vec_a", "vec_b")
    )


def embedding_near_duplicates_blocked(spark: SparkSession, sf_dir: str,
                                      threshold: float = 0.95,
                                      block_size: int = 4096) -> DataFrame:
    """Exact cosine near-dup, distributed block-pair matmul (BLAS).

    Vectors hash into B = ceil(n / block_size) blocks; each of the
    B(B+1)/2 block *pairs* is one ``applyInPandas`` group that multiplies
    its two (block_size, d) matrices with BLAS.  Nothing is collected to
    the driver and nothing is broadcast: per-task memory is two blocks,
    the shuffle key (blk_i, blk_j) is uniform by construction (modulo
    hashing), and every (a, b) pair is examined exactly once (in the
    block pair (min(ha, hb), max(ha, hb))).

    Exact all-pairs is inherently O(n^2) compute: this tier is for
    corpora where that is affordable (~10^7 vectors).  Beyond that,
    bound candidates first (operators.similarity LSH/IVF) and rerank
    exactly — the replication factor here (each vector ships to B block
    pairs) makes larger exact runs shuffle-bound by design, not OOM.
    """
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", "embedding")
    # size the block grid from parquet footer metadata — no Spark scan;
    # the count only bounds per-task memory, so footer-exact is plenty.
    # pyarrow can't reach every Spark-readable filesystem (hdfs://,
    # dbfs:/): degrade to the column-pruned Spark count there.
    try:
        import pyarrow.dataset as ds

        n = ds.dataset(f"{sf_dir}/embeddings.parquet").count_rows()
    except Exception:
        n = emb.select("vec_id").count()
    n_blocks = max(1, -(-n // block_size))
    pairs = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "blk_i int, blk_j int")
    blk = F.pmod(F.col("vec_id"), F.lit(n_blocks)).cast("int")
    a = emb.withColumn("blk", blk)
    lhs = (a.join(F.broadcast(pairs), a.blk == pairs.blk_i)
           .withColumn("side", F.lit(0)))
    rhs = (a.join(F.broadcast(pairs.filter("blk_i != blk_j")),
                  a.blk == pairs.blk_j)
           .withColumn("side", F.lit(1)))
    both = lhs.unionByName(rhs).select(
        "blk_i", "blk_j", "side", "vec_id", "embedding")

    def fn(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
        left = pdf[pdf["side"] == 0]
        if len(left) == 0:  # block i empty (n < n_blocks edge): no pairs
            return empty
        ids0 = left["vec_id"].to_numpy()
        m0 = np.array(left["embedding"].tolist(), dtype=np.float64)
        m0 /= np.linalg.norm(m0, axis=1, keepdims=True)
        # same-block must come from the GROUP KEY, not side counts: a
        # cross pair (i, j) whose block j is empty would otherwise be
        # misread as same-block and re-emit block i's self-pairs
        same_block = bool(pdf["blk_i"].iloc[0] == pdf["blk_j"].iloc[0])
        if same_block:
            ids1, m1 = ids0, m0
        else:
            right = pdf[pdf["side"] == 1]
            if len(right) == 0:  # block j empty: no cross pairs
                return empty
            ids1 = right["vec_id"].to_numpy()
            m1 = np.array(right["embedding"].tolist(), dtype=np.float64)
            m1 /= np.linalg.norm(m1, axis=1, keepdims=True)
        sims = m0 @ m1.T
        ri, ci = (sims >= threshold).nonzero()
        out_a, out_b, out_c = [], [], []
        for r, c in zip(ri, ci):
            x, y = int(ids0[r]), int(ids1[c])
            if x == y:
                continue
            out_a.append(min(x, y) if same_block else x if x < y else y)
            out_b.append(max(x, y))
            out_c.append(round(float(sims[r, c]), 6))
        res = pd.DataFrame({"vec_a": out_a, "vec_b": out_b, "cosine": out_c})
        # same-block pairs surface twice ((r,c) and (c,r)); keep one
        return res.drop_duplicates(["vec_a", "vec_b"]) if same_block else res

    return (
        both.groupBy("blk_i", "blk_j")
        .applyInPandas(fn, schema="vec_a long, vec_b long, cosine double")
        .orderBy("vec_a", "vec_b")
    )
