"""Pure-Python XXH64 replica vs Spark's xxhash64 expression (live)."""

from pyspark.sql import functions as F

from cbor_ld_spark.functions.xxh64 import spark_xxhash64


def test_xxh64_matches_spark_strings(spark):
    cases = ["", "a", "ab", "abc", "abcd", "abcde", "hello world",
             "x" * 7, "x" * 8, "x" * 9, "y" * 31, "y" * 32, "y" * 33,
             "z" * 100, "the quick brown fox", "café über 中文",
             "-123,456,789", "a b c", " lead", "trail "]
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    rows = df.select(
        "s", F.xxhash64("s").alias("h"),
        *[F.xxhash64("s", F.lit(i)).alias(f"h_{i}") for i in (0, 7, 15)],
    ).collect()
    for r in rows:
        assert spark_xxhash64(r["s"]) == r["h"], r["s"]
        for i in (0, 7, 15):
            assert spark_xxhash64(r["s"], i) == r[f"h_{i}"], (r["s"], i)


def test_xxh64_matches_spark_longs(spark):
    vals = [0, 1, -1, 42, 2**40, -(2**40), 2**62, -(2**62)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    for r in df.select("v", F.xxhash64("v").alias("h")).collect():
        assert spark_xxhash64(("long", r["v"])) == r["h"], r["v"]


def test_dedup_oracle_model_matches_spark(spark):
    """The driver-side dedup replica (signatures + simhash) must agree
    with the Spark operators on a small live corpus."""
    import __spark_entry__ as E
    from cbor_ld_spark.operators.dedup import minhash_signatures, simhash

    sf = "/root/testdata/sf0.001"
    m = E._dedup_oracle_model(sf)
    docs = spark.read.parquet(f"{sf}/documents.parquet") \
        .filter(F.col("doc_id") < 20)
    sigs = {r["doc_id"]: list(r["signature"])
            for r in minhash_signatures(docs).collect()}
    sims = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    for doc_id, sig in sigs.items():
        assert m["sig_of"][doc_id] == sig, doc_id
    for doc_id, sim in sims.items():
        assert m["sim_of"][doc_id] == sim, doc_id
