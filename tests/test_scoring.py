"""P/R scoring join + salted join utilities."""

import json
import os

from pyspark.sql import functions as F

FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "cbor_ld_spark", "fixtures",
)

TRIPLE_SCHEMA = ("subj string, pred string, obj string, obj_is_iri boolean, "
                 "obj_datatype string, obj_lang string, graph string")


def _golden_df(spark, names):
    rows = []
    for name in names:
        with open(os.path.join(FIXTURES, "triples",
                               f"{name}.triples.json")) as f:
            for r in json.load(f):
                rows.append((r[0], r[1], r[2], r[3], r[4] or None,
                             r[5] or None, r[6]))
    return spark.createDataFrame(rows, TRIPLE_SCHEMA)


def test_triple_pr_pipeline_vs_golden(spark):
    """The rule's P/R>=0.95 gate, computed as a distributed set-op join."""
    from cbor_ld_spark.operators import process_corpus, triples_table
    from cbor_ld_spark.operators.scoring import triple_pr

    rows = []
    for name in ["note", "prc", "truage", "cit"]:
        with open(os.path.join(FIXTURES, "samples", f"{name}.jsonld")) as f:
            rows.append((f"o/{name}", f"c/{name}.jsonld", "c0", "json",
                         f.read()))
    repos = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string")
    emitted = triples_table(process_corpus(repos))

    # strip the doc-sha prefix so labels align with document-scoped goldens
    def unprefix(c):
        return F.when(F.col(c).startswith("_:"),
                      F.concat(F.lit("_:b"), F.substring_index(F.col(c), "_b", -1))
                      ).otherwise(F.col(c))

    emitted = (emitted
               .withColumn("subj", unprefix("subj"))
               .withColumn("obj", F.when(F.col("obj_is_iri"),
                                         unprefix("obj")).otherwise(F.col("obj")))
               .withColumn("graph", unprefix("graph")))

    golden = _golden_df(spark, ["note", "prc", "truage", "cit"])
    row = triple_pr(emitted, golden).collect()[0]
    assert row["precision"] >= 0.95 and row["recall"] >= 0.95
    assert row["fp"] == 0 and row["fn"] == 0


def test_triple_pr_detects_divergence(spark):
    golden = _golden_df(spark, ["note"])
    mutated = golden.withColumn(
        "obj", F.when(F.col("obj") == "A note", F.lit("B note"))
        .otherwise(F.col("obj")))
    from cbor_ld_spark.operators.scoring import triple_pr

    row = triple_pr(mutated, golden).collect()[0]
    assert row["fp"] == 1 and row["fn"] == 1
    assert row["precision"] < 1.0


def test_salted_join_equivalence(spark):
    from cbor_ld_spark.operators.scoring import salted_join

    big = spark.createDataFrame(
        [(i, "hot" if i % 3 else f"k{i}") for i in range(300)],
        "id long, key string")
    small = spark.createDataFrame(
        [("hot", 1), ("k3", 2), ("k9", 3)], "key string, val int")
    plain = big.join(small, "key").select("id", "val")
    salted = salted_join(big, small, "key").select("id", "val")
    assert sorted(map(tuple, plain.collect())) == \
           sorted(map(tuple, salted.collect()))


def test_salted_join_partition_count_invariance(spark, tmp_path):
    """r2 verdict item 10: output AND salt assignment are identical
    across spark.sql.shuffle.partitions in {8, 32}.  The salt is
    rand(seed=42), a pure function of (partition index, row order), and
    both are fixed by the parquet input splits — not by the shuffle
    width of the join."""
    from cbor_ld_spark.operators.scoring import salted_join

    src = str(tmp_path / "big.parquet")
    spark.createDataFrame(
        [(i, "hot" if i % 3 else f"k{i}") for i in range(500)],
        "id long, key string").coalesce(2).write.parquet(src)
    small = spark.createDataFrame(
        [("hot", 1), ("k3", 2), ("k9", 3)], "key string, val int")

    results = {}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ("8", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            big = spark.read.parquet(src)
            out = salted_join(big, small, "key", keep_salt=True) \
                .select("id", "val", "_salt")
            results[parts] = sorted(map(tuple, out.collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert results["8"] == results["32"]
    # and the join itself is correct vs the unsalted plan
    big = spark.read.parquet(src)
    plain = sorted(map(tuple,
                       big.join(small, "key").select("id", "val").collect()))
    assert sorted((i, v) for i, v, _s in results["8"]) == plain


def test_salted_join_deterministic_under_task_retry(tmp_path):
    """Forced task retry: a first-attempt failure injected downstream of
    the salt assignment must recompute to the identical salts and rows
    (runs in its own session — retries need maxFailures > 1)."""
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent("""
        import sys
        sys.path.insert(0, "/root/repo")
        from pyspark import TaskContext
        from pyspark.sql import SparkSession
        from cbor_ld_spark.operators.scoring import salted_join

        spark = (SparkSession.builder.master("local[2, 3]")
                 .appName("salted-retry-test")
                 .config("spark.sql.shuffle.partitions", "4")
                 .config("spark.ui.enabled", "false")
                 .getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        src = sys.argv[1]
        spark.createDataFrame(
            [(i, "hot" if i % 3 else f"k{i}") for i in range(500)],
            "id long, key string").coalesce(2).write.parquet(src)
        small = spark.createDataFrame(
            [("hot", 1), ("k3", 2), ("k9", 3)], "key string, val int")

        def run(inject):
            big = spark.read.parquet(src)
            out = salted_join(big, small, "key", keep_salt=True) \\
                .select("id", "val", "_salt")

            def flaky(batches):
                ctx = TaskContext.get()
                fail = (inject and ctx.partitionId() == 0
                        and ctx.attemptNumber() == 0)
                if fail:
                    raise RuntimeError("injected first-attempt failure")
                yield from batches

            out = out.mapInArrow(flaky, "id long, val int, _salt int")
            return sorted(map(tuple, out.collect()))

        clean = run(False)
        retried = run(True)
        assert retried == clean, "retry changed salted-join output"
        # 333 'hot' rows + k3 + k9 match the small side
        assert len(clean) == 335, len(clean)
        print("RETRY_DETERMINISM_OK")
        spark.stop()
    """)
    proc = subprocess.run(
        [sys.executable, "-c", script, str(tmp_path / "retry.parquet")],
        capture_output=True, text=True, timeout=300)
    assert "RETRY_DETERMINISM_OK" in proc.stdout, \
        proc.stdout[-2000:] + proc.stderr[-2000:]
