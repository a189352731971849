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
