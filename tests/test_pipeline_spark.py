"""Tier-2: distributed pipeline correctness on local Spark.

Covers: corpus synthesis + quarantine behavior, triple P/R against the
golden fixtures (the rule's >=0.95 gate), entity linking, canonical
labeling isomorphism-invariance, and checkpoint-resume idempotency.
"""

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "cbor_ld_spark", "fixtures",
)


@pytest.fixture(scope="module")
def processed(spark):
    from cbor_ld_spark.operators import process_corpus
    from cbor_ld_spark.sources import synthesize_corpus

    return process_corpus(synthesize_corpus(spark, 200)).cache()


def test_quarantine_never_kills_partitions(processed):
    kinds = {r["error_kind"]: r["n"] for r in
             processed.groupBy("error_kind")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    # encodable docs succeed; inline-context, unmounted-context and
    # truncated-JSON rows land in the quarantine kinds
    assert None in kinds
    assert "InvalidContextEntry" in kinds  # uncompressible
    assert "LoadingDocumentFailed" in kinds  # didKey
    assert "JSONDecodeError" in kinds  # truncated


def test_roundtrip_invariant_all_ok_docs(processed):
    bad = processed.filter(F.col("ok") & ~F.col("roundtrip_ok")).count()
    assert bad == 0


def test_compression_on_corpus(processed):
    row = (processed.filter(F.col("ok"))
           .agg(F.sum("cbor_len").alias("c"), F.sum("json_len").alias("j"))
           .collect()[0])
    assert row["c"] < row["j"] * 0.6


def _golden_triples(name):
    with open(os.path.join(FIXTURES, "triples", f"{name}.triples.json")) as f:
        return {tuple(r) for r in json.load(f)}


def test_triples_pr_vs_golden(spark):
    """P/R of pipeline-emitted triples vs golden fixtures (rule: >=0.95).

    The pipeline prefixes blank nodes with the doc sha; strip the prefix
    to compare against the document-scoped goldens.
    """
    from cbor_ld_spark.operators import process_corpus, triples_table

    rows = []
    for name in ["note", "prc", "truage", "cit"]:
        with open(os.path.join(FIXTURES, "samples", f"{name}.jsonld")) as f:
            rows.append((f"org/{name}", f"creds/{name}.jsonld", "c0", "json",
                         f.read()))
    repos = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string")
    got = triples_table(process_corpus(repos)).collect()

    def strip(v):
        if isinstance(v, str) and v.startswith("_:") and "_b" in v:
            return "_:b" + v.rsplit("_b", 1)[1]
        return v

    emitted = {
        (strip(r["subj"]), r["pred"], strip(r["obj"]), r["obj_is_iri"],
         r["obj_datatype"] or "", r["obj_lang"] or "", strip(r["graph"]))
        for r in got
    }
    golden = set()
    for name in ["note", "prc", "truage", "cit"]:
        golden |= _golden_triples(name)

    tp = len(emitted & golden)
    precision = tp / len(emitted)
    recall = tp / len(golden)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    assert precision == 1.0 and recall == 1.0  # exact today


def test_connected_components_basic(spark):
    from cbor_ld_spark.operators.linking import connected_components

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("p", "p")],
        "src string, dst string")
    expected = {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "p": "p"}
    # driver union-find fast path
    got = {r["id"]: r["component"]
           for r in connected_components(edges).collect()}
    assert got == expected
    # distributed label-propagation path (threshold forced to 0)
    got_dist = {r["id"]: r["component"]
                for r in connected_components(edges,
                                              driver_threshold=0).collect()}
    assert got_dist == expected


def test_connected_components_paths_agree(spark):
    import random

    from cbor_ld_spark.operators.linking import connected_components

    rng = random.Random(7)
    rows = [(f"n{rng.randrange(200)}", f"n{rng.randrange(200)}")
            for _ in range(400)]
    edges = spark.createDataFrame(rows, "src string, dst string")
    fast = sorted(map(tuple, connected_components(edges).collect()))
    dist = sorted(map(tuple, connected_components(
        edges, driver_threshold=0).collect()))
    assert fast == dist


def test_canonicalization_isomorphism_invariance():
    from cbor_ld_spark.operators.canonicalize import (
        _canonical_labels_for_component,
    )

    g1 = [("_:x", "p", "_:y", True), ("_:y", "q", "lit", False),
          ("_:x", "r", "http://a", True)]
    g2 = [("_:n2", "q", "lit", False), ("_:n1", "p", "_:n2", True),
          ("_:n1", "r", "http://a", True)]
    m1 = _canonical_labels_for_component(g1)
    m2 = _canonical_labels_for_component(g2)
    relabel1 = {(m1.get(s, s), p, m1.get(o, o)) for s, p, o, _ in g1}
    relabel2 = {(m2.get(s, s), p, m2.get(o, o)) for s, p, o, _ in g2}
    assert relabel1 == relabel2


def test_build_kg_resume_idempotent(spark):
    from cbor_ld_spark.plans import build_kg
    from cbor_ld_spark.sources import synthesize_corpus

    out = tempfile.mkdtemp(prefix="kgtest_")
    try:
        repos = synthesize_corpus(spark, 120)
        s1 = build_kg(spark, repos, out, run_id="r1", n_buckets=4)
        assert s1["docs_processed_this_run"] > 0
        s2 = build_kg(spark, repos, out, run_id="r1", n_buckets=4)
        assert s2["docs_processed_this_run"] == 0
        for k in ("docs_total", "triples_total", "nodes_total", "edges_total"):
            assert s1[k] == s2[k], k
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_entity_linking_across_documents(spark):
    """truage and cit share the same urn:uuid @id -> one linked entity."""
    from cbor_ld_spark.operators import process_corpus, triples_table
    from cbor_ld_spark.operators.linking import link_entities

    rows = []
    for name in ["truage", "cit"]:
        with open(os.path.join(FIXTURES, "samples", f"{name}.jsonld")) as f:
            rows.append((f"org/{name}", f"creds/{name}.jsonld", "c0", "json",
                         f.read()))
    repos = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string")
    triples = triples_table(process_corpus(repos))
    comp = link_entities(triples)
    uuid_comp = comp.filter(
        F.col("id") == "urn:uuid:188e8450-269e-11eb-b545-d3692cf35398"
    ).collect()[0]["component"]
    # both credentials' proof nodes land in the same component
    members = comp.filter(F.col("component") == uuid_comp).count()
    assert members >= 8


def test_load_repos_jsonl_and_csv(spark, tmp_path):
    """Corpus interchange formats: jsonl/csv sources feed the same
    kernel pipeline as parquet, with explicit (non-inferred) schemas."""
    import json

    from cbor_ld_spark.operators import process_corpus
    from cbor_ld_spark.sources import load_repos, synthesize_corpus

    rows = synthesize_corpus(spark, 40).collect()
    jsonl = tmp_path / "corpus.jsonl"
    with open(jsonl, "w") as f:
        for r in rows:
            f.write(json.dumps(r.asDict()) + "\n")
    got = load_repos(spark, str(jsonl))
    assert got.count() == 40
    assert got.columns == ["repo", "path", "commit", "lang", "content"]
    # and it runs end-to-end through the kernel
    ok = process_corpus(got).filter("ok").count()
    assert ok > 0

    csv = tmp_path / "corpus.csv"
    (spark.createDataFrame(rows)
     .coalesce(1).write.option("header", "true")
     .option("escape", '"').mode("overwrite").csv(str(csv)))
    got_csv = load_repos(spark, str(csv), fmt="csv")
    assert got_csv.count() == 40
    assert process_corpus(got_csv).filter("ok").count() == ok


def test_load_repos_orc(spark, tmp_path):
    """ORC source (columnar interchange besides parquet) feeds the same
    kernel pipeline; extension sniff and explicit fmt both work."""
    from cbor_ld_spark.operators import process_corpus
    from cbor_ld_spark.sources import load_repos, synthesize_corpus

    orc = tmp_path / "corpus.orc"
    synthesize_corpus(spark, 40).write.orc(str(orc))
    got = load_repos(spark, str(orc))
    assert got.count() == 40
    assert got.columns == ["repo", "path", "commit", "lang", "content"]
    assert process_corpus(got).filter("ok").count() > 0
    assert load_repos(spark, str(orc), fmt="orc").count() == 40


def test_build_kg_analytics_tier(spark):
    """--analytics writes pagerank/coreness/communities tables over the
    canonical entity graph, all keyed by the same node set, plus an
    'analytics' lineage row; the default build writes none of it."""
    from cbor_ld_spark.plans import build_kg
    from cbor_ld_spark.sources import synthesize_corpus

    out = tempfile.mkdtemp(prefix="kgtest_an_")
    try:
        repos = synthesize_corpus(spark, 120)
        s = build_kg(spark, repos, out, run_id="a1", n_buckets=4,
                     analytics=True)
        assert s["analytics_nodes"] > 0
        pr = spark.read.parquet(os.path.join(out, "analytics", "pagerank"))
        kc = spark.read.parquet(os.path.join(out, "analytics", "coreness"))
        cm = spark.read.parquet(os.path.join(out, "analytics", "communities"))
        n = s["analytics_nodes"]
        assert pr.count() == kc.count() == cm.count() == n
        assert {r["node"] for r in pr.select("node").collect()} == \
            {r["node"] for r in kc.select("node").collect()}
        lineage = spark.read.parquet(os.path.join(out, "lineage"))
        stages = {r["stage"] for r in lineage.select("stage").collect()}
        assert "analytics" in stages
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_build_kg_analytics_incremental_reuse(spark):
    """Incremental analytics maintenance (r6 VERDICT #6): an append
    that introduces no new distinct entity edges reuses the tables
    (fingerprint match — byte-identical by construction); an append
    that DOES change the edge set recomputes, and the recomputed
    tables equal a from-scratch build on the same corpus."""
    from cbor_ld_spark.plans import build_kg
    from cbor_ld_spark.sources import synthesize_corpus

    def table(out, name):
        # drop the run_id provenance column (r8 crash-safety stamp) —
        # the value-identity contract is over the analytics columns
        return {tuple(r) for r in spark.read.parquet(
            os.path.join(out, "analytics", name))
            .drop("run_id").collect()}

    out = tempfile.mkdtemp(prefix="kgtest_inc_")
    out2 = tempfile.mkdtemp(prefix="kgtest_inc_scratch_")
    try:
        s1 = build_kg(spark, synthesize_corpus(spark, 120), out,
                      run_id="r1", n_buckets=4, analytics=True)
        assert s1["analytics_reused"] is False
        before = {t: table(out, t)
                  for t in ("pagerank", "coreness", "communities")}

        # duplicate append: same 120-row corpus again under a new
        # run_id -> same distinct docs -> same entity edges -> REUSE
        s2 = build_kg(spark, synthesize_corpus(spark, 120), out,
                      run_id="r2", n_buckets=4, analytics=True)
        assert s2["analytics_reused"] is True
        for t in before:
            assert table(out, t) == before[t]
        lineage = spark.read.parquet(os.path.join(out, "lineage"))
        stages = [r["stage"] for r in lineage.select("stage").collect()]
        assert "analytics_reuse" in stages

        # growing append: 120 -> 200 rows draws new (variant, entity)
        # combinations -> new edges -> fingerprint differs -> recompute
        s3 = build_kg(spark, synthesize_corpus(spark, 200), out,
                      run_id="r3", n_buckets=4, analytics=True)
        assert s3["analytics_reused"] is False
        # value-identity vs a from-scratch build of the same corpus
        build_kg(spark, synthesize_corpus(spark, 200), out2,
                 run_id="s1", n_buckets=4, analytics=True)
        for t in ("pagerank", "coreness", "communities"):
            assert table(out, t) == table(out2, t), t
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(out2, ignore_errors=True)


def test_build_kg_analytics_reuse_crash_safe(spark):
    """Crash safety of the analytics reuse gate (ADVICE r7): a run
    that overwrote product tables but DIED before appending its
    fingerprint must not poison a later fingerprint-matching run into
    reusing the mixed tables — each table is stamped with its writer's
    run_id and reuse requires all three to match the fingerprint's
    tables_run_id."""
    from pyspark.sql import functions as F

    from cbor_ld_spark.plans import build_kg
    from cbor_ld_spark.sources import synthesize_corpus

    out = tempfile.mkdtemp(prefix="kgtest_crash_")
    try:
        s1 = build_kg(spark, synthesize_corpus(spark, 120), out,
                      run_id="r1", n_buckets=4, analytics=True)
        assert s1["analytics_reused"] is False

        # simulate a crashed run: it recomputed pagerank for a
        # DIFFERENT edge set (content garbage here — the point is the
        # table no longer belongs to the fingerprinted set) and died
        # before fingerprint append
        pr_path = os.path.join(out, "analytics", "pagerank")
        zombie = (spark.read.parquet(pr_path)
                  .limit(3)
                  .withColumn("run_id", F.lit("crashed-run"))
                  .localCheckpoint())
        zombie.write.mode("overwrite").parquet(pr_path)

        # same corpus again: fingerprint matches the latest committed
        # row, but pagerank's run_id != tables_run_id -> recompute
        s2 = build_kg(spark, synthesize_corpus(spark, 120), out,
                      run_id="r2", n_buckets=4, analytics=True)
        assert s2["analytics_reused"] is False
        ids = {r["run_id"] for r in spark.read.parquet(pr_path)
               .select("run_id").distinct().collect()}
        assert ids == {"r2"}

        # and a clean repeat after the repair DOES reuse, carrying the
        # writer's id forward in the fingerprint row
        s3 = build_kg(spark, synthesize_corpus(spark, 120), out,
                      run_id="r3", n_buckets=4, analytics=True)
        assert s3["analytics_reused"] is True
        fp = (spark.read.option("mergeSchema", "true").parquet(
                  os.path.join(out, "analytics", "edges_fingerprint"))
              .orderBy(F.desc("committed_at")).limit(1).collect()[0])
        assert fp["tables_run_id"] == "r2"
        assert fp["run_id"] == "r3"
    finally:
        shutil.rmtree(out, ignore_errors=True)
