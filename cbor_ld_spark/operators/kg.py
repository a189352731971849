"""KG-construction dataflow operators (stages 0-3 of the pipeline).

Spark-first realization of SURVEY.md §3.4:

  scan -> sniff filter -> [one Arrow pass: parse/encode/decode/verify/
  expand] -> doc results + exploded triple rows -> metrics aggregates.

  The kernel stage is ``mapInArrow`` (RecordBatch in/out): output columns
  are built with ``pa.array`` directly, skipping the pandas object-Series
  detour entirely (~8% less overhead, lower variance).

Scale notes (the part the 100 TB design hangs on):

* The sniff filter and column projection sit *before* mapInArrow, so
  Catalyst prunes the scan to (repo, path, commit, lang, content) and
  drops non-candidates inside the scan stage.
* ``process_corpus`` keeps partitioning intact — no shuffle at all in
  stages 0-3; the kernel is map-only.  Skewed repos don't matter here
  because nothing is keyed yet; skew handling lives in the downstream
  groupBy/join stages, which salt explicitly (see operators.linking).
* Triples explode JVM-side from the nested column; a 1-doc -> N-triples
  fan-out never materializes Python objects row-at-a-time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cbor_ld_spark.functions.udfs import (
    DOC_RESULT_SCHEMA,
    KERNEL_RESULT_SCHEMA,
    jsonld_sniff,
    kg_process_batches,
)

DOC_COLUMNS = [f.name for f in DOC_RESULT_SCHEMA.fields
               if not f.name.startswith("t_")]


def process_corpus(repos: DataFrame, registry_id: int = 1,
                   emit_triples: bool = True,
                   dedup_content: bool = True) -> DataFrame:
    """repos(repo,path,commit,lang,content) -> per-document KG results.

    ``dedup_content=True`` (default) runs the Python kernel once per
    *distinct* content hash and joins provenance back — the Spark-first
    answer to duplicate files (vendored deps, forks) dominating a source
    corpus: work scales with unique documents, not rows.  The dropDup
    is a partial-aggregated shuffle on the uniform hash key; the
    join-back re-attaches (repo, path, commit) JVM-side, so results are
    row-for-row identical to the per-row path (doc_sha, bnode labels and
    triples are pure functions of content).
    """
    candidates = (
        repos
        .filter(jsonld_sniff(F.col("lang")))
        .select("repo", "path", "commit", "content")
        .withColumn("content_sha", F.sha2(F.col("content"), 256))
    )
    if dedup_content:
        from cbor_ld_spark.plans.partitioning import spread_input

        fn = kg_process_batches(registry_id=registry_id,
                                emit_triples=emit_triples)
        # hash-repartition on the dedup key with an EXPLICIT count, then
        # dropDuplicates: one exchange total (the aggregation reuses the
        # partitioning), and AQE's byte-based coalescer cannot fold the
        # kernel stage back to one partition — a 1 MB batch of distinct
        # documents is minutes of Python work, which the coalescer's
        # sizing cannot see (guide §2.2/§4)
        distinct = (spread_input(candidates.select("content_sha", "content"),
                                 by="content_sha")
                    .dropDuplicates(["content_sha"]))
        results = distinct.mapInArrow(fn, schema=KERNEL_RESULT_SCHEMA)
        return candidates.drop("content").join(results, "content_sha") \
            .select(*[f.name for f in DOC_RESULT_SCHEMA.fields])
    fn = kg_process_batches(registry_id=registry_id,
                            emit_triples=emit_triples, with_provenance=True)
    return candidates.mapInArrow(fn, schema=DOC_RESULT_SCHEMA)


def triples_table(processed: DataFrame) -> DataFrame:
    """Explode per-doc triple arrays into the corpus-wide triples table.

    The UDF returns seven parallel flat arrays; zipping them into structs
    and exploding happens here, JVM-side (one generate node, no Python).
    """
    t = (
        processed
        .filter(F.col("ok") & (F.col("n_triples") > 0))
        .select("repo", "path", "commit", "doc_sha",
                F.explode(F.arrays_zip(
                    "t_subj", "t_pred", "t_obj", "t_is_iri",
                    "t_dt", "t_lang", "t_graph")).alias("t"))
    )
    return t.select(
        F.col("t.t_subj").alias("subj"),
        F.col("t.t_pred").alias("pred"),
        F.col("t.t_obj").alias("obj"),
        F.col("t.t_is_iri").alias("obj_is_iri"),
        F.col("t.t_dt").alias("obj_datatype"),
        F.col("t.t_lang").alias("obj_lang"),
        F.col("t.t_graph").alias("graph"),
        "repo", "path", "commit", "doc_sha",
    )


def corpus_metrics(processed: DataFrame) -> DataFrame:
    """Per-repo verification metrics (partial aggregation is automatic)."""
    return (
        processed
        .groupBy("repo")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.col("ok").cast("long")).alias("ok_docs"),
            F.sum(F.coalesce(F.col("roundtrip_ok").cast("long"), F.lit(0)))
            .alias("roundtrip_ok_docs"),
            F.sum("n_triples").alias("triples"),
            F.sum(F.coalesce(F.col("cbor_len"), F.lit(0)).cast("long")).alias("cbor_bytes"),
            F.sum(F.col("json_len").cast("long")).alias("json_bytes"),
        )
        .orderBy("repo")
    )
