"""Training-data curation operators: deterministic sampling + shard packing.

Two staples of a large-scale training-data pipeline that sit between
dedup/quality-scoring and the trainer:

* ``stratified_sample`` — per-stratum rate sampling that is a pure
  function of the row key (``xxhash64(doc_id, salt)``), NOT ``rand()``:
  retries, resumes, and re-runs keep the exact same sample, and no
  state (seeds per partition, offsets) needs to be carried.  Zero
  shuffle — a scan-side filter that combines with predicate pushdown.
* ``pack_shards`` — assign documents (in stable doc_id order) to
  training shards capped at ~``shard_tokens`` tokens.  A naive global
  ``sum() OVER (ORDER BY doc_id)`` window moves the whole corpus to ONE
  partition; instead: range-partition by doc_id (global order across
  partitions), per-partition running sums, then add the per-partition
  token offsets (a tiny driver-side list) — the zipWithIndex shape,
  fully parallel, same technique as text.term_dictionary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import _norm

SAMPLE_MOD = 10_000  # rates are per-10k for integer-exact semantics


def stratified_sample(docs: DataFrame, rates: dict[str, int],
                      salt: int = 7) -> DataFrame:
    """Keep a doc iff ``pmod(xxhash64(doc_id, salt), 10000) < rates[lang]``.

    ``rates`` maps stratum (lang) -> keep-rate per 10,000; missing
    strata default to 0 (dropped).  Deterministic per doc_id: the same
    corpus always yields the same sample, independent of partitioning,
    retries, or cluster size — the property ``rand()``-based sampling
    loses on any retry (round-1 salted-join lesson).
    """
    rate_map = F.create_map(*[F.lit(x) for kv in rates.items() for x in kv])
    rate = F.coalesce(rate_map[F.col("lang")], F.lit(0))
    bucket = F.pmod(F.xxhash64(F.col("doc_id"), F.lit(salt)),
                    F.lit(SAMPLE_MOD))
    return (docs.filter(bucket < rate)
            .select("doc_id", "lang", bucket.cast("long").alias("bucket"))
            .orderBy("doc_id"))


def pack_shards(docs: DataFrame, shard_tokens: int = 2048,
                summary: bool = True) -> DataFrame:
    """Pack docs (doc_id order) into shards of ~``shard_tokens`` tokens.

    shard_id = floor(exclusive-prefix-sum(n_tokens) / shard_tokens):
    a document belongs to the shard its first token falls in, so shards
    hold contiguous doc ranges and every shard except the last spans at
    least ``shard_tokens`` tokens (documents are not split).

    Scale shape: range partition on doc_id + local window cumsum +
    driver-side per-partition offsets — no single-partition global
    window.  The offsets collect moves one number per partition.
    """
    per_doc = (
        docs.select("doc_id",
                    F.size(F.split(_norm(F.col("text")), " "))
                    .alias("n_tokens"))
        .repartitionByRange("doc_id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()  # offsets pass + final pass read it once
    )
    w = (Window.partitionBy("_pid").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    totals = {r["_pid"]: r["tok"] for r in
              per_doc.groupBy("_pid")
              .agg(F.sum("n_tokens").alias("tok")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    # Broadcast-joined (pid, offset) map instead of a coalesce(when...)
    # chain — the chain's O(n_partitions) expression tree won't codegen
    # at cluster partition counts (same shape as text.term_dictionary).
    off_df = docs.sparkSession.createDataFrame(
        [(pid, off) for pid, off in sorted(offsets.items())],
        "_off_pid int, _offset bigint")
    assigned = (
        per_doc
        .join(F.broadcast(off_df), per_doc["_pid"] == off_df["_off_pid"])
        .select(
            "doc_id", "n_tokens",
            F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")
                     + F.col("_offset"))
                    / shard_tokens).alias("shard_id")))
    if not summary:
        return assigned.orderBy("doc_id")
    return (
        assigned.groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_tokens").alias("total_tokens"),
             F.min("doc_id").alias("first_doc_id"),
             F.max("doc_id").alias("last_doc_id"))
        .orderBy("shard_id")
    )
