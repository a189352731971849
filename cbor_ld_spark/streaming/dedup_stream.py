"""Streaming exact dedup: keep-first over a continuously-growing corpus.

The batch tier (operators/dedup.exact_duplicates) answers "what are the
duplicate groups"; a training-data *ingest* pipeline instead needs
"emit each distinct document once, ever" while the corpus keeps
arriving.  Structured Streaming's ``dropDuplicates`` keeps the seen-key
set in the state store (RocksDB/HDFS-backed at scale, checkpoint dir in
local mode), so the dedup survives restarts exactly-once.

Two modes:

* ``stream_dedup_keep_first(..., within=None)`` — global dedup: state
  grows with distinct keys.  At 100 TB that state is the honest cost of
  exact global dedup; the key is a 32-char md5, so state is ~50 B/doc —
  1e9 distinct docs ≈ 50 GB spread across the state store, which
  RocksDB handles (or bound it with ``within``).
* ``within="7 days"`` — watermarked dedup (``dropDuplicatesWithinWatermark``):
  state is bounded to the watermark horizon, the standard
  cost/completeness dial when late duplicates beyond the horizon are
  acceptable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.text import _norm


def stream_dedup_keep_first(stream: DataFrame, out_dir: str, ckpt: str,
                            within: str | None = None,
                            ts_col: str = "ts"):
    """Append-mode stream of first-seen documents by content hash.

    ``stream`` must carry (doc_id, text[, ts]).  Returns the started
    query (``trigger(availableNow=True)`` so tests/ingest jobs drain
    hermetically; a production deployment would use a processing-time
    trigger instead).
    """
    hashed = stream.withColumn("content_hash", F.md5(_norm(F.col("text"))))
    if within is not None:
        deduped = (hashed.withWatermark(ts_col, within)
                   .dropDuplicatesWithinWatermark(["content_hash"]))
    else:
        deduped = hashed.dropDuplicates(["content_hash"])
    return (deduped
            .writeStream
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())
