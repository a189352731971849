"""Watermarked windowed aggregation over the streaming corpus.

The remaining streaming primitive from SURVEY §2B's category list:
event-time tumbling windows with a watermark bounding late data (and
thereby the aggregation state).  Use case: per-window ingest-health
rollups (rows, JSON-LD candidates, bytes per repo) over a continuously
growing corpus whose push events arrive out of order.

Semantics (standard Structured Streaming):

* rows arriving later than ``watermark`` behind the max seen event time
  are dropped; a window's aggregate is finalized and emitted exactly
  once when the watermark passes its end (append mode), so state is
  bounded by (watermark / window) open windows per key regardless of
  stream length.
* the aggregation itself is a plain groupBy(window, repo) — partial
  aggregation and state-store management come from the engine; the
  JSON-LD candidate predicate is the same JVM-side ``jsonld_sniff``
  used by the batch pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_ingest_health(repos: DataFrame, event_time_col: str = "event_ts",
                           window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """Event-timed repos stream -> per-(window, repo) ingest counters.

    Append-mode compatible: a row emits once its window is older than
    the watermark; later-than-watermark input rows are dropped.
    """
    from cbor_ld_spark.functions.udfs import jsonld_sniff

    return (
        repos
        .withWatermark(event_time_col, watermark)
        .groupBy(F.window(F.col(event_time_col), window).alias("win"),
                 F.col("repo"))
        .agg(F.count(F.lit(1)).alias("rows"),
             F.sum(jsonld_sniff(F.col("lang")).cast("long"))
             .alias("jsonld_candidates"),
             F.sum(F.length("content").cast("long")).alias("bytes"))
        .select(F.col("win.start").alias("window_start"),
                F.col("win.end").alias("window_end"),
                "repo", "rows", "jsonld_candidates", "bytes")
    )


def stream_windowed_health(spark, input_dir: str, out_dir: str,
                           checkpoint_dir: str,
                           window: str = "1 hour",
                           watermark: str = "2 hours",
                           available_now: bool = True):
    """File-stream repos (+ ``event_ts`` timestamp) -> windowed health.

    Append output mode + streaming checkpoint: each finalized window row
    is written exactly once across restarts.
    """
    schema = ("repo string, path string, commit string, lang string, "
              "content string, event_ts timestamp")
    stream = (spark.readStream.schema(schema).format("parquet")
              .load(input_dir))
    agg = windowed_ingest_health(stream, "event_ts", window, watermark)
    q = (agg.writeStream
         .format("parquet")
         .outputMode("append")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir))
    if available_now:
        q = q.trigger(availableNow=True)
    return q.start()
