"""Streaming document ingestion and windowed aggregation.

The reference has no streaming at all (SURVEY §2.10); a 10^12-document
pipeline ingests continuously, so the graft adds:

- ``stream_documents``: file-source stream of interleaved-document
  parquet drops (the Iceberg-landing-zone pattern); schema enforced.
- ``streaming_mentions``: the SAME candidate-generation + broadcast
  dictionary join as batch — stateless, so it runs unchanged on a
  stream (one logical plan, two execution modes).
- ``tumbling_mention_counts``: per-entity counts in tumbling event-time
  windows with a watermark for late data.
- ``tumbling_event_stats``: the events-table analog (counts + sums per
  window and type).

Stateful custom operators (session windows etc.) would use
``applyInPandasWithState``; not needed by any reference behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.documents import DOCUMENTS_SCHEMA


def stream_documents(spark: SparkSession, path: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def streaming_mentions(docs_stream: DataFrame, dictionary: DataFrame,
                       max_ngram: int = 3) -> DataFrame:
    """Stateless mention extraction on a stream — reuses the batch
    operator plan (explode + broadcast join are stream-safe)."""
    from ..operators.linking import candidate_mentions
    from ..sources.documents import exploded_text_spans

    return candidate_mentions(
        exploded_text_spans(docs_stream), dictionary, max_ngram
    )


def tumbling_mention_counts(mentions: DataFrame, ts_col: str = "event_time",
                            window: str = "10 minutes",
                            watermark: str = "30 minutes") -> DataFrame:
    """Per-entity mention counts in tumbling event-time windows; late
    rows beyond the watermark are dropped (deterministic under replay)."""
    return (
        mentions.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), "qid")
        .agg(F.count(F.lit(1)).alias("mention_count"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "qid", "mention_count",
        )
    )


def tumbling_event_stats(events: DataFrame, window: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type",
            "n_events", "sum_value",
        )
    )


def run_to_completion(stream_df: DataFrame, checkpoint_dir: str,
                      out_path: str, fmt: str = "parquet",
                      output_mode: str = "append") -> None:
    """Drain all available input (Trigger.AvailableNow) — the replay /
    backfill mode; exactly-once via the checkpoint."""
    q = (
        stream_df.writeStream.format(fmt)
        .option("checkpointLocation", checkpoint_dir)
        .option("path", out_path)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
