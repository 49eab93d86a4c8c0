"""Streaming tests: file-source document stream → stateless mention
extraction → parquet sink (AvailableNow); windowed aggregation with
watermark; exactly-once resume from checkpoint."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yago4_spark.sources.documents import (
    DOCUMENTS_SCHEMA,
    documents_df,
    qid_dictionary_df,
)
from yago4_spark.streaming.windows import (
    run_to_completion,
    stream_documents,
    streaming_mentions,
    tumbling_event_stats,
)


def test_streaming_mentions_matches_batch(spark, tmp_path):
    docs = documents_df(spark, n_docs=60)
    src = str(tmp_path / "in")
    docs.write.parquet(src)
    dic = qid_dictionary_df(spark)

    stream = streaming_mentions(stream_documents(spark, src), dic)
    out = str(tmp_path / "out")
    run_to_completion(stream, str(tmp_path / "ckpt"), out)
    got = spark.read.parquet(out)

    from yago4_spark.operators.linking import candidate_mentions
    from yago4_spark.sources.documents import exploded_text_spans

    want = candidate_mentions(exploded_text_spans(docs), dic)
    key = ["doc_id", "span_idx", "token_start", "ngram_len", "qid"]
    assert got.count() == want.count()
    assert got.select(key).subtract(want.select(key)).count() == 0

    # resume: draining again with the same checkpoint adds nothing
    run_to_completion(
        streaming_mentions(stream_documents(spark, src), dic),
        str(tmp_path / "ckpt"), out,
    )
    assert spark.read.parquet(out).count() == want.count()


def test_tumbling_event_stats_with_watermark(spark, tmp_path):
    rows = [
        ("2024-01-01 00:05:00", "click", 1.0),
        ("2024-01-01 00:25:00", "click", 2.0),
        ("2024-01-01 01:10:00", "view", 3.0),
    ]
    df = spark.createDataFrame(rows, "ts_s string, event_type string, value double") \
        .select(F.to_timestamp("ts_s").alias("ts"), "event_type", "value")
    src = str(tmp_path / "ev_in")
    df.write.parquet(src)
    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).parquet(src)
    agg = tumbling_event_stats(stream)
    out = str(tmp_path / "ev_out")
    q = (
        agg.writeStream.format("parquet")
        .option("checkpointLocation", str(tmp_path / "ev_ckpt"))
        .option("path", out)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # append mode only emits windows the watermark has closed; with a
    # bounded source nothing may close — assert the sink ran and the
    # query is well-formed rather than row contents
    got = spark.read.schema(
        "window_start timestamp, event_type string, n_events long, sum_value double"
    ).parquet(out)
    assert got.count() >= 0
    # complete-mode in-memory sink gives the actual windows
    q2 = (
        agg.writeStream.format("memory").queryName("evagg")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q2.awaitTermination()
    rows2 = {
        (str(r["window_start"]), r["event_type"], r["n_events"], r["sum_value"])
        for r in spark.sql("select * from evagg").collect()
    }
    assert ("2024-01-01 00:00:00", "click", 2, 3.0) in rows2
    assert ("2024-01-01 01:00:00", "view", 1, 3.0) in rows2
