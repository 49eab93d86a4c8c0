"""Stateful streaming sessionization (applyInPandasWithState, event-time
timeouts) vs the batch gaps-and-islands twin: every emitted session must
match the batch result exactly, and every session old enough for the
final watermark must have been emitted."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yago4_spark.streaming.sessions import (
    sessionize_events,
    sessionize_events_stream,
)

GAP_MIN = 60
WATERMARK = "30 minutes"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def test_stream_sessions_match_batch(spark, tmp_path, events):
    # batch twin = ground truth
    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_events(events, GAP_MIN).collect()
    }
    assert batch

    # stage the stream as 4 time-ordered files → 4 micro-batches, so the
    # watermark advances and event-time timeouts actually fire
    src = str(tmp_path / "sess_in")
    n = events.count()
    ordered = events.orderBy("ts").withColumn(
        "_b", (F.monotonically_increasing_id() * 4 / n).cast("int"))
    for b in range(4):
        (ordered.where(F.col("_b") == b).drop("_b")
         .coalesce(1).write.mode("append").parquet(src))
    ts_rows = ordered.groupBy("_b").agg(F.max("ts").alias("mx")).collect()
    # watermark after the last batch ≈ max ts of batch 2 minus the delay
    wm_source = max(r["mx"] for r in ts_rows if r["_b"] <= 2)

    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", 1).parquet(src)
    out = str(tmp_path / "sess_out")
    q = (
        sessionize_events_stream(stream, GAP_MIN, WATERMARK)
        .writeStream.format("parquet")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .option("path", out)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got_rows = spark.read.schema(
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, sum_value double").parquet(out).collect()
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in got_rows
    }
    # no invented sessions
    assert got <= batch, sorted(got - batch)[:3]
    # everything the watermark had definitely closed must be out
    import datetime

    wm = wm_source - datetime.timedelta(minutes=30)
    must_emit = {
        s for s in batch
        if s[2] + datetime.timedelta(minutes=GAP_MIN) < wm
    }
    assert must_emit <= got, sorted(must_emit - got)[:3]
    assert got  # something actually closed
