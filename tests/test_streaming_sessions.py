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
    # row_number (not monotonically_increasing_id, whose high bits encode
    # the partition index) so buckets stay dense under any partitioning
    from pyspark.sql import Window

    ordered = events.withColumn(
        "_b", ((F.row_number().over(Window.orderBy("ts")) - 1)
               * 4 / n).cast("int"))
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


def test_stream_sessions_restart_exactly_once(spark, tmp_path):
    """Kill-and-restart mid-stream (VERDICT r4 item 7): the checkpoint
    contract the 100 TB ingest depends on. A 10×-larger corpus (sf0.01
    events) is staged as time-ordered files; run 1 (AvailableNow)
    processes the first half and terminates — the 'kill' point, with
    open per-user sessions living ONLY in the state store. Run 2 reuses
    the same checkpoint over the full corpus plus a far-future sentinel
    event that pushes the watermark past every real session. Asserts:
    no session is emitted twice across the two runs (exactly-once), and
    the union of emissions equals the batch twin BYTE-FOR-BYTE
    including sum_value — i.e. sessions spanning the kill point were
    recovered from state, not recomputed or duplicated."""
    events = (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    batch = {
        (r["user_id"], r["session_start"], r["session_end"],
         r["n_events"], r["sum_value"])
        for r in sessionize_events(events, GAP_MIN).collect()
    }
    assert batch

    src = str(tmp_path / "restart_in")
    n = events.count()
    n_files = 10
    from pyspark.sql import Window

    ordered = events.withColumn(
        "_b", ((F.row_number().over(Window.orderBy("ts")) - 1)
               * n_files / n).cast("int"))
    for b in range(n_files // 2):
        (ordered.where(F.col("_b") == b).drop("_b")
         .coalesce(1).write.mode("append").parquet(src))

    def run_stream():
        stream = spark.readStream.schema(events.schema).option(
            "maxFilesPerTrigger", 1).parquet(src)
        q = (
            sessionize_events_stream(stream, GAP_MIN, WATERMARK)
            .writeStream.format("parquet")
            .option("checkpointLocation", str(tmp_path / "restart_ckpt"))
            .option("path", str(tmp_path / "restart_out"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.schema(
            "user_id long, session_start timestamp, "
            "session_end timestamp, n_events long, sum_value double"
        ).parquet(str(tmp_path / "restart_out"))

    phase1 = run_stream().collect()  # terminates = the kill point
    assert phase1  # some sessions closed before the kill

    # second half + a far-future sentinel (synthetic user) that drags
    # the watermark past last_real_session_end + gap, so every REAL
    # session times out; the sentinel's own session stays open forever
    for b in range(n_files // 2, n_files):
        (ordered.where(F.col("_b") == b).drop("_b")
         .coalesce(1).write.mode("append").parquet(src))
    (events.limit(1)
     .withColumn("user_id", F.lit(-999).cast(events.schema["user_id"].dataType))
     .withColumn("ts", F.expr("timestamp'2099-01-01 00:00:00'"))
     .coalesce(1).write.mode("append").parquet(src))

    all_rows = run_stream().collect()
    tup = lambda r: (r["user_id"], r["session_start"], r["session_end"],
                     r["n_events"], r["sum_value"])
    # exactly-once: the sink holds no duplicate session rows
    assert len(all_rows) == len({tup(r) for r in all_rows})
    # run 2 did not re-emit run-1 rows (append-only growth)
    assert len(all_rows) > len(phase1)
    got = {tup(r) for r in all_rows}
    assert got == batch, (
        f"missing={sorted(batch - got)[:3]} extra={sorted(got - batch)[:3]}")
