"""Session windows — the custom stateful streaming operator.

Two implementations with identical semantics:

- ``sessionize_events`` (batch): classic gaps-and-islands — a lag
  window marks session starts, a running sum numbers sessions, one
  aggregation folds them. SQL-expressible, so it doubles as the DuckDB
  oracle twin for the driver contract.
- ``sessionize_events_stream`` (streaming): ``applyInPandasWithState``
  with event-time timeouts — per-user open-session state, sessions
  emitted when the gap is exceeded within a batch or when the watermark
  passes ``last_event + gap`` (timeout). Late rows beyond the watermark
  are dropped by the engine, so replays are deterministic.

A session = consecutive events of one user with inter-event gaps
< ``gap``; emitted as (user_id, session_start, session_end, n_events,
sum_value).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)
from pyspark.sql.window import Window

SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
])

_STATE_SCHEMA = StructType([
    StructField("session_start", TimestampType()),
    StructField("last_ts", TimestampType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
])


def sessionize_events(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization (the oracle-checkable twin)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr(f"INTERVAL {gap_minutes * 60} SECONDS")
    new_session = F.when(
        F.lag("ts").over(w).isNull()
        | (F.col("ts") > F.lag("ts").over(w) + gap),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        events.withColumn("_new", new_session)
        .withColumn("_sess", F.sum("_new").over(run))
        .groupBy("user_id", "_sess")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .drop("_sess")
    )


def _session_fn(gap_minutes: int):
    gap_s = gap_minutes * 60

    def fn(key: Tuple[Any], pdf_iter: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.hasTimedOut:
            start, last, n, s = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, start, last, n, round(s, 2))],
                columns=SESSION_SCHEMA.fieldNames())
            return
        rows = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
        if state.exists:
            start, last, n, s = state.get
        else:
            start = last = None
            n, s = 0, 0.0
        closed = []
        for ts, val in zip(rows["ts"], rows["value"]):
            if last is not None and (ts - last).total_seconds() > gap_s:
                closed.append((user_id, start, last, n, round(s, 2)))
                start, n, s = None, 0, 0.0
            if start is None:
                start = ts
            last = ts
            n += 1
            s += float(val)
        state.update((start, last, n, s))
        # close via event-time timeout once the watermark passes the gap
        state.setTimeoutTimestamp(
            int(last.timestamp() * 1000) + gap_s * 1000)
        if closed:
            yield pd.DataFrame(closed, columns=SESSION_SCHEMA.fieldNames())

    return fn


def sessionize_events_stream(events_stream: DataFrame,
                             gap_minutes: int = 30,
                             watermark: str = "1 hour") -> DataFrame:
    """Stateful streaming sessionization (applyInPandasWithState with
    event-time timeouts). Emits each session exactly once."""
    return (
        events_stream
        # watermarks require TIMESTAMP (parquet often carries NTZ)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_minutes),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
