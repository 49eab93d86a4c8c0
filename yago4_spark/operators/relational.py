"""Relational micro-operators the pipeline composes (SURVEY.md §2.3-2.5):
priority union, maxCount group filter, deterministic first-value, and
salted two-phase aggregation for skewed hub keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def priority_union(frames: list[DataFrame], key: str) -> DataFrame:
    """First-source-wins union: rows from ``frames[i]`` are kept only for
    keys absent from all earlier frames.

    Replaces the reference's sequential 'filter out already-mapped keys'
    chain for the 4-priority URI mapping (src/plan.rs:296-379). Plain
    union+dropDuplicates would be order-unstable under shuffles; a
    priority column + row_number window is deterministic, and — unlike N
    chained anti-joins — is a single shuffle on ``key``.
    """
    tagged = [
        df.withColumn("_prio", F.lit(i)) for i, df in enumerate(frames)
    ]
    allf = tagged[0]
    for df in tagged[1:]:
        allf = allf.unionByName(df)
    # value columns break ties WITHIN a priority tier (a key duplicated
    # inside one frame would otherwise pick nondeterministically)
    value_cols = [c for c in allf.columns if c not in (key, "_prio")]
    w = Window.partitionBy(key).orderBy("_prio", *value_cols)
    return (
        allf.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_prio")
    )


def max_count_filter(df: DataFrame, key_cols: list[str], max_count: int) -> DataFrame:
    """SHACL sh:maxCount semantics: if a key has MORE than ``max_count``
    rows, drop ALL of them (not top-k — the whole group is discarded,
    src/plan.rs:1141-1163).

    A window count avoids the groupBy+join-back double shuffle.
    """
    w = Window.partitionBy(*key_cols)
    return (
        df.withColumn("_cnt", F.count(F.lit(1)).over(w))
        .where(F.col("_cnt") <= max_count)
        .drop("_cnt")
    )


def first_value(df: DataFrame, key_cols: list[str], order_col: Column) -> DataFrame:
    """Deterministic one-row-per-key pick (min by ``order_col``) —
    replaces the reference's RocksDB-order .next() (src/partitioned_statements.rs:63-70)."""
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def salted_count(
    df: DataFrame, key_cols: list[str], salt_buckets: int = 64
) -> DataFrame:
    """Two-phase (salted) count per key — the skew-safe groupBy the north
    rule requires for hub entities (Q5-scale keys with 10^7+ rows would
    otherwise pin one reducer).

    Phase 1 groups by (key, salt) — hub keys fan out over
    ``salt_buckets`` reducers; phase 2 sums the per-salt partials. For a
    COUNT this matches Spark's own partial aggregation, but phase 1's
    output *stays salted* for callers that join more work against it
    before the final combine; it also generalizes to aggregates where
    map-side combine alone is insufficient (e.g. collect_list of hub
    values).
    Returns columns: key_cols + ``count``.
    """
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.count(F.lit(1)).alias("_partial")
    )
    return partial.groupBy(*key_cols).agg(F.sum("_partial").alias("count"))


def instance_count_at_least(
    instance_of: DataFrame,
    min_instances: int,
    class_col: str = "cls",
    salt_buckets: int = 64,
) -> DataFrame:
    """Classes with >= min_instances direct instances
    (src/plan.rs:447-450,513-518, threshold :61). P31 is the skew hub —
    salted two-phase count."""
    counts = salted_count(instance_of.select(class_col), [class_col], salt_buckets)
    return counts.where(F.col("count") >= min_instances).select(class_col)
