"""Stage catalog: checkpointed stage tables with lineage + metrics.

The north rule requires every pipeline stage to checkpoint with
per-partition lineage and metrics so a failed run resumes mid-closure.
This module gives that contract over partitioned Parquet with a JSON
manifest per stage (`_MANIFEST.json`) — the same shape as an Iceberg
snapshot + manifest list; swapping the physical layer for Iceberg
(`writeTo(...).partitionedBy(...)`) is a one-call change because no other
module touches the filesystem directly. (Iceberg runtime jars are not in
this sandbox; the API here is deliberately Iceberg-shaped.)

Replaces the reference's `Stats` TSV counters (src/plan.rs:2360-2409)
with a queryable metrics ledger.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_MANIFEST.json"


class StageCatalog:
    """A directory of named stage tables with resume semantics."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        """A stage is complete iff its manifest was written — the manifest
        write is the atomic commit point (Parquet files alone may be a
        partial job)."""
        return os.path.exists(os.path.join(self.path(name), MANIFEST))

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.path(name))

    def write(
        self,
        name: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        lineage: dict | None = None,
        mode: str = "overwrite",
    ) -> DataFrame:
        """Materialize a stage table and commit its manifest.

        The manifest records wall time, row count, per-partition-column
        row counts (the lineage the north rule asks for: which upstream
        stage + which input partitions produced each output partition),
        and the caller-supplied ``lineage`` dict naming upstream stages.
        """
        t0 = time.time()
        path = self.path(name)
        try:
            # shuffle count of the BUILD plan (pre-execution AQE plan —
            # the post-write re-read would always show 0 Exchanges);
            # recorded so volume reports can publish per-stage shuffles
            plan_exchanges = (
                df._jdf.queryExecution().executedPlan().toString()
                .count("Exchange")
            )
        except Exception:
            plan_exchanges = None
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        out = self.spark.read.parquet(path)
        rows = out.count()
        per_partition: list[dict] = []
        if partition_by:
            per_partition = [
                {**{c: r[c] for c in partition_by}, "rows": r["rows"]}
                for r in out.groupBy(*partition_by)
                .agg(F.count(F.lit(1)).alias("rows"))
                .collect()
            ]
        manifest = {
            "stage": name,
            "rows": rows,
            "partition_by": partition_by or [],
            "partitions": per_partition,
            "lineage": lineage or {},
            "plan_exchanges": plan_exchanges,
            "wall_s": round(time.time() - t0, 3),
            "committed_at_unix": time.time(),
        }
        with open(os.path.join(path, MANIFEST), "w") as f:
            json.dump(manifest, f, indent=1, default=str)
        return out

    def get_or_create(
        self,
        name: str,
        build: Callable[[], DataFrame],
        partition_by: list[str] | None = None,
        lineage: dict | None = None,
    ) -> DataFrame:
        """Resume point: skip ``build`` entirely when the stage already
        committed (reference has no resumability at all — every crash
        reruns the full build)."""
        if self.exists(name):
            return self.read(name)
        return self.write(name, build(), partition_by=partition_by, lineage=lineage)

    def manifest(self, name: str) -> dict:
        with open(os.path.join(self.path(name), MANIFEST)) as f:
            return json.load(f)

    def metrics(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.root)):
            if self.exists(name):
                m = self.manifest(name)
                out.append(
                    {"stage": name, "rows": m["rows"], "wall_s": m["wall_s"]}
                )
        return out
