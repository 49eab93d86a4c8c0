"""SparkSession factory with the configuration the engine assumes.

Defaults are tuned for correctness-first local runs but every knob is the
one you would set on a 1000-executor cluster too: AQE on (runtime skew-join
+ partition coalescing), Arrow for all pandas-UDF traffic, UTC session
timezone (RDF dateTime literals are serialized lexically; never let Spark
shift them), and shuffle partitions sized by ``SPARK_GRAFT_CPUS``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "yago4-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    On a real cluster you pass ``--master`` to spark-submit and this
    function leaves it alone.
    """
    # Make the package importable inside Python workers (local mode
    # inherits the driver env; on a cluster spark-submit --py-files plays
    # this role). Must happen before the JVM/worker pool starts.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pypath = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + pypath if pypath else "")
        )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # allow shuffled-hash join where its size conditions hold
        # (guide §3.1/§9): sort-merge only wins when both sides must
        # spill-sort. No declared query's plan changes at bench scale
        # (verified: every join there is broadcast), but joins whose
        # small side outgrows the broadcast threshold at production SF
        # skip the per-partition sort. AQE skew-join handles both forms.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # verification harnesses collect whole output families for
        # set-compare (differential_report at 10M collects ~34M-row
        # families, > the 1g default); engine code itself never
        # collects anything data-sized
        .config("spark.driver.maxResultSize",
                os.environ.get("SPARK_GRAFT_MAX_RESULT", "4g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # The 4096-row default spill thresholds make WindowExec/SMJ spill
        # tiny buffers to disk constantly; at >8 concurrent tasks the
        # spill I/O contends and windows ANTI-scale (measured 6.5s@8c →
        # 14.9s@32c on a 30M-row row_number; 4.6s@32c with this raised).
        .config("spark.sql.windowExec.buffer.in.memory.threshold", "4194304")
        .config("spark.sql.windowExec.buffer.spill.threshold", "4194304")
        .config("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold", "4194304")
        .config("spark.sql.sortMergeJoinExec.buffer.spill.threshold", "4194304")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
