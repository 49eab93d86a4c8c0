"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "total_bench_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1, "docs_per_sec": M, ...}

Each query is forced end-to-end with the noop sink (full materialization,
no driver collect bottleneck). ``docs_per_sec`` measures the graft's
document front-end (span wrap → mention candidates → linking) — the
throughput axis the north rule grades.

Trial protocol: every query runs $SPARK_GRAFT_TRIALS times (default 3);
the reported number is the MIN, with all trials in "spread". A single
timed run on this VM is dominated by hypervisor steal (round-2 showed a
40% spread between two runs of identical code); min-of-N recovers the
machine-limited time. "value" is the sum of per-query mins; "wall_sec"
is the actual elapsed time including repeat trials.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from yago4_spark.session import get_spark

HEADLINE = [
    "lineitem_scan",
    "revenue_by_nation",
    "customers_min_orders",
    "orders_maxcount_filter",
    "top_orders_per_customer",
    "events_hourly",
    "events_sessions",
    "closure_custkey_tree",
    "doc_text_stats",
    "doc_lang_id",
    "doc_quality",
    "doc_simhash",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "embedding_near_dup",
    "mention_candidates",
]


def force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark(
        app_name="yago4-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # pre-generate the NT ingest corpus + warm the Arrow workers OUTSIDE
    # the timed window
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                     "scripts"))
    from bench_ingest import gen_corpus
    from yago4_spark.sources.ntriples import read_ntriples

    nt_path = "/tmp/bench_ingest_2m.nt"
    n_lines = 2_000_000
    if not os.path.exists(nt_path) or os.path.getsize(nt_path) == 0:
        gen_corpus(nt_path, n_lines)
    force(read_ntriples(spark, nt_path).limit(1000))

    qs = entry_mod.queries()
    trials_n = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))
    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    t_total0 = time.time()
    from yago4_spark.operators.cache import release_all

    def timed(name: str, run) -> float:
        ts = []
        for _ in range(trials_n):
            t0 = time.time()
            run()
            ts.append(time.time() - t0)
            release_all()  # each trial is a cold full execution
        timings[name] = round(min(ts), 3)
        spreads[name] = [round(x, 3) for x in ts]
        return min(ts)

    for name in HEADLINE:
        timed(name, lambda name=name: force(qs[name](spark, sf_dir)))

    # NT ingest throughput (Arrow RE2 kernel): 2M synthetic dump lines
    ingest_sec = timed("nt_ingest_2m",
                       lambda: force(read_ntriples(spark, nt_path)))

    # graft front-end throughput: documents → candidates → linked mentions
    from yago4_spark.operators.linking import candidate_mentions, link_entities

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    spans = entry_mod._text_spans(spark, sf_dir)
    link_sec = timed("linking_pipeline", lambda: force(
        link_entities(candidate_mentions(spans, entry_mod._dict_df(spark)))))

    wall = round(time.time() - t_total0, 3)
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spreads,
        "trials": trials_n,
        "wall_sec": wall,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "sf": sf,
        "docs_per_sec": round(n_docs / link_sec, 1),
        "ingest_lines_per_sec": round(n_lines / ingest_sec, 1),
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
