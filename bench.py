"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "total_bench_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1, "docs_per_sec": M, ...}

Each query is forced end-to-end with the noop sink (full materialization,
no driver collect bottleneck). ``docs_per_sec`` measures the graft's
document front-end (span wrap → mention candidates → linking) — the
throughput axis the north rule grades.
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
    "closure_custkey_tree",
    "doc_text_stats",
    "doc_lang_id",
    "doc_simhash",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
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
    timings: dict[str, float] = {}
    t_total0 = time.time()
    from yago4_spark.operators.cache import release_all

    for name in HEADLINE:
        t0 = time.time()
        force(qs[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)
        release_all()  # drop operator-internal persists between queries

    # NT ingest throughput (Arrow RE2 kernel): 2M synthetic dump lines
    t0 = time.time()
    force(read_ntriples(spark, nt_path))
    ingest_sec = time.time() - t0
    timings["nt_ingest_2m"] = round(ingest_sec, 3)

    # graft front-end throughput: documents → candidates → linked mentions
    from yago4_spark.operators.linking import candidate_mentions, link_entities

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    spans = entry_mod._text_spans(spark, sf_dir)
    t0 = time.time()
    force(link_entities(candidate_mentions(spans, entry_mod._dict_df(spark))))
    link_sec = time.time() - t0
    timings["linking_pipeline"] = round(link_sec, 3)

    total = round(time.time() - t_total0, 3)
    print(json.dumps({
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "docs_per_sec": round(n_docs / link_sec, 1),
        "ingest_lines_per_sec": round(n_lines / ingest_sec, 1),
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
