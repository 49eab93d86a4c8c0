"""Timed full-pipeline run on the mini fixture with the REAL reference
config (262+6 NodeShapes) — the wall-clock probe for the facts-pipeline
branch-grouping work (VERDICT r01 item 2) and, with ``--bucketed``, the
bucketed-statements-store wiring (VERDICT r02 item 4): the same pipeline
over a write_bucketed store, reporting the Exchange-count drop on the
facts plan.

Usage: python scripts/full_config_run.py [workdir] [--bucketed]
       [--large N]   # use the fixtures_large N-entity slice instead of
                     # the mini fixture — the volume probe for the
                     # bucketed store (ROADMAP r3 #5)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yago4_spark.fixtures import mini_wikidata_df, write_mini_wikidata
from yago4_spark.pipeline import run_pipeline
from yago4_spark.plans.ttl import load_schema
from yago4_spark.session import get_spark
from yago4_spark.sources.statements import StatementsTable

REF = "/root/reference/src/data"
FILES = ["schema.ttl", "shapes.ttl", "bioschemas.ttl", "shapes-bio.ttl"]


def exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def main() -> None:
    argv = sys.argv[1:]
    large_n = 0
    if "--large" in argv:
        i = argv.index("--large")
        large_n = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if not a.startswith("--")]
    bucketed = "--bucketed" in argv
    base = args[0] if args else tempfile.mkdtemp(prefix="fullcfg-")
    shutil.rmtree(base, ignore_errors=True)
    spark = get_spark(app_name="full-config-run")
    schema = load_schema([f"{REF}/{f}" for f in FILES], min_instances=2)
    print(f"config: {len(schema.node_shapes)} node shapes, "
          f"{len(schema.property_shapes)} property shapes")
    if large_n:
        from yago4_spark.fixtures_large import generate, statements_df
        t0 = time.time()
        gt = generate(n_entities=large_n,
                      n_classes=max(large_n // 125, 50), schema=schema)
        src_df = statements_df(spark, gt)
        StatementsTable.write(src_df, f"{base}/statements")
        print(f"large fixture ({large_n} entities): {time.time() - t0:.1f}s")
    else:
        write_mini_wikidata(spark, f"{base}/statements")
        src_df = mini_wikidata_df(spark)
    st = None
    if bucketed:
        table = "stmts_bucketed_fullcfg"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{wh}/{table}", ignore_errors=True)
        t0 = time.time()
        StatementsTable.write_bucketed(src_df, table,
                                       n_buckets=32 if large_n else 8)
        print(f"bucketed store build: {time.time() - t0:.1f}s "
              "(the shuffle paid once at load)")
        st = StatementsTable.from_table(spark, table)
    t0 = time.time()
    res = run_pipeline(spark, f"{base}/statements", f"{base}/work", schema,
                       statements=st)
    counts = {name: df.count() for name, df in res.outputs.items()}
    dt = time.time() - t0
    print(f"pipeline wall: {dt:.1f}s (store: "
          f"{'bucketed' if bucketed else 'plain'})")
    # Exchange count of the LIVE facts plan (the catalog copy is already
    # materialized — its plan is just a parquet scan)
    from yago4_spark.pipeline import LABEL_PROPERTIES
    from yago4_spark.plans.facts import build_facts

    live_st = st if st is not None else StatementsTable(
        spark, f"{base}/statements")
    live = build_facts(
        spark, live_st, schema, res.catalog.read("shape_instances"),
        res.catalog.read("uri_mapping"), exclude_properties=LABEL_PROPERTIES)
    print(f"facts-plan exchanges: {exchanges(live.facts)}")
    for name, n in counts.items():
        print(f"  {name}: {n}")
    if bucketed:
        spark.sql("DROP TABLE IF EXISTS stmts_bucketed_fullcfg")
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
