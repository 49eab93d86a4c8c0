"""Timed full-pipeline run on the mini fixture with the REAL reference
config (262+6 NodeShapes) — the wall-clock probe for the facts-pipeline
branch-grouping work (VERDICT r01 item 2).

Usage: python scripts/full_config_run.py [workdir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

from yago4_spark.fixtures import write_mini_wikidata
from yago4_spark.pipeline import run_pipeline
from yago4_spark.plans.ttl import load_schema
from yago4_spark.session import get_spark

REF = "/root/reference/src/data"
FILES = ["schema.ttl", "shapes.ttl", "bioschemas.ttl", "shapes-bio.ttl"]


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="fullcfg-")
    shutil.rmtree(base, ignore_errors=True)
    spark = get_spark(app_name="full-config-run")
    schema = load_schema([f"{REF}/{f}" for f in FILES], min_instances=2)
    print(f"config: {len(schema.node_shapes)} node shapes, "
          f"{len(schema.property_shapes)} property shapes")
    write_mini_wikidata(spark, f"{base}/statements")
    t0 = time.time()
    res = run_pipeline(spark, f"{base}/statements", f"{base}/work", schema)
    counts = {name: df.count() for name, df in res.outputs.items()}
    dt = time.time() - t0
    print(f"pipeline wall: {dt:.1f}s")
    for name, n in counts.items():
        print(f"  {name}: {n}")
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
