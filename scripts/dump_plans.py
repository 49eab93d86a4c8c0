"""Dump .explain('formatted') for declared queries to plans/r06/<q>_<tag>.txt.

Usage: python scripts/dump_plans.py <tag> [query ...]   (default: all)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from yago4_spark.session import get_spark


def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump-plans", master="local[4]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    for name in (names or qs):
        try:
            plan = qs[name](spark, sf_dir)._sc._jvm.PythonSQLUtils.explainString(
                qs[name](spark, sf_dir)._jdf.queryExecution(), "formatted")
        except Exception:
            import io
            from contextlib import redirect_stdout
            buf = io.StringIO()
            with redirect_stdout(buf):
                qs[name](spark, sf_dir).explain("formatted")
            plan = buf.getvalue()
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print("wrote", name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
