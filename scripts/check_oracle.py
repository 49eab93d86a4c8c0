"""Pre-flight replica of the driver's correctness gate: run every
``queries()`` entry in Spark AND its ``oracle_sql()`` twin in DuckDB at
sf0.01, compare row count + order-insensitive value hash.

Usage: python scripts/check_oracle.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry_mod
from yago4_spark.session import get_spark

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return ""
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return f"{v:.6f}".rstrip("0").rstrip(".")
    try:
        import datetime

        if isinstance(v, (datetime.date, datetime.datetime)):
            return v.isoformat()
    except Exception:
        pass
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name:28s} rows={len(srows):7d} (rows-only, no oracle) "
                  f"[{t_spark:.1f}s]")
            continue
        t0 = time.time()
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        t_duck = time.time() - t0
        ok_rows = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        sh = value_hash([tuple(r) for r in srows], scols)
        dh = value_hash(drows, dcols)
        ok_hash = sh == dh
        status = "OK " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(f"{status} {name:28s} rows={len(srows):7d}/{len(drows):<7d} "
              f"cols={'=' if ok_cols else 'DIFF'} hash={'=' if ok_hash else 'DIFF'} "
              f"[spark {t_spark:.1f}s, duck {t_duck:.2f}s]")
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print(f"     spark cols: {scols}\n     duck  cols: {dcols}")
            if ok_cols and not ok_hash:
                ss = sorted(
                    "\x1f".join(norm_cell(r[i]) for i in
                                sorted(range(len(scols)), key=lambda i: scols[i]))
                    for r in [tuple(x) for x in srows]
                )
                ds = sorted(
                    "\x1f".join(norm_cell(r[i]) for i in
                                sorted(range(len(dcols)), key=lambda i: dcols[i]))
                    for r in drows
                )
                sset, dset = set(ss), set(ds)
                print(f"     spark-only: {sorted(sset - dset)[:3]}")
                print(f"     duck-only : {sorted(dset - sset)[:3]}")
    print("\nFAILURES:", failures or "none")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
