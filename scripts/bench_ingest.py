"""N-Triples ingest throughput: JVM fast-path hybrid vs the all-Python
parse (VERDICT r01 item 5). Generates a synthetic Wikidata-shaped corpus
(~typical line mix: entity triples, labels with lang tags, typed
literals, a few % escaped lines) and times full materialization.

Usage: python scripts/bench_ingest.py [n_lines]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from yago4_spark import terms
from yago4_spark.session import get_spark
from yago4_spark.sources.ntriples import PARSED_SCHEMA, read_ntriples

WD = "http://www.wikidata.org/entity/"
WDT = "http://www.wikidata.org/prop/direct/"
XSD = "http://www.w3.org/2001/XMLSchema#"


def gen_corpus(path: str, n: int) -> None:
    with open(path, "w") as f:
        for i in range(n):
            k = i % 10
            if k < 4:
                f.write(f"<{WD}Q{i}> <{WDT}P31> <{WD}Q{i % 97}> .\n")
            elif k < 6:
                f.write(f'<{WD}Q{i}> <http://www.w3.org/2004/02/skos/core#prefLabel> "Entity number {i}"@en .\n')
            elif k < 8:
                f.write(f'<{WD}Q{i}> <{WDT}P1082> "{i * 13 % 100000}"^^<{XSD}integer> .\n')
            elif k < 9:
                f.write(f'<{WD}Q{i}> <{WDT}P625> "{i % 90}.{i % 1000}"^^<{XSD}decimal> .\n')
            else:
                # ~10% escaped lines exercise the Python fallback
                f.write(f'<{WD}Q{i}> <{WDT}P1448> "name \\"{i}\\"\\n"@fr .\n')


def python_only_parse(spark, path, seed=""):
    """The round-1 ingest: every line through the per-row Python parser."""
    import pandas as pd

    lines = spark.read.text(path)

    def parse(batches):
        for pdf in batches:
            rows = [t for t in (terms.parse_nt_line(ln, seed)
                                for ln in pdf["value"]) if t is not None]
            yield pd.DataFrame(rows, columns=["subject", "predicate", "object"])

    parsed = lines.mapInPandas(parse, PARSED_SCHEMA)
    return parsed.withColumn(
        "predicate_key", terms.predicate_key_col(F.col("predicate")))


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    path = "/tmp/ingest_bench.nt"
    if not os.path.exists(path) or os.path.getsize(path) == 0:
        gen_corpus(path, n)
    spark = get_spark(app_name="ingest-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # single text file → repartition for parallelism (memory note: 1-file
    # inputs give parallelism 1-2)
    # JVM/py-worker warmup so variant order doesn't bias the numbers
    force(python_only_parse(spark, path).limit(1000))
    force(read_ntriples(spark, path).limit(1000))
    results = {}
    for name, fn in [("arrow_kernel", read_ntriples),
                     ("python_only", python_only_parse)]:
        best = min(
            _timed(lambda: force(fn(spark, path))) for _ in range(2)
        )
        results[name] = best
        print(f"{name}: {best:.1f}s  ({n / best:,.0f} lines/s)")
    print(f"speedup: {results['python_only'] / results['arrow_kernel']:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
