"""CLI — the analog of the reference's two subcommands
(src/main.rs:27-65) plus the graft's document front-end:

    # ingest an N-Triples dump into the predicate-partitioned store
    spark-submit --py-files yago4_spark.zip -m yago4_spark partition \
        -f dump.nt.gz -c work/statements

    # run the full build
    spark-submit --py-files yago4_spark.zip -m yago4_spark build \
        -c work/statements -o out/ --size full [--shapes shapes.ttl]

    # link documents (Iceberg/parquet interleaved docs -> mentions)
    ... -m yago4_spark link -d docs.parquet -q dict.parquet -o out/

Local usage: python -m yago4_spark <cmd> ...
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="yago4_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("partition", help="ingest N-Triples into the statements store")
    pp.add_argument("-f", "--file", required=True)
    pp.add_argument("-c", "--cache", required=True, help="statements table path")

    pb = sub.add_parser("build", help="run the full KG build")
    pb.add_argument("-c", "--cache", required=True)
    pb.add_argument("-o", "--out", required=True)
    pb.add_argument("--size", choices=["full", "all-wikis", "en-wiki"],
                    default="full")
    pb.add_argument("--shapes", action="append",
                    help="Turtle config file; repeat for multi-file configs "
                         "(ontology first, e.g. --shapes schema.ttl --shapes "
                         "shapes.ttl). Default: sample schema")
    pb.add_argument("--min-instances", type=int, default=None)
    pb.add_argument("--work", help="stage/checkpoint dir (default: <out>/work)")

    pl = sub.add_parser("link", help="extract+link mentions from interleaved documents")
    pl.add_argument("-d", "--documents", required=True)
    pl.add_argument("-q", "--dictionary", required=True)
    pl.add_argument("-o", "--out", required=True)

    args = p.parse_args(argv)

    from .session import get_spark

    spark = get_spark(app_name=f"yago4-spark-{args.cmd}")

    if args.cmd == "partition":
        from .sources.ntriples import read_ntriples
        from .sources.statements import StatementsTable

        df = read_ntriples(spark, args.file)
        StatementsTable.write(df, args.cache)
        n = spark.read.parquet(args.cache).count()
        print(f"loaded {n} statements into {args.cache}")

    elif args.cmd == "build":
        from .pipeline import run_pipeline
        from .plans.shapes import sample_schema
        from .plans.uri_mapping import YagoSize

        if args.shapes:
            from .plans.ttl import load_schema

            schema = load_schema(args.shapes)
            if args.min_instances is not None:
                schema.min_instances = args.min_instances
        else:
            schema = sample_schema(args.min_instances or 10)
        size = {s.value: s for s in YagoSize}[args.size]
        res = run_pipeline(
            spark, args.cache, args.work or f"{args.out}/work", schema,
            size=size, export_nt_dir=args.out,
        )
        for m in res.catalog.metrics():
            print(f"{m['stage']:24s} rows={m['rows']:>10d} wall={m['wall_s']}s")

    elif args.cmd == "link":
        from .operators.linking import extract_and_link

        docs = spark.read.parquet(args.documents)
        dic = spark.read.parquet(args.dictionary)
        mentions = extract_and_link(docs, dic)
        mentions.write.mode("overwrite").parquet(args.out)
        print(f"wrote {spark.read.parquet(args.out).count()} mentions to {args.out}")

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
