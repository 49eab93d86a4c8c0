"""Run the 100k-entity statistical differential (fixtures_large.py
ground truth + Python oracle vs the full Spark pipeline) and append the
P/R report to BASELINE_RESULTS.md.

Usage: python scripts/differential_report.py [n_entities] [n_classes]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from yago4_spark import terms, vocab
from yago4_spark.fixtures_large import compute_oracle, generate, statements_df
from yago4_spark.pipeline import run_pipeline
from yago4_spark.session import get_spark
from yago4_spark.sources.statements import StatementsTable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def pr(got: set, expected: set) -> tuple[float, float]:
    tp = len(got & expected)
    return (tp / len(got) if got else 1.0,
            tp / len(expected) if expected else 1.0)


SEP = "\x1e"  # record separator — cannot occur in IRIs/NT lexicals


def _key(k) -> str:
    if isinstance(k, tuple):
        return SEP.join(str(x) for x in k)
    return str(k)


def pr_spark(got_keys, expected: set) -> tuple[float, float, int]:
    """Spark-side precision/recall: got keys (one string column ``key``)
    distinct + counted in Spark; tp = inner-join count against the
    parallelized expected keys. Nothing data-sized ever lands on the
    driver — at 10M entities the big families are ~34M rows each and
    both the collect-a-set (80 GB transient, OOM) and the
    toLocalIterator-stream (driver-core-bound, hours) shapes failed;
    the join compare is a normal shuffle join that finishes in minutes.
    Expected keys come from a Python set (unique by construction), so
    inner-join-count == |got ∩ expected| exactly."""
    import pandas as pd

    spark = got_keys.sparkSession
    got = got_keys.distinct().persist()
    n = got.count()
    exp_df = spark.createDataFrame(
        pd.DataFrame({"key": [_key(k) for k in expected]})).distinct()
    tp = got.join(exp_df, "key", "inner").count()
    if tp != n or tp != len(expected):
        # itemize the divergence while the frames are still alive: exact
        # counts + a sample of keys from each side (repr → control
        # chars visible)
        print(f"[diverge] n_got={n} tp={tp} n_expected={len(expected)}",
              flush=True)
        for label, df in (("got-only", got.join(exp_df, "key", "left_anti")),
                          ("expected-only",
                           exp_df.join(got, "key", "left_anti"))):
            for r in df.limit(5).collect():
                print(f"[diverge] {label}: {r['key']!r}", flush=True)
    got.unpersist()
    return (tp / n if n else 1.0, tp / len(expected) if expected else 1.0, n)


def _plain_keys(df, cols: list[str]):
    return df.select(
        F.concat_ws(SEP, *[
            # concat_ws silently SKIPS nulls, which would alias rows
            # like ('x', NULL, 'y') and ('x', 'y', NULL); render nulls
            # as 'None' to match str(None) on the Python _key side.
            F.coalesce(F.col(c).cast("string"), F.lit("None"))
            for c in cols])
        .alias("key"))


def _nt_keys(df, spec: list[tuple[str, str]]):
    """key column from a mix of ('text', col) parts (already strings)
    and ('nt', col) parts (term structs serialized with the SAME
    term_to_nt_py the oracle uses — run in EXECUTORS, so serialization
    is parallel and bit-identical to the expected side).

    mapInArrow + to_pylist, NOT mapInPandas: pandas conversion coerces
    a nullable int64 struct field to float64, so an integer term's
    ``num`` 288 serialized as "288.0" — 8 of 242k facts keys mismatched
    at 1M before this (caught by the [diverge] diagnostics). Arrow's
    to_pylist yields true Python ints/None."""
    sel = [F.col(c).alias(f"_c{i}") for i, (_, c) in enumerate(spec)]
    kinds = [kind for kind, _ in spec]

    def gen(batches):
        import pyarrow as pa

        for batch in batches:
            cols = []
            for i, kind in enumerate(kinds):
                vals = batch.column(i).to_pylist()
                if kind == "nt":
                    vals = [terms.term_to_nt_py(v) for v in vals]
                cols.append(vals)
            keys = [SEP.join(str(v) for v in row) for row in zip(*cols)]
            yield pa.RecordBatch.from_arrays(
                [pa.array(keys, pa.string())], ["key"])

    return df.select(*sel).mapInArrow(gen, "key string")


def collect_family_rows(res, oracle) -> list[tuple]:
    """[(family, precision, recall, got_rows)] for the 12 output
    families — shared by the report and scripts/mutation_check.py."""
    rows = []
    rows.append(("uri_mapping", *pr_spark(
        _plain_keys(res.catalog.read("uri_mapping"), ["qid", "yago"]),
        set(oracle.uri.items()))))
    rows.append(("yago_classes", *pr_spark(
        _plain_keys(res.catalog.read("yago_classes"), ["cls"]),
        set(oracle.yago_classes))))
    rows.append(("class_mapping", *pr_spark(
        _plain_keys(res.catalog.read("class_mapping"), ["qid", "cls"]),
        oracle.class_mapping)))
    rows.append(("sub_class_of", *pr_spark(
        _plain_keys(res.catalog.read("sub_class_of"), ["child", "parent"]),
        oracle.sub_class_of)))
    exp_inst = {(s, i) for s, insts in oracle.instances.items()
                for i in insts}
    rows.append(("shape_instances", *pr_spark(
        _plain_keys(res.catalog.read("shape_instances"),
                    ["shape", "instance"]), exp_inst)))

    preds = {p_ for (_, p_, _) in oracle.facts}
    facts = res.outputs["facts"].where(
        F.col("predicate.text").isin(list(preds)))
    rows.append(("facts (all 9 branches + sides)", *pr_spark(
        _nt_keys(facts, [("text", "subject.text"),
                         ("text", "predicate.text"), ("nt", "object")]),
        oracle.facts)))

    ann = res.outputs["annotated_facts"].where(
        F.col("annotation_predicate").isNotNull())
    rows.append(("annotated_facts (RDF★)", *pr_spark(
        _nt_keys(ann, [("text", "subject.text"), ("text", "predicate.text"),
                       ("nt", "object"),
                       ("text", "annotation_predicate.text"),
                       ("nt", "annotation_object")]),
        oracle.annotated)))

    spo_spec = [("text", "subject.text"), ("text", "predicate.text"),
                ("nt", "object")]
    for out_name, expected in (
        ("classes", oracle.classes_out),
        ("simple_types", oracle.simple_types),
        ("full_types", oracle.full_types),
        ("labels", oracle.labels_out),
        ("same_as", oracle.same_as),
    ):
        rows.append((out_name, *pr_spark(
            _nt_keys(res.outputs[out_name], spo_spec), expected)))
    return rows


def install_closure_trace() -> list:
    """Wrap taxonomy's transitive_closure so each call records
    (iteration, frontier size) — the closure trace the 1M report
    publishes. Costs one count() job per iteration; only used under
    --deep."""
    from yago4_spark.operators import closure as closure_mod
    from yago4_spark.plans import taxonomy as taxonomy_mod

    trace: list[list[tuple[int, int]]] = []
    orig = closure_mod.transitive_closure
    orig_res = closure_mod.transitive_closure_resumable

    def traced(seeds, edges, max_iterations=closure_mod.MAX_ITERATIONS_DEFAULT,
               on_iteration=None):
        rec: list[tuple[int, int]] = []
        trace.append(rec)
        return orig(seeds, edges, max_iterations,
                    on_iteration=lambda i, n: rec.append((i, n)))

    def traced_res(seeds, edges, checkpoint_dir,
                   max_iterations=closure_mod.MAX_ITERATIONS_DEFAULT,
                   on_iteration=None):
        rec: list[tuple[int, int]] = []
        trace.append(rec)
        return orig_res(seeds, edges, checkpoint_dir, max_iterations,
                        on_iteration=lambda i, n: rec.append((i, n)))

    taxonomy_mod.transitive_closure = traced
    closure_mod.transitive_closure_resumable = traced_res
    return trace


def main() -> None:
    use_real = "--real" in sys.argv
    deep = "--deep" in sys.argv
    resume = "--resume" in sys.argv
    args = [a for a in sys.argv[1:] if a not in ("--real", "--deep",
                                                 "--resume")]
    n_ent = int(args[0]) if args else 100_000
    n_cls = int(args[1]) if len(args) > 1 else 800
    base = "/tmp/differential_100k"
    if not resume:
        shutil.rmtree(base, ignore_errors=True)
    spark = get_spark(app_name="differential-100k")
    spark.sparkContext.setLogLevel("ERROR")

    schema = None
    if use_real:
        from yago4_spark.plans.ttl import load_schema

        ref = "/root/reference/src/data"
        schema = load_schema(
            [f"{ref}/{f}" for f in ["schema.ttl", "shapes.ttl",
                                    "bioschemas.ttl", "shapes-bio.ttl"]],
            min_instances=10)
    t0 = time.time()
    gt = generate(n_entities=n_ent, n_classes=n_cls, schema=schema)
    oracle = compute_oracle(gt)
    t_gen = time.time() - t0
    if not (resume and os.path.exists(f"{base}/statements")):
        StatementsTable.write(statements_df(spark, gt), f"{base}/statements")
    # the raw statements are the single biggest ground-truth member
    # (~72M rows at 10M entities); once written they are only read back
    # through Spark — free them so the compare phase keeps only the
    # oracle's expected sets in Python memory
    n_stmt = len(gt.statements)
    gt.statements = None
    closure_trace = install_closure_trace() if deep else None
    t0 = time.time()
    res = run_pipeline(spark, f"{base}/statements", f"{base}/work", gt.schema)
    for df in res.outputs.values():
        df.count()
    t_pipe = time.time() - t0
    exchanges = (
        {m["stage"]: m.get("plan_exchanges")
         for m in (res.catalog.manifest(s)
                   for s in sorted(os.listdir(res.catalog.root))
                   if res.catalog.exists(s))
         if m.get("plan_exchanges") is not None}
        if deep else None
    )

    rows = collect_family_rows(res, oracle)

    # schema/shapes NT round-trip (VERDICT r03 item 6): emit → serialize
    # through the real NT sink → re-parse through plans/ttl.py →
    # reconstruct, scored against the config-derived surface
    from yago4_spark.plans.outputs import (
        build_yago_schema_triples,
        build_yago_shapes_triples,
    )
    from yago4_spark.plans.roundtrip import (
        schema_surface_from_config,
        schema_surface_from_graph,
        shapes_surface_from_config,
        shapes_surface_from_graph,
    )
    from yago4_spark.plans.ttl import parse_turtle
    from yago4_spark.sources.ntriples import triples_to_nt_lines

    def nt_text(df):
        return "\n".join(r["value"]
                         for r in triples_to_nt_lines(df).collect())

    sch = gt.schema
    got_shapes = shapes_surface_from_graph(
        parse_turtle(nt_text(build_yago_shapes_triples(spark, sch))))
    rows.append(("yago_shapes (NT round-trip)",
                 *pr(got_shapes, shapes_surface_from_config(sch)),
                 len(got_shapes)))
    got_schema = schema_surface_from_graph(
        parse_turtle(nt_text(build_yago_schema_triples(spark, sch))))
    rows.append(("yago_schema (NT round-trip)",
                 *pr(got_schema, schema_surface_from_config(sch)),
                 len(got_schema)))

    cfg = ("REAL 268-shape reference config" if use_real
           else "sample_schema (8 shapes)")
    lines = [
        "",
        f"## Statistical differential at {n_ent:,} entities — {cfg} "
        f"(scripts/differential_report.py{' --real' if use_real else ''})",
        "",
        f"Seeded synthetic slice: {n_ent:,} entities, {n_cls} classes, "
        f"{n_stmt:,} statements (hub skew: 20% direct Q5; planted "
        f"maxCount violations, disjoint memberships, bad/orphan "
        f"subtrees, sub-threshold classes). Python oracle reimplements "
        f"the taxonomy 7-step, URI priority, shape instances, all 9 "
        f"facts dispatch branches + RDF★, and the classes / simple+full "
        f"types / labels / same_as output families independently of the "
        f"Spark plans; the yago_schema / yago_shapes rows score the NT "
        f"serialize→re-parse→reconstruct round trip against the config. "
        f"Pipeline wall: {t_pipe:.0f}s (local[32]); oracle+gen: {t_gen:.0f}s.",
        "",
        "| output | precision | recall | spark rows |",
        "|---|---|---|---|",
    ]
    ok = True
    for name, p_, r_, n in rows:
        lines.append(f"| {name} | {p_:.4f} | {r_:.4f} | {n:,} |")
        ok = ok and p_ == 1.0 and r_ == 1.0
    lines.append("")
    if deep:
        lines.append(
            "Build-plan Exchange counts per stage (pre-execution AQE "
            "plan, recorded by the stage catalog at write time): "
            + ", ".join(f"{k}={v}" for k, v in sorted(exchanges.items()))
            + f"; total {sum(exchanges.values())}.")
        traces = [t for t in closure_trace if t]
        if traces:
            longest = max(traces, key=len)
            lines.append(
                f"Taxonomy closure trace ({len(traces)} closures; longest "
                f"{len(longest)} iterations, frontier sizes "
                f"{[n for _, n in longest]}).")
        lines.append("")
    lines.append(f"All-exact: **{'YES' if ok else 'NO'}**")
    report = "\n".join(lines) + "\n"
    print(report)
    with open(os.path.join(REPO, "BASELINE_RESULTS.md"), "a") as f:
        f.write(report)
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
