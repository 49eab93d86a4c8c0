"""Full-ingest equivalence: serializing the synthetic statements to a
gzip N-Triples dump, re-ingesting it through the Arrow parser (the CLI
``partition`` path) and running the pipeline must produce EXACTLY the
same outputs as running on the original statements — every term kind
survives the serialize→parse roundtrip (doubles via shortest-roundtrip
formatting, decimals/dateTimes verbatim, escapes, QID/PID inlining,
blank statement nodes)."""

from __future__ import annotations

import pytest

from yago4_spark import terms
from yago4_spark.fixtures_large import generate, statements_df
from yago4_spark.pipeline import run_pipeline
from yago4_spark.sources.ntriples import read_ntriples, write_ntriples
from yago4_spark.sources.statements import StatementsTable


def _nt_set(df):
    return {
        tuple(terms.term_to_nt_py(r[c].asDict())
              for c in ("subject", "predicate", "object"))
        for r in df.collect()
    }


@pytest.mark.slow
def test_nt_roundtrip_pipeline(spark, tmp_path):
    gt = generate(n_entities=2000, n_classes=150)
    direct = statements_df(spark, gt)

    p_direct = str(tmp_path / "stmts_direct")
    StatementsTable.write(direct, p_direct)
    res_a = run_pipeline(spark, p_direct, str(tmp_path / "work_a"), gt.schema)

    nt_dir = str(tmp_path / "dump_nt")
    write_ntriples(direct, nt_dir)  # gzip shards
    reingested = read_ntriples(spark, nt_dir)
    p_rt = str(tmp_path / "stmts_rt")
    StatementsTable.write(reingested, p_rt)
    res_b = run_pipeline(spark, p_rt, str(tmp_path / "work_b"), gt.schema)

    # statement-level roundtrip is lossless
    assert _nt_set(direct) == _nt_set(reingested)
    # and so are the pipeline outputs
    for name in ("facts", "simple_types", "labels", "same_as"):
        a = _nt_set(res_a.outputs[name])
        b = _nt_set(res_b.outputs[name])
        assert a == b, (name, sorted(a ^ b)[:3])
