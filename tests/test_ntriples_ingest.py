"""The two-path N-Triples ingest (JVM fast path for escape-free lines,
Python fallback for escaped ones) must agree exactly with the reference
per-line parser on every term kind."""

from __future__ import annotations

from yago4_spark import terms
from yago4_spark.sources.ntriples import read_ntriples

E = "http://example.com/"
WD = "http://www.wikidata.org/entity/"
WDT = "http://www.wikidata.org/prop/direct/"
XSD = "http://www.w3.org/2001/XMLSchema#"

LINES = [
    # QID/PID inlining
    f"<{WD}Q42> <{WDT}P279> <{WD}Q5> .",
    f"<{WD}Q42> <http://www.wikidata.org/prop/P569> <{E}stmt/1> .",
    # non-numeric tails stay plain IRIs
    f"<{WD}Q42x> <{WDT}Pabc> <{WD}L123> .",
    # every literal kind, escape-free (JVM path)
    f'<{E}s> <{E}p> "plain string" .',
    f'<{E}s> <{E}p> "Berlin"@EN .',
    f'<{E}s> <{E}p> "42"^^<{XSD}integer> .',
    f'<{E}s> <{E}p> "+86"^^<{XSD}integer> .',   # XSD allows a leading +
    f'<{E}s> <{E}p> "-7"^^<{XSD}integer> .',
    f'<{E}s> <{E}p> "+2.5"^^<{XSD}double> .',
    f'<{E}s> <{E}p> "999999999999999999999999"^^<{XSD}integer> .',  # > i64
    f'<{E}s> <{E}p> "1.50"^^<{XSD}decimal> .',
    f'<{E}s> <{E}p> "2.5E3"^^<{XSD}double> .',
    f'<{E}s> <{E}p> "2020-01-01T00:00:00Z"^^<{XSD}dateTime> .',
    f'<{E}s> <{E}p> "x"^^<{E}customType> .',
    f'<{E}s> <{E}p> "text. with dots." .',
    f"_:b0 <{E}p> _:b1 .",
    # escaped lines (Python path)
    f'<{E}s> <{E}p> "say \\"hi\\"\\n" .',
    f'<{E}s> <{E}p> "caf\\u00E9"@fr .',
    # dropped lines
    "# a comment",
    "",
    "<malformed",
    f"<{E}s> <{E}p> .",
]


def _norm(t: dict) -> tuple:
    return tuple(t[k] for k in terms.TERM_FIELDS)


def test_ingest_matches_python_parser(spark, tmp_path):
    nt = tmp_path / "corpus.nt"
    nt.write_text("\n".join(LINES) + "\n")

    got = {
        tuple(_norm(r[c].asDict()) for c in ("subject", "predicate", "object"))
        for r in read_ntriples(spark, str(nt)).collect()
    }
    expected = {
        tuple(_norm(t) for t in parsed)
        for parsed in (terms.parse_nt_line(ln) for ln in LINES)
        if parsed is not None
    }
    assert got == expected
    # both paths contributed
    assert len(got) == len([l for l in LINES if terms.parse_nt_line(l)])


def test_ingest_plan_shape(spark, tmp_path):
    """One Arrow-vectorized parse pass (a single MapInPandas node), no
    per-line union split, structs assembled JVM-side."""
    nt = tmp_path / "fast.nt"
    nt.write_text(f"<{E}s> <{E}p> \"v\" .\n")
    plan = read_ntriples(spark, str(nt))._jdf.queryExecution().executedPlan().toString()
    n_py_nodes = sum(plan.count(k) for k in
                     ("MapInArrow", "PythonMapInArrow", "MapInPandas"))
    assert n_py_nodes == 1, plan
    assert "Union" not in plan
