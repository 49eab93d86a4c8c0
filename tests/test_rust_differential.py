"""True differential against the reference's OWN code, compiled.

The full cargo build is impossible offline (11 crates, registry
unreachable), but the reference's lexical-fidelity layer is pure std:
scripts/rust_differential.py extracts those function bodies VERBATIM
from /root/reference/src/plan.rs + vocab.rs, compiles them with rustc,
and streams generated corpora through the binary. This retires the
"oracle is the same author" caveat for exactly the layer SURVEY §7.4
flags as the hard part: IRI encoding, f64 Display (geo IRIs, double
literals), rounding, label casing, blank-node names, duration/integer
quantity conversion.

Also asserts the Spark Column implementations agree with the scalar
twins the differential checks, so the chain is:
    compiled reference code == scalar twin == Spark column plan.
"""

from __future__ import annotations

import pytest

from scripts.rust_differential import (
    build_harness,
    compare_all,
    quantity_corpus,
    rustc_available,
)

pytestmark = pytest.mark.skipif(
    not rustc_available(), reason="rustc not available"
)


@pytest.fixture(scope="module")
def harness():
    return build_harness()


def test_reference_differential(harness):
    report = compare_all(harness)
    assert sum(r["n"] for r in report.values()) > 15000
    bad = {k: v["mismatches"] for k, v in report.items()
           if v["mismatch_count"]}
    assert not bad, bad


def test_spark_columns_match_scalar_twins(spark):
    """convert_duration_cols / convert_integer_cols (the plans' real
    path) reproduce the rust-differential-verified scalar twins."""
    from pyspark.sql import functions as F

    from yago4_spark import vocab
    from yago4_spark.functions.values import (
        convert_duration_cols,
        convert_integer_cols,
        duration_py,
        integer_quantity_py,
    )

    corpus = quantity_corpus()
    df = spark.createDataFrame(corpus, "amount string, unit int")
    rows = df.select(
        "amount", "unit",
        convert_duration_cols(F.col("amount"), F.col("unit")).alias("dur"),
        convert_integer_cols(F.col("amount"), F.col("unit")).alias("intq"),
    ).collect()
    for r in rows:
        want_dur = duration_py(r["amount"], r["unit"])
        got_dur = "NONE" if r["dur"] is None else f"{r['dur']}\t{vocab.XSD_DURATION}"
        assert got_dur == want_dur, (r["amount"], r["unit"], r["dur"])
        want_int = integer_quantity_py(r["amount"], r["unit"])
        got_int = "NONE" if r["intq"] is None else str(r["intq"])
        assert got_int == want_int, (r["amount"], r["unit"], r["intq"])


def test_convert_time_cols_match_scalar_twin(spark):
    """convert_time_cols (the plans' real path) reproduces the
    rust-differential-verified convert_time_py twin over the full time
    corpus — closing the chain compiled reference == twin == column."""
    from pyspark.sql import functions as F

    from scripts.rust_differential import _time_lexical, time_corpus
    from yago4_spark.functions.values import convert_time_cols, convert_time_py

    corpus = [( _time_lexical(*row[:7]), row[7], row[8])
              for row in time_corpus(n=800)]
    df = spark.createDataFrame(corpus, "lex string, prec int, cal long")
    lexical, datatype = convert_time_cols(F.col("lex"), F.col("prec"),
                                          F.col("cal"))
    rows = df.select("lex", "prec", "cal", lexical.alias("out_lex"),
                     datatype.alias("out_dt")).collect()
    for r in rows:
        want = convert_time_py(r["lex"], r["prec"], r["cal"])
        got = None if r["out_lex"] is None else (r["out_lex"], r["out_dt"])
        assert got == want, (r["lex"], r["prec"], r["cal"], got, want)


def test_convert_time_julian_opt_in(spark):
    """ROADMAP r5 / reference TODO src/plan.rs:1502: the reference DROPS
    proleptic-Julian times; ``emit_julian=True`` converts them to
    proleptic Gregorian instead — a documented opt-in divergence.
    Checks: canonical day shifts (1582: 10 days, 1900: 13 days), the
    time-of-day part surviving precision 14, year/month passthrough at
    precisions 9/10, default behavior unchanged (dropped), and the
    column math pinned to the Python twin across a corpus that includes
    negative (astronomical) years and Julian leap days."""
    from pyspark.sql import functions as F

    from yago4_spark import vocab
    from yago4_spark.functions.values import (
        convert_time_cols,
        convert_time_py,
        julian_to_gregorian_py,
    )

    # canonical Julian→Gregorian equivalences
    assert julian_to_gregorian_py(1582, 10, 5) == (1582, 10, 15)
    assert julian_to_gregorian_py(1900, 1, 1) == (1900, 1, 13)
    assert julian_to_gregorian_py(1700, 2, 29) == (1700, 3, 11)  # Julian leap
    # round-trip vs Python's proleptic-Gregorian ordinal for a spread of
    # dates: JDN(gregorian result) must equal JDN(julian input)
    from datetime import date

    for jy, jm, jd in [(1582, 10, 5), (1000, 3, 1), (1899, 2, 28),
                       (1752, 9, 2), (4, 2, 29)]:
        gy, gm, gd = julian_to_gregorian_py(jy, jm, jd)
        a = (14 - jm) // 12
        yy, mm = jy + 4800 - a, jm + 12 * a - 3
        jdn = jd + (153 * mm + 2) // 5 + 365 * yy + yy // 4 - 32083
        assert date(gy, gm, gd).toordinal() + 1721425 == jdn

    corpus = [
        ("1582-10-05T00:00:00Z", 11, vocab.Q_PROLEPTIC_JULIAN),
        ("1900-01-01T12:34:56Z", 14, vocab.Q_PROLEPTIC_JULIAN),
        ("1700-02-29T00:00:00Z", 11, vocab.Q_PROLEPTIC_JULIAN),
        ("1666-01-01T00:00:00Z", 9, vocab.Q_PROLEPTIC_JULIAN),
        ("1666-03-01T00:00:00Z", 10, vocab.Q_PROLEPTIC_JULIAN),
        ("-0044-03-15T00:00:00Z", 11, vocab.Q_PROLEPTIC_JULIAN),
        ("-12344-01-01T00:00:00Z", 11, vocab.Q_PROLEPTIC_JULIAN),
        ("0000-01-01T00:00:00Z", 11, vocab.Q_PROLEPTIC_JULIAN),
        ("1987-06-17T00:00:00Z", 11, vocab.Q_PROLEPTIC_GREGORIAN),
    ]
    df = spark.createDataFrame(corpus, "lex string, prec int, cal long")

    # default: Julian still dropped (reference parity — the 1M
    # differential is unchanged under the default)
    lex0, _ = convert_time_cols(F.col("lex"), F.col("prec"), F.col("cal"))
    kept = [r["lex"] for r in df.select("lex", lex0.alias("o"))
            .where(F.col("o").isNotNull()).collect()]
    assert kept == ["1987-06-17T00:00:00Z"]

    lex1, dt1 = convert_time_cols(F.col("lex"), F.col("prec"), F.col("cal"),
                                  emit_julian=True)
    rows = df.select("lex", "prec", "cal", lex1.alias("o"),
                     dt1.alias("d")).collect()
    got = {r["lex"]: (r["o"], r["d"]) for r in rows}
    assert got["1582-10-05T00:00:00Z"] == ("1582-10-15", vocab.XSD_DATE)
    assert got["1900-01-01T12:34:56Z"] == (
        "1900-01-13T12:34:56+00:00", vocab.XSD_DATE_TIME)
    assert got["1700-02-29T00:00:00Z"] == ("1700-03-11", vocab.XSD_DATE)
    assert got["1666-01-01T00:00:00Z"][0] == "1666"          # 9: passthrough
    assert got["1666-03-01T00:00:00Z"][0] == "1666-03"       # 10: passthrough
    assert got["-0044-03-15T00:00:00Z"] == ("-0044-03-13", vocab.XSD_DATE)
    # deep-BCE: |year| > 9999 must not be lpad-truncated (ADVICE r5)
    assert got["-12344-01-01T00:00:00Z"][0].startswith("-12")
    assert len(got["-12344-01-01T00:00:00Z"][0]) == len("-12344-01-01")
    assert got["0000-01-01T00:00:00Z"] == ("-0001-12-30", vocab.XSD_DATE)
    assert got["1987-06-17T00:00:00Z"] == ("1987-06-17", vocab.XSD_DATE)

    # column == twin, both modes
    for r in rows:
        want = convert_time_py(r["lex"], r["prec"], r["cal"],
                               emit_julian=True)
        g = None if r["o"] is None else (r["o"], r["d"])
        assert g == want, (r["lex"], g, want)


def test_nt_escape_col_matches_scalar_twin(spark):
    """The JVM-side escape column == the differential-verified
    escape_nt_py over the adversarial NT corpus."""
    from pyspark.sql import functions as F

    from scripts.rust_differential import nt_corpus
    from yago4_spark.terms import _escape_nt_col, escape_nt_py

    corpus = [(s,) for s in nt_corpus(n=800) if "\x00" not in s]
    df = spark.createDataFrame(corpus, "s string")
    rows = df.select("s", _escape_nt_col(F.col("s")).alias("e")).collect()
    for r in rows:
        assert r["e"] == escape_nt_py(r["s"]), repr(r["s"])
