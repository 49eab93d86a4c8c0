"""Wikibase value converters (SURVEY.md §2.7) as Spark column expressions
— plus one pandas UDF where Rust f64 Display / URL normalization cannot be
matched JVM-side.

Every function mirrors one reference converter exactly, including its
quirks, because P/R is measured on serialized triples:

- convert_time       src/plan.rs:1498-1524 (Gregorian only; precision
                     9/10/11/14 → gYear/gYearMonth/date/dateTime)
- round_degrees      src/plan.rs:1571-1575 (round half AWAY from zero —
                     not banker's)
- convert_globe_coordinates src/plan.rs:1528-1568 (Earth only; IRI uses
                     ROUNDED coords, side triples carry the ORIGINALS)
- convert_duration_quantity src/plan.rs:1578-1630 (negative amounts
                     produce the reference's literal "-PT-3S" shape —
                     reproduced verbatim)
- convert_integer_quantity  src/plan.rs:1633-1641 (unit must be Q199)
- convert_quantity   src/plan.rs:1645-1687 (value IRI + 5 side triples)
- normalize_url      src/plan.rs:1248-1271 (Url::parse-or-drop → anyURI)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from .. import vocab

# --- time ---------------------------------------------------------------

_TIME_RE = r"^(-?\d{4,})-(\d{2})-(\d{2})T"


def _julian_to_gregorian_cols(y: Column, m: Column, d: Column
                              ) -> tuple[Column, Column, Column]:
    """Proleptic-Julian (Y, M, D) → proleptic-Gregorian (Y, M, D) via
    Julian Day Number arithmetic (Fliegel–Van Flandern / calendar FAQ
    algorithms, pure integer column math). FLOOR division throughout —
    Spark's integer `div` truncates toward zero, which breaks negative
    (BCE, astronomical-numbered) years; doubles are exact at these
    magnitudes (< 2^40)."""
    def fdiv(a: Column, b: int) -> Column:
        return F.floor(a / F.lit(b)).cast("long")

    a = fdiv(F.lit(14) - m, 12)
    yy = y + 4800 - a
    mm = m + 12 * a - 3
    jdn = d + fdiv(F.lit(153) * mm + 2, 5) + F.lit(365) * yy \
        + fdiv(yy, 4) - 32083
    ga = jdn + 32044
    gb = fdiv(F.lit(4) * ga + 3, 146097)
    gc = ga - fdiv(F.lit(146097) * gb, 4)
    gd = fdiv(F.lit(4) * gc + 3, 1461)
    ge = gc - fdiv(F.lit(1461) * gd, 4)
    gm = fdiv(F.lit(5) * ge + 2, 153)
    out_d = ge - fdiv(F.lit(153) * gm + 2, 5) + 1
    out_m = gm + 3 - 12 * fdiv(gm, 10)
    out_y = F.lit(100) * gb + gd - 4800 + fdiv(gm, 10)
    return out_y, out_m, out_d


def _format_year(y: Column) -> Column:
    """Numeric year → chrono-style lexical: 4-digit zero-pad, '-' kept,
    '+' prefix for years >= 10000 (the convention convert_time emits —
    see the rustc differential note below)."""
    # lpad TRUNCATES strings longer than len, so pad only when needed:
    # a deep-BCE year like -12345 must stay '-12345', not '-1234'
    # (mirrors _format_year_py, which never truncates).
    absy = F.abs(y).cast("string")
    absy = F.when(F.abs(y) > 9999, absy).otherwise(F.lpad(absy, 4, "0"))
    return (
        F.when(y < 0, F.concat(F.lit("-"), absy))
        .when(y > 9999, F.concat(F.lit("+"), y.cast("string")))
        .otherwise(absy)
    )


def convert_time_cols(value_text: Column, precision: Column,
                      calendar_qid: Column,
                      emit_julian: bool = False) -> tuple[Column, Column]:
    """(lexical, datatype) for a Wikibase time; NULL lexical = dropped.

    ``value_text`` is the RFC3339 lexical form of the xsd:dateTime the
    dump carried. String surgery, no TimestampType — Spark timestamps
    can't hold negative years and would shift timezones.

    ``emit_julian`` (default False = reference parity): the reference
    DROPS proleptic-Julian times (src/plan.rs:1502 TODO — only
    wd:Q1985727 Gregorian is emitted). With the flag on, Julian values
    are CONVERTED to the proleptic Gregorian calendar and emitted — a
    documented, opt-in DIVERGENCE from the reference: day-precision
    (11) and second-precision (14) values get an exact Julian-day-number
    date conversion; year/month precisions (9/10) pass through
    unchanged (a year-level Julian↔Gregorian shift only exists for the
    ~13 days around new year, below those precisions' resolution). The
    lexical year is read as astronomical numbering (year 0 = 1 BCE),
    which is how the dump stores it.
    """
    year = F.regexp_extract(value_text, _TIME_RE, 1)
    month = F.regexp_extract(value_text, _TIME_RE, 2)
    day = F.regexp_extract(value_text, _TIME_RE, 3)
    # chrono's %Y (and its rfc3339 year writer) prefix years >= 10000
    # with '+' — verified against the compiled convert_time dispatch by
    # scripts/rust_differential.py (family convert_time)
    expanded = (F.length(year) > 4) & ~year.startswith("-")
    year = F.when(expanded, F.concat(F.lit("+"), year)).otherwise(year)
    gregorian = calendar_qid == vocab.Q_PROLEPTIC_GREGORIAN
    julian = calendar_qid == vocab.Q_PROLEPTIC_JULIAN
    ok = gregorian & (year != "")
    # the reference re-emits precision-14 values via to_rfc3339(), which
    # renders UTC as +00:00 (src/model.rs:249-253)
    rfc = F.regexp_replace(value_text, "Z$", "+00:00")
    rfc = F.when(expanded, F.concat(F.lit("+"), rfc)).otherwise(rfc)
    if emit_julian:
        gy, gm, gd = _julian_to_gregorian_cols(
            F.regexp_extract(value_text, _TIME_RE, 1).cast("long"),
            month.cast("long"), day.cast("long"))
        jdate = F.concat_ws(
            "-", _format_year(gy),
            F.lpad(gm.cast("string"), 2, "0"),
            F.lpad(gd.cast("string"), 2, "0"))
        time_part = F.regexp_replace(rfc, r"^\+?-?\d{4,}-\d{2}-\d{2}T", "")
        year = F.when(julian, year).otherwise(year)  # 9/10 pass through
        day_lex = F.when(julian, jdate).otherwise(
            F.concat_ws("-", year, month, day))
        dt_lex = F.when(julian, F.concat(jdate, F.lit("T"), time_part)) \
            .otherwise(rfc)
        ok = (gregorian | julian) & (year != "")
    else:
        day_lex = F.concat_ws("-", year, month, day)
        dt_lex = rfc
    lexical = (
        F.when(~ok, F.lit(None).cast("string"))
        .when(precision == 9, year)
        .when(precision == 10, F.concat_ws("-", year, month))
        .when(precision == 11, day_lex)
        .when(precision == 14, dt_lex)
        .otherwise(F.lit(None).cast("string"))
    )
    datatype = (
        F.when(precision == 9, F.lit(vocab.XSD_G_YEAR))
        .when(precision == 10, F.lit(vocab.XSD_G_YEAR_MONTH))
        .when(precision == 11, F.lit(vocab.XSD_DATE))
        .when(precision == 14, F.lit(vocab.XSD_DATE_TIME))
    )
    return lexical, datatype


def julian_to_gregorian_py(y: int, m: int, d: int) -> tuple[int, int, int]:
    """Pure-Python twin of :func:`_julian_to_gregorian_cols` (Python //
    is floor division, matching the column math exactly)."""
    a = (14 - m) // 12
    yy = y + 4800 - a
    mm = m + 12 * a - 3
    jdn = d + (153 * mm + 2) // 5 + 365 * yy + yy // 4 - 32083
    ga = jdn + 32044
    gb = (4 * ga + 3) // 146097
    gc = ga - 146097 * gb // 4
    gd = (4 * gc + 3) // 1461
    ge = gc - 1461 * gd // 4
    gm = (5 * ge + 2) // 153
    return (100 * gb + gd - 4800 + gm // 10,
            gm + 3 - 12 * (gm // 10),
            ge - (153 * gm + 2) // 5 + 1)


def _format_year_py(y: int) -> str:
    if y < 0:
        return f"-{abs(y):04d}"
    return f"+{y}" if y > 9999 else f"{y:04d}"


def convert_time_py(value_text: str, precision: int,
                    calendar_qid: int,
                    emit_julian: bool = False) -> tuple[str, str] | None:
    """Pure-Python twin of :func:`convert_time_cols` — the comparison
    side of the rustc differential (family convert_time), which runs the
    reference's convert_time body (src/plan.rs:1498-1524) verbatim over
    a chrono shim. Returns (lexical, datatype IRI) or None (dropped).
    test_values_convert_time_twins pins this to the Column version."""
    import re

    is_julian = emit_julian and calendar_qid == vocab.Q_PROLEPTIC_JULIAN
    if calendar_qid != vocab.Q_PROLEPTIC_GREGORIAN and not is_julian:
        return None
    m = re.match(_TIME_RE, value_text)
    if not m:
        return None
    year, month, day = m.groups()
    plus = len(year) > 4 and not year.startswith("-")
    if is_julian and precision in (11, 14):
        gy, gm, gd = julian_to_gregorian_py(int(year), int(month), int(day))
        gdate = f"{_format_year_py(gy)}-{gm:02d}-{gd:02d}"
        if precision == 11:
            return gdate, vocab.XSD_DATE
        rfc = re.sub("Z$", "+00:00", value_text)
        time_part = re.sub(r"^-?\d{4,}-\d{2}-\d{2}T", "", rfc)
        return f"{gdate}T{time_part}", vocab.XSD_DATE_TIME
    if plus:
        year = "+" + year
    if precision == 9:
        return year, vocab.XSD_G_YEAR
    if precision == 10:
        return f"{year}-{month}", vocab.XSD_G_YEAR_MONTH
    if precision == 11:
        return f"{year}-{month}-{day}", vocab.XSD_DATE
    if precision == 14:
        rfc = re.sub("Z$", "+00:00", value_text)
        return ("+" + rfc if plus else rfc), vocab.XSD_DATE_TIME
    return None


# --- geo ----------------------------------------------------------------

def _rust_round(x: float) -> float:
    """f64::round — nearest integer, ties away from zero (C round).
    NOT floor(x+0.5): that misrounds 0.49999999999999994 and friends."""
    import math

    if math.isnan(x) or math.isinf(x):
        return x
    f = math.floor(x)
    diff = x - f
    if diff > 0.5:
        return f + 1.0
    if diff < 0.5:
        return f
    return f + 1.0 if x > 0 else f


def round_degrees(degrees: float, precision: float) -> float:
    """signum(d) * round(|d|/p) * p — exact twin of the reference
    (src/plan.rs:1570-1575), INCLUDING the p==0 behavior (|d|/0 → inf,
    inf*0 → NaN → the reference emits geo:NaN,NaN) and f64::signum
    (signum(±0) = ±1). Verified vs compiled reference code by
    scripts/rust_differential.py."""
    import math

    if precision == 0.0:
        # IEEE: |d|/0 → ±inf (or NaN for 0/0), then inf*0 → NaN — Python
        # raises on float /0.0, so short-circuit to the IEEE result
        expanded = math.nan
    else:
        reduced = _rust_round(abs(degrees) / precision)
        expanded = reduced * precision
    sig = math.nan if math.isnan(degrees) else math.copysign(1.0, degrees)
    return sig * expanded


def _geo_iri_batch(lat: pd.Series, lng: pd.Series, prec: pd.Series) -> pd.Series:
    from ..terms import format_f64

    out = []
    for la, lo, pr in zip(lat, lng, prec):
        if la is None or lo is None or pr is None:
            out.append(None)
            continue
        rla = round_degrees(float(la), float(pr))
        rlo = round_degrees(float(lo), float(pr))
        out.append(f"geo:{format_f64(rla)},{format_f64(rlo)}")
    return pd.Series(out)


geo_iri = F.pandas_udf(_geo_iri_batch, StringType())


# --- durations / integers / quantities ------------------------------------

def _decimal_to_long(amount_text: Column) -> Column:
    """Parse a Wikibase decimal amount string ('+42', '-3') to long;
    NULL when fractional or out of i64 range (Rust i64::from_str
    semantics: rejects '42.5')."""
    is_int = amount_text.rlike(r"^[+-]?\d+$")
    cleaned = F.regexp_replace(amount_text, r"^\+", "")
    # try_cast: i64 overflow → NULL (i64::from_str → Err), ANSI-safe
    return F.when(is_int, cleaned.try_cast("long")).otherwise(
        F.lit(None).cast("long"))


# i128 bounds as digit strings (the reference parses duration amounts
# with i128::from_str, src/plan.rs:1579-1580 — wider than Spark's long)
_I128_MAX_STR = str(2 ** 127 - 1)   # 39 digits
_I128_MIN_MAG = str(2 ** 127)


def _i128_norm(amount_text: Column) -> Column:
    """i128::from_str, expressed as string surgery: NULL when not a pure
    signed integer or out of i128 range; else the canonical '{}' form
    (sign dropped for zero, leading zeros stripped)."""
    is_int = amount_text.rlike(r"^[+-]?\d+$")
    mag = F.regexp_replace(amount_text, r"^[+-]?0*(?=\d)", "")
    neg = amount_text.startswith("-") & (mag != "0")
    limit = F.when(amount_text.startswith("-"),
                   F.lit(_I128_MIN_MAG)).otherwise(F.lit(_I128_MAX_STR))
    in_range = (F.length(mag) < 39) | (
        (F.length(mag) == 39) & (mag <= limit)
    )
    out = F.when(neg, F.concat(F.lit("-"), mag)).otherwise(mag)
    return F.when(is_int & in_range, out).otherwise(F.lit(None).cast("string"))


def convert_duration_cols(amount_text: Column, unit_qid: Column) -> Column:
    """xsd:duration lexical; NULL = dropped. Negative amounts reproduce
    the reference's exact output shape ('-PT-3S': the sign prefix AND the
    signed number, src/plan.rs:1582-1624); amounts are i128-parsed, so
    values beyond long still convert."""
    n = _i128_norm(amount_text)
    body = (
        F.when(unit_qid == vocab.Q_SECOND, F.concat(F.lit("PT"), n, F.lit("S")))
        .when(unit_qid == vocab.Q_MINUTE, F.concat(F.lit("PT"), n, F.lit("M")))
        .when(unit_qid == vocab.Q_HOUR, F.concat(F.lit("PT"), n, F.lit("H")))
        .when(unit_qid == vocab.Q_DAY, F.concat(F.lit("P"), n, F.lit("D")))
    )
    signed = F.when(n.startswith("-"), F.concat(F.lit("-"), body)).otherwise(body)
    return F.when(n.isNull(), F.lit(None).cast("string")).otherwise(signed)


def convert_integer_cols(amount_text: Column, unit_qid: Column) -> Column:
    """long value; NULL = dropped (unit must be Q199, src/plan.rs:1633-1641)."""
    n = _decimal_to_long(amount_text)
    return F.when(unit_qid == vocab.Q_UNIT_ONE, n).otherwise(F.lit(None).cast("long"))


_DUR_UNITS = {vocab.Q_SECOND: ("PT", "S"), vocab.Q_MINUTE: ("PT", "M"),
              vocab.Q_HOUR: ("PT", "H"), vocab.Q_DAY: ("P", "D")}


def duration_py(amount: str, unit_qid: int) -> str:
    """Scalar twin of convert_duration_cols with the reference's exact
    semantics (src/plan.rs:1578-1630). Returns '<lexical>\\t<datatype>' or
    'NONE' — the wire format of scripts/rust_differential.py, which
    checks this function against the compiled reference body."""
    import re

    if unit_qid not in _DUR_UNITS or not re.fullmatch(r"[+-]?\d+", amount):
        return "NONE"
    n = int(amount)
    if not -(2 ** 127) <= n < 2 ** 127:
        return "NONE"
    pre, suf = _DUR_UNITS[unit_qid]
    lex = f"{pre}{n}{suf}" if n >= 0 else f"-{pre}{n}{suf}"
    return f"{lex}\t{vocab.XSD_DURATION}"


def integer_quantity_py(amount: str, unit_qid: int) -> str:
    """Scalar twin of convert_integer_cols (src/plan.rs:1633-1641):
    unit must be Q199, i64::from_str or drop."""
    import re

    if unit_qid != vocab.Q_UNIT_ONE or not re.fullmatch(r"[+-]?\d+", amount):
        return "NONE"
    n = int(amount)
    if not -(2 ** 63) <= n < 2 ** 63:
        return "NONE"
    return str(n)


def quantity_value_iri(node_iri: Column) -> Column:
    """yago value IRI for a quantity node: replace the Wikidata prop
    prefix with the yago value prefix (src/plan.rs:1652-1654; a no-op for
    wdv: nodes, faithfully reproduced)."""
    return F.replace(
        node_iri,
        F.lit("http://www.wikidata.org/prop/"),
        F.lit(vocab.YAGO_VALUE_PREFIX),
    )


# --- URLs ---------------------------------------------------------------

def _normalize_url_batch(urls: pd.Series) -> pd.Series:
    """Url::parse-or-drop (src/plan.rs:1248-1271). Rust's url crate
    normalizes: lowercased scheme/host, default port stripped, empty path
    → '/'. We reproduce those rules; exotic IDN/percent normalization
    divergences are documented rather than chased."""
    from urllib.parse import urlsplit, urlunsplit

    out = []
    for u in urls:
        if u is None:
            out.append(None)
            continue
        try:
            parts = urlsplit(u)
            if not parts.scheme or not parts.netloc:
                out.append(None)
                continue
            scheme = parts.scheme.lower()
            netloc = parts.netloc
            host = parts.hostname.lower() if parts.hostname else ""
            if parts.port is not None:
                default = {"http": 80, "https": 443, "ftp": 21}.get(scheme)
                netloc = host if parts.port == default else f"{host}:{parts.port}"
            else:
                userinfo = ""
                if "@" in netloc:
                    userinfo = netloc.rsplit("@", 1)[0] + "@"
                netloc = userinfo + host
            path = parts.path or "/"
            out.append(urlunsplit((scheme, netloc, path, parts.query, parts.fragment)))
        except ValueError:
            out.append(None)
    return pd.Series(out)


normalize_url = F.pandas_udf(_normalize_url_batch, StringType())
