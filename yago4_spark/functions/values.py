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


def convert_time_cols(value_text: Column, precision: Column,
                      calendar_qid: Column) -> tuple[Column, Column]:
    """(lexical, datatype) for a Wikibase time; NULL lexical = dropped.

    ``value_text`` is the RFC3339 lexical form of the xsd:dateTime the
    dump carried. String surgery, no TimestampType — Spark timestamps
    can't hold negative years and would shift timezones.
    """
    year = F.regexp_extract(value_text, _TIME_RE, 1)
    month = F.regexp_extract(value_text, _TIME_RE, 2)
    day = F.regexp_extract(value_text, _TIME_RE, 3)
    gregorian = calendar_qid == vocab.Q_PROLEPTIC_GREGORIAN
    ok = gregorian & (year != "")
    # the reference re-emits precision-14 values via to_rfc3339(), which
    # renders UTC as +00:00 (src/model.rs:249-253)
    rfc = F.regexp_replace(value_text, "Z$", "+00:00")
    lexical = (
        F.when(~ok, F.lit(None).cast("string"))
        .when(precision == 9, year)
        .when(precision == 10, F.concat_ws("-", year, month))
        .when(precision == 11, F.concat_ws("-", year, month, day))
        .when(precision == 14, rfc)
        .otherwise(F.lit(None).cast("string"))
    )
    datatype = (
        F.when(precision == 9, F.lit(vocab.XSD_G_YEAR))
        .when(precision == 10, F.lit(vocab.XSD_G_YEAR_MONTH))
        .when(precision == 11, F.lit(vocab.XSD_DATE))
        .when(precision == 14, F.lit(vocab.XSD_DATE_TIME))
    )
    return lexical, datatype


# --- geo ----------------------------------------------------------------

def round_degrees(degrees: float, precision: float) -> float:
    """sign(d) * round_half_away(|d|/p) * p (LatLongFormatter rule)."""
    import math

    if precision == 0:
        return degrees
    reduced = math.floor(abs(degrees) / precision + 0.5)
    expanded = reduced * precision
    return math.copysign(expanded, degrees) if degrees != 0 else expanded


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
    return F.when(is_int, cleaned.cast("long")).otherwise(F.lit(None).cast("long"))


def convert_duration_cols(amount_text: Column, unit_qid: Column) -> Column:
    """xsd:duration lexical; NULL = dropped. Negative amounts reproduce
    the reference's exact output shape ('-PT-3S': the sign prefix AND the
    signed number, src/plan.rs:1582-1624)."""
    n = _decimal_to_long(amount_text)
    body = (
        F.when(unit_qid == vocab.Q_SECOND, F.concat(F.lit("PT"), n.cast("string"), F.lit("S")))
        .when(unit_qid == vocab.Q_MINUTE, F.concat(F.lit("PT"), n.cast("string"), F.lit("M")))
        .when(unit_qid == vocab.Q_HOUR, F.concat(F.lit("PT"), n.cast("string"), F.lit("H")))
        .when(unit_qid == vocab.Q_DAY, F.concat(F.lit("P"), n.cast("string"), F.lit("D")))
    )
    signed = F.when(n < 0, F.concat(F.lit("-"), body)).otherwise(body)
    return F.when(n.isNull(), F.lit(None).cast("string")).otherwise(signed)


def convert_integer_cols(amount_text: Column, unit_qid: Column) -> Column:
    """long value; NULL = dropped (unit must be Q199, src/plan.rs:1633-1641)."""
    n = _decimal_to_long(amount_text)
    return F.when(unit_qid == vocab.Q_UNIT_ONE, n).otherwise(F.lit(None).cast("long"))


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
