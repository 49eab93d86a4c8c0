"""The RDF term model: 11 variants in one flat, Arrow-friendly struct.

Reference: ``src/model.rs:67-80`` defines ``enum YagoTerm`` with 11
variants. Spark has no sum types, so a term is a ``StructType`` with a
``kind`` tag and nullable payload fields — exactly one physical layout for
every term, so subject/predicate/object columns are homogeneous and
Parquet dictionary-encodes the sparse fields for free.

Kinds and payload usage (mirrors FIXTURES.md §3):

| kind       | text              | num  | dbl | lang | datatype |
|------------|-------------------|------|-----|------|----------|
| item       | —                 | QID  |     |      |          |
| prop       | prefix IRI (14)   | PID  |     |      |          |
| iri        | IRI               |      |     |      |          |
| blank      | blank id          |      |     |      |          |
| string     | lexical           |      |     |      |          |
| integer    | —                 | i64  |     |      |          |
| decimal    | lexical (verbatim)|      |     |      |          |
| double     | —                 |      | f64 |      |          |
| dateTime   | RFC3339 lexical   |      |     |      |          |
| langString | lexical           |      |     | tag  |          |
| typed      | lexical           |      |     |      | dt IRI   |

QID inlining (``item`` kind, num=QID) keeps the hot join columns as longs
— the same dictionary-encoding trick as the reference's
``WikidataItem(u32)`` (src/model.rs:84-91), and the reason entity joins
here are long-key hash joins rather than string compares.

Lexical fidelity: decimals, dateTimes and doubles keep their lexical form
end-to-end (src/model.rs:124-125 keeps decimals as strings; RFC3339
re-serialization at :249-253) so serialized-triple equality vs the
reference holds.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from . import vocab

TERM_FIELDS = ["kind", "text", "num", "dbl", "lang", "datatype"]

TERM_SCHEMA = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("text", StringType(), True),
        StructField("num", LongType(), True),
        StructField("dbl", DoubleType(), True),
        StructField("lang", StringType(), True),
        StructField("datatype", StringType(), True),
    ]
)

STATEMENT_SCHEMA = StructType(
    [
        StructField("subject", TERM_SCHEMA, False),
        StructField("predicate", TERM_SCHEMA, False),
        StructField("object", TERM_SCHEMA, False),
        StructField("predicate_key", StringType(), False),
    ]
)


# --- python-side constructors (fixtures / tests / driver config) --------

def _t(kind: str, text: str | None = None, num: int | None = None,
       dbl: float | None = None, lang: str | None = None,
       datatype: str | None = None) -> dict[str, Any]:
    return {"kind": kind, "text": text, "num": num, "dbl": dbl,
            "lang": lang, "datatype": datatype}


def item(qid: int) -> dict:
    return _t("item", num=qid)


def prop(pid: int, prefix: str = "http://www.wikidata.org/prop/direct/P") -> dict:
    assert prefix in vocab.PROPERTY_PREFIXES, prefix
    return _t("prop", text=prefix, num=pid)


def iri(value: str) -> dict:
    """IRI constructor with QID/PID inlining (src/model.rs:84-106)."""
    if value.startswith("http://www.wikidata.org/"):
        if value.startswith("http://www.wikidata.org/entity/Q"):
            tail = value[32:]
            if tail.isdigit():
                return item(int(tail))
            return _t("iri", text=value)
        for prefix in vocab.PROPERTY_PREFIXES:
            if value.startswith(prefix):
                tail = value[len(prefix):]
                if tail.isdigit():
                    return prop(int(tail), prefix)
                return _t("iri", text=value)
    return _t("iri", text=value)


def blank(node_id: str) -> dict:
    return _t("blank", text=node_id)


def string(value: str) -> dict:
    return _t("string", text=value)


def integer(value: int) -> dict:
    return _t("integer", num=value)


def decimal(lexical: str) -> dict:
    return _t("decimal", text=lexical)


def double(value: float) -> dict:
    return _t("double", dbl=value)


def date_time(rfc3339: str) -> dict:
    return _t("dateTime", text=rfc3339)


def lang_string(value: str, lang: str) -> dict:
    return _t("langString", text=value, lang=lang)


def typed(value: str, datatype: str) -> dict:
    return _t("typed", text=value, datatype=datatype)


# --- predicate partition keys -------------------------------------------

_IRI_SHORT = {
    vocab.RDF_TYPE: "rdf:type",
    vocab.SCHEMA_ABOUT: "schema:about",
    vocab.SKOS_PREF_LABEL: "skos:prefLabel",
    vocab.SKOS + "altLabel": "skos:altLabel",
    vocab.RDFS_LABEL: "rdfs:label",
    vocab.RDFS_COMMENT: "rdfs:comment",
    vocab.RDFS_SUBCLASS_OF: "rdfs:subClassOf",
    vocab.OWL_SAME_AS: "owl:sameAs",
    vocab.WIKIBASE_TIME_VALUE: "wikibase:timeValue",
    vocab.WIKIBASE_TIME_PRECISION: "wikibase:timePrecision",
    vocab.WIKIBASE_TIME_CALENDAR_MODEL: "wikibase:timeCalendarModel",
    vocab.WIKIBASE_GEO_LATITUDE: "wikibase:geoLatitude",
    vocab.WIKIBASE_GEO_LONGITUDE: "wikibase:geoLongitude",
    vocab.WIKIBASE_GEO_PRECISION: "wikibase:geoPrecision",
    vocab.WIKIBASE_GEO_GLOBE: "wikibase:geoGlobe",
    vocab.WIKIBASE_QUANTITY_AMOUNT: "wikibase:quantityAmount",
    vocab.WIKIBASE_QUANTITY_UNIT: "wikibase:quantityUnit",
    vocab.WIKIBASE_QUANTITY_LOWER_BOUND: "wikibase:quantityLowerBound",
    vocab.WIKIBASE_QUANTITY_UPPER_BOUND: "wikibase:quantityUpperBound",
    vocab.SCHEMA_NAME: "schema:name",
    vocab.SCHEMA_DESCRIPTION: "schema:description",
}


def predicate_key_py(term: dict) -> str:
    """Deterministic short partition key for a predicate term.

    Plays the role of the reference's predicate-leading RocksDB key
    ordering (src/partitioned_statements.rs:16-18): identity-partitioning
    the statements table on this key makes every per-predicate scan a
    partition-pruned read.
    """
    kind = term["kind"]
    if kind == "prop":
        short = vocab.PFX_SHORT.get(term["text"])
        if short:
            return f"{short}{term['num']}"
        idx = vocab.PROPERTY_PREFIXES.index(term["text"])
        return f"wdp{idx}:P{term['num']}"
    if kind == "item":
        return f"wd:Q{term['num']}"
    if kind == "iri":
        short = _IRI_SHORT.get(term["text"])
        if short:
            return short
        return "iri:" + re.sub(r"[^A-Za-z0-9_.:\-]", "_", term["text"][-64:])
    return f"{kind}:"


def predicate_key_col(pred: Column) -> Column:
    """Spark-native predicate_key (matches predicate_key_py).

    Stays in whole-stage codegen: a when/concat chain plus one
    regexp_replace fallback — no Python in the ingest hot path.
    """
    short_prop = F.lit(None).cast("string")
    for full, short in vocab.PFX_SHORT.items():
        short_prop = F.when(pred["text"] == full, F.lit(short)).otherwise(short_prop)
    prop_key = F.when(
        short_prop.isNotNull(), F.concat(short_prop, pred["num"].cast("string"))
    ).otherwise(
        F.concat(
            F.lit("wdp"),
            _prefix_index_col(pred["text"]).cast("string"),
            F.lit(":P"),
            pred["num"].cast("string"),
        )
    )
    iri_short = F.lit(None).cast("string")
    for full, short in _IRI_SHORT.items():
        iri_short = F.when(pred["text"] == full, F.lit(short)).otherwise(iri_short)
    iri_key = F.coalesce(
        iri_short,
        F.concat(
            F.lit("iri:"),
            F.regexp_replace(F.substring(pred["text"], -64, 64), r"[^A-Za-z0-9_.:\-]", "_"),
        ),
    )
    return (
        F.when(pred["kind"] == "prop", prop_key)
        .when(pred["kind"] == "item", F.concat(F.lit("wd:Q"), pred["num"].cast("string")))
        .when(pred["kind"] == "iri", iri_key)
        .otherwise(F.concat(pred["kind"], F.lit(":")))
    )


def _prefix_index_col(text: Column) -> Column:
    out = F.lit(-1)
    for i, p in enumerate(vocab.PROPERTY_PREFIXES):
        out = F.when(text == p, F.lit(i)).otherwise(out)
    return out


# --- N-Triples serialization --------------------------------------------
# Escape set per the N-Triples canonical form the reference's rio
# serializer emits (src/model.rs:226-266 delegates literal escaping to
# rio's Literal formatter): backslash, quote, newline, carriage return.

def escape_nt_py(value: str) -> str:
    return (
        value.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )


def _escape_nt_col(col: Column) -> Column:
    col = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    col = F.replace(col, F.lit('"'), F.lit('\\"'))
    col = F.replace(col, F.lit("\n"), F.lit("\\n"))
    col = F.replace(col, F.lit("\r"), F.lit("\\r"))
    return col


def format_f64(value: float) -> str:
    """Rust ``{}`` f64 Display: shortest-roundtrip digits, never exponent
    notation (src/plan.rs:1544 feeds this into geo IRIs; src/model.rs:245
    into double literals). Python repr gives the same shortest digit COUNT
    but (a) switches to exponents — expanded back here — and (b) breaks
    exact ties between two shortest candidates half-to-EVEN where Rust
    rounds half AWAY from zero (e.g. the double whose exact value is
    …460.25 prints …460.2 via repr but …460.3 via Rust) — re-rounded here
    through exact Decimal. Verified on 9k+ random bit patterns against
    compiled reference code by scripts/rust_differential.py.
    """
    if value != value:  # NaN
        return "NaN"
    if value == float("inf"):
        return "inf"
    if value == float("-inf"):
        return "-inf"
    s = repr(value)
    digits = s.lower().partition("e")[0].replace("-", "").replace(".", "")
    n = len(digits.lstrip("0").rstrip("0")) or 1
    if n >= 16:  # ties need full-precision shortest forms; fast-path the rest
        from decimal import ROUND_HALF_UP, Context, Decimal

        cand = Context(prec=n, rounding=ROUND_HALF_UP).plus(Decimal(value))
        if float(cand) == value:
            s = str(cand)
    if "e" not in s and "E" not in s:
        # Rust prints integral floats without the trailing ".0"
        return s[:-2] if s.endswith(".0") else s
    mantissa, _, exp = s.lower().partition("e")
    exp_n = int(exp)
    sign = ""
    if mantissa.startswith("-"):
        sign, mantissa = "-", mantissa[1:]
    int_part, _, frac = mantissa.partition(".")
    digits = int_part + frac
    point = len(int_part) + exp_n
    if point <= 0:
        out = "0." + "0" * (-point) + digits
    elif point >= len(digits):
        out = digits + "0" * (point - len(digits))
    else:
        out = digits[:point] + "." + digits[point:]
    out = out.rstrip("0").rstrip(".") if "." in out else out
    return sign + (out or "0")


def term_to_nt_py(term: dict) -> str:
    """Serialize one term to its N-Triples token (src/model.rs:226-266)."""
    kind = term["kind"]
    if kind == "item":
        return f"<http://www.wikidata.org/entity/Q{term['num']}>"
    if kind == "prop":
        return f"<{term['text']}{term['num']}>"
    if kind == "iri":
        return f"<{term['text']}>"
    if kind == "blank":
        return f"_:{term['text']}"
    if kind == "string":
        return f'"{escape_nt_py(term["text"])}"'
    if kind == "integer":
        return f'"{term["num"]}"^^<{vocab.XSD_INTEGER}>'
    if kind == "decimal":
        return f'"{escape_nt_py(term["text"])}"^^<{vocab.XSD_DECIMAL}>'
    if kind == "double":
        return f'"{format_f64(term["dbl"])}"^^<{vocab.XSD_DOUBLE}>'
    if kind == "dateTime":
        return f'"{term["text"]}"^^<{vocab.XSD_DATE_TIME}>'
    if kind == "langString":
        return f'"{escape_nt_py(term["text"])}"@{term["lang"]}'
    if kind == "typed":
        return f'"{escape_nt_py(term["text"])}"^^<{term["datatype"]}>'
    raise ValueError(f"unknown term kind: {kind}")


def term_to_nt_col(term: Column) -> Column:
    """Spark-native N-Triples token serializer — the sink hot path stays
    inside whole-stage codegen (no Python). Doubles route through a plain
    cast (documented divergence: exponent formatting vs Rust Display is
    normalized in tests via format_f64 on the fixture side).
    """
    esc = _escape_nt_col(term["text"])
    return (
        F.when(term["kind"] == "item",
               F.concat(F.lit("<http://www.wikidata.org/entity/Q"),
                        term["num"].cast("string"), F.lit(">")))
        .when(term["kind"] == "prop",
              F.concat(F.lit("<"), term["text"], term["num"].cast("string"), F.lit(">")))
        .when(term["kind"] == "iri", F.concat(F.lit("<"), term["text"], F.lit(">")))
        .when(term["kind"] == "blank", F.concat(F.lit("_:"), term["text"]))
        .when(term["kind"] == "string", F.concat(F.lit('"'), esc, F.lit('"')))
        .when(term["kind"] == "integer",
              F.concat(F.lit('"'), term["num"].cast("string"),
                       F.lit(f'"^^<{vocab.XSD_INTEGER}>')))
        .when(term["kind"] == "decimal",
              F.concat(F.lit('"'), esc, F.lit(f'"^^<{vocab.XSD_DECIMAL}>')))
        .when(term["kind"] == "double",
              F.concat(F.lit('"'), term["dbl"].cast("string"),
                       F.lit(f'"^^<{vocab.XSD_DOUBLE}>')))
        .when(term["kind"] == "dateTime",
              F.concat(F.lit('"'), term["text"], F.lit(f'"^^<{vocab.XSD_DATE_TIME}>')))
        .when(term["kind"] == "langString",
              F.concat(F.lit('"'), esc, F.lit('"@'), term["lang"]))
        .otherwise(F.concat(F.lit('"'), esc, F.lit('"^^<'), term["datatype"], F.lit(">")))
    )


# --- canonical ordering --------------------------------------------------
# The reference's "first object" picks inherit RocksDB byte order of the
# encoded terms (src/partitioned_statements.rs:63-70). We need *a*
# deterministic total order, not that exact one: sort by the serialized
# N-Triples token (documented divergence, SURVEY §7.4.2).

def term_sort_key_col(term: Column) -> Column:
    return term_to_nt_col(term)


# --- N-Triples parsing ----------------------------------------------------

_NT_TERM = re.compile(
    r"""\s*(?:
        <(?P<iri>[^>]*)>
      | _:(?P<blank>\S+)
      | "(?P<lit>(?:[^"\\]|\\.)*)"
        (?:\^\^<(?P<dt>[^>]*)>|@(?P<lang>[A-Za-z0-9\-]+))?
    )""",
    re.VERBOSE,
)

_UNESCAPE = {
    "\\\\": "\\", '\\"': '"', "\\n": "\n", "\\r": "\r", "\\t": "\t",
}


def _unescape_nt(value: str) -> str:
    if "\\" not in value:
        return value
    out = []
    i = 0
    while i < len(value):
        c = value[i]
        if c == "\\" and i + 1 < len(value):
            nxt = value[i + 1]
            if nxt in ('\\', '"', "n", "r", "t"):
                out.append(_UNESCAPE["\\" + nxt])
                i += 2
                continue
            if nxt == "u" and i + 6 <= len(value):
                out.append(chr(int(value[i + 2:i + 6], 16)))
                i += 6
                continue
            if nxt == "U" and i + 10 <= len(value):
                out.append(chr(int(value[i + 2:i + 10], 16)))
                i += 10
                continue
        out.append(c)
        i += 1
    return "".join(out)


def _literal_term(value: str, dt: str | None, lang: str | None) -> dict:
    value = _unescape_nt(value)
    if lang:
        return lang_string(value, lang.lower())
    if dt is None or dt == vocab.XSD_STRING:
        return string(value)
    if dt == vocab.XSD_INTEGER:
        try:
            n = int(value)
            if -(2 ** 63) <= n < 2 ** 63:
                return integer(n)
        except ValueError:
            pass
        return typed(value, dt)
    if dt == vocab.XSD_DECIMAL:
        return decimal(value)  # lexical form kept verbatim (model.rs:124-125)
    if dt == vocab.XSD_DOUBLE:
        try:
            return double(float(value))
        except ValueError:
            return typed(value, dt)
    if dt == vocab.XSD_DATE_TIME:
        return date_time(value)
    return typed(value, dt)


def parse_nt_line(line: str, seed: str = "") -> tuple[dict, dict, dict] | None:
    """Parse one N-Triples line into (subject, predicate, object) term
    dicts; None for blank/comment/malformed lines (lenient ingest, like
    the reference's printed-and-skipped parse errors,
    src/partitioned_statements.rs:119-121). Blank node ids get a per-file
    ``seed`` prefix (src/schema.rs:320-330).
    """
    line = line.strip()
    if not line or line.startswith("#"):
        return None
    terms = []
    pos = 0
    for _ in range(3):
        m = _NT_TERM.match(line, pos)
        if not m:
            return None
        pos = m.end()
        if m.group("iri") is not None:
            terms.append(iri(_unescape_nt(m.group("iri"))))
        elif m.group("blank") is not None:
            terms.append(blank(seed + m.group("blank")))
        else:
            terms.append(_literal_term(m.group("lit"), m.group("dt"), m.group("lang")))
    if not line[pos:].strip().startswith("."):
        return None
    return terms[0], terms[1], terms[2]
