"""N-Triples source & sink — the ingest/egress boundary.

Reference behaviors re-expressed Spark-first:
- ``load_ntriples`` (src/partitioned_statements.rs:82-128): streaming
  gzip parse → RocksDB (P,S,O) keys. Here: ``spark.read.text`` → a
  pure-Arrow vectorized parser (one RE2 ``extract_regex`` pass per line
  plus C++ kernel dispatch, via ``mapInArrow``) yielding FLAT columns;
  term structs are assembled JVM-side. Per-row Python survives only for
  escape sequences and >18-digit integers — patched back in with
  ``replace_with_mask`` on the rare rows that need them. Malformed
  lines are dropped, like the reference's printed-and-skipped errors
  (:119-121).
- ``NTriplesWriter`` (src/plan.rs:2314-2348): gzip .nt writer. Here: the
  whole serialization is a JVM-side column expression (term_to_nt_col)
  and the write is ``df.write.text(..., compression="gzip")`` — one file
  per partition, so the sink scales with the cluster.

Paths measured and rejected (2-8M-line corpus, this VM, see
scripts/bench_ingest.py):
- per-row Python regex parse (round 1): ~108k lines/s/core;
- pure-JVM columnar parse: the CASE WHEN/struct expression tree
  exceeds Janino's 64 KB generated-method limit, silently falls back
  to interpreted eval and runs ~6x SLOWER than Python;
- pandas ``.str`` kernel: object-dtype string ops are per-row Python
  under the hood (~66k lines/s/core).
The pyarrow kernel runs ~205k lines/s/core (RE2 extract alone: 620k);
in-Spark on this sandbox both it and the per-row path saturate the
text-scan/IO at ~1.1M lines/s on 32 threads — the kernel's 2x/core
CPU advantage pays off where ingest is CPU-bound (a real cluster
reading parallel gzip shards).
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

from .. import terms, vocab

PARSED_SCHEMA = StructType(
    [
        StructField("subject", terms.TERM_SCHEMA),
        StructField("predicate", terms.TERM_SCHEMA),
        StructField("object", terms.TERM_SCHEMA),
    ]
)

# flat (kind, text, num[, dbl, lang, datatype]) columns per term — structs
# are assembled JVM-side (F.struct over flat columns is a tiny projection;
# per-row dicts in Python would dominate the parse cost)
FLAT_SCHEMA = StructType(
    [
        StructField("s_kind", StringType()),
        StructField("s_text", StringType()),
        StructField("s_num", LongType()),
        StructField("p_kind", StringType()),
        StructField("p_text", StringType()),
        StructField("p_num", LongType()),
        StructField("o_kind", StringType()),
        StructField("o_text", StringType()),
        StructField("o_num", LongType()),
        StructField("o_dbl", DoubleType()),
        StructField("o_lang", StringType()),
        StructField("o_dt", StringType()),
    ]
)

_FLAT_PA = pa.schema(
    [
        ("s_kind", pa.string()), ("s_text", pa.string()), ("s_num", pa.int64()),
        ("p_kind", pa.string()), ("p_text", pa.string()), ("p_num", pa.int64()),
        ("o_kind", pa.string()), ("o_text", pa.string()), ("o_num", pa.int64()),
        ("o_dbl", pa.float64()), ("o_lang", pa.string()), ("o_dt", pa.string()),
    ]
)

# One RE2 pass splits a line into its term alternatives. RE2's extract
# returns '' for a non-participating group, so '' doubles as "absent" —
# the only ambiguous inputs are the invalid-RDF pathologies <> (empty
# IRI) and ^^<> (empty datatype IRI), which parse as iri('') / plain
# string instead of being dropped.
_LINE_PAT = (
    r'^\s*(?:<(?P<s_iri>[^>]*)>|(?P<s_blank>_:\S+))\s+<(?P<p_iri>[^>]*)>\s+'
    r'(?:<(?P<o_iri>[^>]*)>|(?P<o_blank>_:\S+)|"(?P<lit>(?:[^"\\]|\\.)*)"'
    r'(?:\^\^<(?P<dt>[^>]*)>|@(?P<lang>[A-Za-z0-9\-]+))?)\s*\.\s*$'
)

_ENTITY_Q = "http://www.wikidata.org/entity/Q"
_PREFIXES = pa.array(vocab.PROPERTY_PREFIXES, pa.string())
_NULL_S = pa.scalar(None, pa.string())
_NULL_L = pa.scalar(None, pa.int64())
_NULL_D = pa.scalar(None, pa.float64())

# f64::from_str acceptance (model.rs:127) in RE2: numbers plus the
# inf/infinity/nan spellings (case-insensitive, optional sign) that both
# Rust f64::from_str and Python float() parse — XSD's INF/-INF/NaN are
# valid xsd:double lexical forms and must become kind 'double', not
# 'typed'. Arrow's string→float64 cast parses all these spellings.
_FLOAT_RE = (
    r"^[+-]?(([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?"
    r"|[iI][nN][fF]([iI][nN][iI][tT][yY])?|[nN][aA][nN])$"
)


def _unescape_arr(arr: pa.Array) -> pa.Array:
    """Apply NT unescaping to the (rare) values containing a backslash;
    O(k) Python on the masked rows, C copy for the rest."""
    mask = pc.match_substring(arr, "\\")
    mask = pc.fill_null(mask, False)
    if not pc.any(mask).as_py():
        return arr
    idx = pc.indices_nonzero(mask)
    fixed = pa.array(
        [terms._unescape_nt(v.as_py()) for v in arr.take(idx)], pa.string()
    )
    return pc.replace_with_mask(arr, mask, fixed)


def _masked_cast(arr: pa.Array, ok: pa.Array, typ) -> pa.Array:
    """Cast only where ``ok``; null elsewhere (arrow cast has no 'try').
    A leading '+' is stripped first — Arrow's numeric parser rejects it
    while XSD (and Python int/float) accept it."""
    cleaned = pc.replace_substring_regex(arr, pattern=r"^\+", replacement="")
    return pc.cast(pc.if_else(ok, cleaned, _NULL_S), typ)


def _iri_fields(iri: pa.Array) -> tuple:
    """(kind, text, num) for IRI values with QID/PID inlining
    (terms.iri, src/model.rs:84-106): one RE2 pass splits a ≤18-digit
    decimal suffix (always i64-safe) from its head; the head is matched
    against entity/Q + the 14 property prefixes."""
    ext = pc.extract_regex(iri, pattern=r"^(?P<h>.*?)(?P<t>[0-9]{1,18})$")
    head = pc.struct_field(ext, 0)
    tail = pc.struct_field(ext, 1)
    has = pc.is_valid(ext)
    is_item = pc.and_kleene(has, pc.equal(head, _ENTITY_Q))
    is_item = pc.fill_null(is_item, False)
    is_prop = pc.and_(pc.fill_null(
        pc.and_kleene(has, pc.is_in(head, value_set=_PREFIXES)), False),
        pc.invert(is_item))
    kind = pc.if_else(is_item, "item", pc.if_else(is_prop, "prop", "iri"))
    text = pc.if_else(is_item, _NULL_S, pc.if_else(is_prop, head, iri))
    num = pc.cast(pc.if_else(pc.or_(is_item, is_prop), tail, _NULL_S),
                  pa.int64())
    return kind, text, num


def _node_fields(iri: pa.Array, blank: pa.Array, seed: str) -> tuple:
    """(kind, text, num) for an iri-or-blank alternative pair."""
    ik, it, inum = _iri_fields(iri)
    is_blank = pc.not_equal(blank, "")
    blank_text = pc.utf8_slice_codeunits(blank, 2)  # drop '_:'
    if seed:
        blank_text = pc.replace_substring_regex(
            blank_text, pattern="^", replacement=seed)
    kind = pc.if_else(is_blank, "blank", ik)
    text = pc.if_else(is_blank, blank_text, it)
    num = pc.if_else(is_blank, _NULL_L, inum)
    return kind, text, num


def _patch_big_ints(lit, dt_is_int, int_ok, lit_kind, o_num, o_text):
    """>18-digit xsd:integer literals: exact per-row int() on the rare
    rows (float64 coercion would silently round near 2^63)."""
    big = pc.and_(pc.and_(dt_is_int, pc.invert(int_ok)),
                  pc.fill_null(pc.match_substring_regex(
                      lit, r"^[+-]?[0-9]{19,}$"), False))
    if not pc.any(big).as_py():
        return lit_kind, o_num, o_text
    idx = pc.indices_nonzero(big)
    vals, kinds = [], []
    for v in lit.take(idx):
        n = int(v.as_py())
        if -(2 ** 63) <= n < 2 ** 63:
            vals.append(n)
            kinds.append("integer")
        else:
            vals.append(None)
            kinds.append("typed")
    lit_kind = pc.replace_with_mask(lit_kind, big, pa.array(kinds, pa.string()))
    o_num = pc.replace_with_mask(o_num, big, pa.array(vals, pa.int64()))
    keep_text = pa.array(
        [v.as_py() if k == "typed" else None for v, k in zip(lit.take(idx), kinds)],
        pa.string())
    o_text = pc.replace_with_mask(o_text, big, keep_text)
    return lit_kind, o_num, o_text


def _parse_batch(batch: pa.RecordBatch, seed: str) -> pa.RecordBatch:
    ext = pc.extract_regex(batch.column(0), pattern=_LINE_PAT)
    ext = ext.filter(pc.is_valid(ext))
    if len(ext) == 0:
        return pa.RecordBatch.from_pylist([], schema=_FLAT_PA)
    s_iri, s_blank, p_iri, o_iri, o_blank, lit, dt, lang = (
        pc.struct_field(ext, i) for i in range(8))
    s_iri = _unescape_arr(s_iri)
    p_iri = _unescape_arr(p_iri)
    o_iri = _unescape_arr(o_iri)
    lit = _unescape_arr(lit)

    s_kind, s_text, s_num = _node_fields(s_iri, s_blank, seed)
    p_kind, p_text, p_num = _iri_fields(p_iri)
    nk, nt_, nn = _node_fields(o_iri, o_blank, seed)

    # the object is a literal iff neither iri nor blank participated
    is_lit = pc.and_(pc.equal(o_iri, ""), pc.equal(o_blank, ""))
    is_lang = pc.not_equal(lang, "")
    int_ok = pc.fill_null(
        pc.match_substring_regex(lit, r"^[+-]?[0-9]{1,18}$"), False)
    dbl_ok = pc.fill_null(pc.match_substring_regex(lit, _FLOAT_RE), False)
    dt_is_int = pc.equal(dt, vocab.XSD_INTEGER)
    lit_kind = pc.if_else(
        is_lang, "langString",
        pc.if_else(pc.or_(pc.equal(dt, ""), pc.equal(dt, vocab.XSD_STRING)),
                   "string",
        pc.if_else(pc.and_(dt_is_int, int_ok), "integer",
        pc.if_else(pc.equal(dt, vocab.XSD_DECIMAL), "decimal",
        pc.if_else(pc.and_(pc.equal(dt, vocab.XSD_DOUBLE), dbl_ok), "double",
        pc.if_else(pc.equal(dt, vocab.XSD_DATE_TIME), "dateTime", "typed"))))))
    lit_is_num = pc.is_in(lit_kind, value_set=pa.array(["integer", "double"]))
    lit_text = pc.if_else(lit_is_num, _NULL_S, lit)
    lit_num = pc.if_else(pc.equal(lit_kind, "integer"),
                         _masked_cast(lit, int_ok, pa.int64()), _NULL_L)
    lit_kind, lit_num, lit_text = _patch_big_ints(
        lit, dt_is_int, int_ok, lit_kind, lit_num, lit_text)

    o_kind = pc.if_else(is_lit, lit_kind, nk)
    o_text = pc.if_else(is_lit, lit_text, nt_)
    o_num = pc.if_else(is_lit, lit_num, nn)
    o_dbl = pc.if_else(
        pc.and_(is_lit, pc.equal(lit_kind, "double")),
        _masked_cast(lit, dbl_ok, pa.float64()), _NULL_D)
    o_lang = pc.if_else(pc.and_(is_lit, is_lang),
                        pc.ascii_lower(lang), _NULL_S)
    o_dt = pc.if_else(pc.and_(is_lit, pc.equal(lit_kind, "typed")),
                      dt, _NULL_S)

    return pa.RecordBatch.from_arrays(
        [s_kind, s_text, s_num, p_kind, p_text, p_num,
         o_kind, o_text, o_num, o_dbl, o_lang, o_dt],
        schema=_FLAT_PA)


def read_ntriples(spark: SparkSession, path: str, seed: str = "",
                  repartition: int | None = None) -> DataFrame:
    """Parse N-Triples text into a statements DataFrame
    (subject, predicate, object term structs + predicate_key).

    ``repartition`` (default: the cluster's default parallelism)
    redistributes lines before the parse — gzip dumps are non-splittable
    (one partition per .gz file; the reference reads one 115 GB gzip
    stream), so without it a single-file dump parses on one core. Pass
    0 to disable."""
    lines = spark.read.text(path)
    n_parts = (spark.sparkContext.defaultParallelism
               if repartition is None else repartition)
    # only shuffle when the scan is actually under-split (gzip: one
    # partition per file); a splittable text file already fans out to
    # ~defaultParallelism scan partitions via maxSplitBytes, so the
    # blanket repartition was a pure extra shuffle of the raw lines
    # (250 MB at the 2M-line bench corpus — guide §2.4)
    if n_parts and lines.rdd.getNumPartitions() < n_parts:
        lines = lines.repartition(n_parts)

    def parse(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            yield _parse_batch(batch, seed)

    flat = lines.mapInArrow(parse, FLAT_SCHEMA)

    def term(prefix: str, with_extras: bool = False) -> F.Column:
        null_s = F.lit(None).cast("string")
        return F.struct(
            F.col(f"{prefix}_kind").alias("kind"),
            F.col(f"{prefix}_text").alias("text"),
            F.col(f"{prefix}_num").alias("num"),
            (F.col(f"{prefix}_dbl") if with_extras
             else F.lit(None).cast("double")).alias("dbl"),
            (F.col(f"{prefix}_lang") if with_extras else null_s).alias("lang"),
            (F.col(f"{prefix}_dt") if with_extras else null_s).alias("datatype"),
        )

    parsed = flat.select(
        term("s").alias("subject"),
        term("p").alias("predicate"),
        term("o", with_extras=True).alias("object"),
    )
    return parsed.withColumn(
        "predicate_key", terms.predicate_key_col(F.col("predicate"))
    )


def triples_to_nt_lines(df: DataFrame) -> DataFrame:
    """Serialize (subject, predicate, object[, annotation_predicate,
    annotation_object]) term-struct columns to N-Triples / N-Triples-star
    lines. RDF★ rows (annotated facts) use the ``<< s p o >> ap ao .``
    embedded-triple syntax (src/model.rs:51-63)."""
    s = terms.term_to_nt_col(F.col("subject"))
    p = terms.term_to_nt_col(F.col("predicate"))
    o = terms.term_to_nt_col(F.col("object"))
    if "annotation_predicate" in df.columns:
        ap = terms.term_to_nt_col(F.col("annotation_predicate"))
        ao = terms.term_to_nt_col(F.col("annotation_object"))
        line = F.when(
            F.col("annotation_predicate").isNotNull(),
            F.concat_ws(" ", F.lit("<<"), s, p, o, F.lit(">>"), ap, ao, F.lit(".")),
        ).otherwise(F.concat_ws(" ", s, p, o, F.lit(".")))
    else:
        line = F.concat_ws(" ", s, p, o, F.lit("."))
    return df.select(line.alias("value"))


def write_ntriples(df: DataFrame, path: str, gzip: bool = True) -> None:
    writer = triples_to_nt_lines(df).write.mode("overwrite")
    if gzip:
        writer = writer.option("compression", "gzip")
    writer.text(path)
