"""Unit tests for the term model — N-Triples round trip, QID inlining,
serialization goldens (reference behaviors: src/model.rs, and the
roundtrip test at src/partitioned_statements.rs:305-327)."""

from __future__ import annotations

from yago4_spark import terms, vocab


def test_iri_inlining_item():
    t = terms.iri("http://www.wikidata.org/entity/Q42")
    assert t["kind"] == "item" and t["num"] == 42


def test_iri_inlining_property_prefixes():
    t = terms.iri("http://www.wikidata.org/prop/direct/P279")
    assert t["kind"] == "prop" and t["num"] == 279
    assert t["text"] == "http://www.wikidata.org/prop/direct/P279"[:-4] + "P"
    t2 = terms.iri("http://www.wikidata.org/prop/statement/value/P569")
    assert t2["kind"] == "prop" and t2["num"] == 569
    # non-numeric tail falls back to plain IRI (model.rs:88-91)
    t3 = terms.iri("http://www.wikidata.org/entity/Q42abc")
    assert t3["kind"] == "iri"


def test_iri_non_wikidata_passthrough():
    t = terms.iri("http://schema.org/Person")
    assert t["kind"] == "iri" and t["text"] == "http://schema.org/Person"


def test_serialize_goldens():
    assert terms.term_to_nt_py(terms.item(42)) == "<http://www.wikidata.org/entity/Q42>"
    assert (
        terms.term_to_nt_py(terms.prop(279))
        == "<http://www.wikidata.org/prop/direct/P279>"
    )
    assert terms.term_to_nt_py(terms.string('say "hi"\n')) == '"say \\"hi\\"\\n"'
    assert (
        terms.term_to_nt_py(terms.integer(-7))
        == '"-7"^^<http://www.w3.org/2001/XMLSchema#integer>'
    )
    assert (
        terms.term_to_nt_py(terms.decimal("1.50"))
        == '"1.50"^^<http://www.w3.org/2001/XMLSchema#decimal>'
    )
    assert (
        terms.term_to_nt_py(terms.lang_string("Berlin", "en")) == '"Berlin"@en'
    )
    assert terms.term_to_nt_py(terms.blank("b1")) == "_:b1"


def test_format_f64_rust_display():
    # Rust {} f64 Display: shortest roundtrip, no exponents.
    assert terms.format_f64(1.0) == "1"  # Rust {} prints integral f64 bare
    assert terms.format_f64(-3.0) == "-3"
    assert terms.format_f64(0.1) == "0.1"
    assert terms.format_f64(1e21) == "1000000000000000000000"
    assert terms.format_f64(1.5e-5) == "0.000015"
    assert float(terms.format_f64(52.52437)) == 52.52437


def test_parse_nt_roundtrip():
    lines = [
        '<http://www.wikidata.org/entity/Q42> <http://www.w3.org/2000/01/rdf-schema#label> "Douglas Adams"@en .',
        '<http://example.com/s> <http://example.com/p> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        '_:b0 <http://example.com/p> "a\\nb" .',
        "# comment",
        "",
        "<malformed",
    ]
    parsed = [terms.parse_nt_line(ln) for ln in lines]
    assert parsed[0] is not None
    s, p, o = parsed[0]
    assert s["kind"] == "item" and s["num"] == 42
    assert o["kind"] == "langString" and o["lang"] == "en"
    s, p, o = parsed[1]
    assert o["kind"] == "integer" and o["num"] == 42
    s, p, o = parsed[2]
    assert s["kind"] == "blank" and o["text"] == "a\nb"
    assert parsed[3] is None and parsed[4] is None and parsed[5] is None
    # serialize → parse → serialize is stable
    line = " ".join(terms.term_to_nt_py(t) for t in parsed[0]) + " ."
    re_parsed = terms.parse_nt_line(line)
    assert re_parsed == parsed[0]


def test_unicode_escape_parse():
    # the reference's roundtrip test uses a \u-escaped lang literal
    # (src/partitioned_statements.rs:305-327)
    line = '<http://e.com/s> <http://e.com/p> "caf\\u00E9"@fr .'
    _, _, o = terms.parse_nt_line(line)
    assert o["text"] == "café"


def test_predicate_key():
    assert terms.predicate_key_py(terms.prop(279)) == "wdt:P279"
    assert (
        terms.predicate_key_py(terms.prop(569, "http://www.wikidata.org/prop/P"))
        == "p:P569"
    )
    assert terms.predicate_key_py(terms.iri(vocab.RDF_TYPE)) == "rdf:type"
    assert terms.predicate_key_py(terms.iri("http://x.y/weird pred")).startswith("iri:")


def test_spark_serializer_matches_python(spark):
    rows = [
        (terms.item(42),),
        (terms.prop(279),),
        (terms.iri("http://schema.org/Person"),),
        (terms.blank("b1"),),
        (terms.string('q"uote\\'),),
        (terms.integer(-5),),
        (terms.decimal("2.50"),),
        (terms.date_time("1952-03-11T00:00:00+00:00"),),
        (terms.lang_string("Berlin", "de"),),
        (terms.typed("PT1S", vocab.XSD_DURATION),),
    ]
    from pyspark.sql.types import StructField, StructType

    df = spark.createDataFrame(
        [tuple(r) for r in rows],
        StructType([StructField("t", terms.TERM_SCHEMA)]),
    )
    got = [r[0] for r in df.select(terms.term_to_nt_col(df["t"])).collect()]
    want = [terms.term_to_nt_py(r[0]) for r in rows]
    assert got == want


def test_spark_predicate_key_matches_python(spark):
    from pyspark.sql.types import StructField, StructType

    preds = [
        terms.prop(279),
        terms.prop(569, "http://www.wikidata.org/prop/P"),
        terms.iri(vocab.RDF_TYPE),
        terms.iri(vocab.WIKIBASE_TIME_VALUE),
        terms.iri("http://x.y/weird pred"),
    ]
    df = spark.createDataFrame(
        [(p,) for p in preds], StructType([StructField("t", terms.TERM_SCHEMA)])
    )
    got = [r[0] for r in df.select(terms.predicate_key_col(df["t"])).collect()]
    want = [terms.predicate_key_py(p) for p in preds]
    assert got == want
