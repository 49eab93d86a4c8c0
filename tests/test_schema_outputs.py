"""Tests for the OWL schema / SHACL shapes triple emission, incl. RDF
list cons-cells with deterministic blank labels (reference:
src/plan.rs:1783-2202, 1965-2029)."""

from __future__ import annotations

from yago4_spark import terms, vocab
from yago4_spark.plans.outputs import (
    build_yago_schema_triples,
    build_yago_shapes_triples,
)
from yago4_spark.plans.shapes import sample_schema

S = vocab.SCHEMA


def triples(df):
    return {
        tuple(
            terms.term_to_nt_py(r[c].asDict())
            for c in ("subject", "predicate", "object")
        )
        for r in df.collect()
    }


def test_schema_output(spark):
    got = triples(build_yago_schema_triples(spark, sample_schema()))
    assert (f"<{S}Person>", f"<{vocab.RDF_TYPE}>",
            "<http://www.w3.org/2002/07/owl#Class>") in got
    # camel-case label split
    assert (f"<{S}CreativeWork>", f"<{vocab.RDFS_LABEL}>",
            '"creative work"@en') in got
    assert (f"<{S}birthDate>", f"<{vocab.RDFS_LABEL}>", '"birth date"@en') in got
    # object vs datatype property typing
    assert (f"<{S}spouse>", f"<{vocab.RDF_TYPE}>",
            "<http://www.w3.org/2002/07/owl#ObjectProperty>") in got
    assert (f"<{S}issn>", f"<{vocab.RDF_TYPE}>",
            "<http://www.w3.org/2002/07/owl#DatatypeProperty>") in got
    # single range plain, multi range via owl:unionOf list
    assert (f"<{S}issn>", f"<{vocab.RDFS}range>",
            "<http://www.w3.org/2001/XMLSchema#string>") in got
    union_edges = [g for g in got
                   if g[0] == f"<{S}birthDate>" and "range" in g[1]]
    assert len(union_edges) == 1 and union_edges[0][2].startswith("_:")
    # the union's RDF list is complete and nil-terminated; cons-cell
    # labels are keyed by the member set (add_list_object semantics)
    firsts = [g for g in got if g[1] == f"<{vocab.RDF_FIRST}>"
              and g[0].startswith("_:list-xsd-")]
    assert len(firsts) == 4  # 4 date datatypes
    assert any(g[2] == f"<{vocab.RDF_NIL}>" for g in got
               if g[1] == f"<{vocab.RDF_REST}>")


def test_schema_output_real_config(spark):
    """With the full ontology loaded (schema.ttl), the schema output
    emits rdfs:comment, owl:inverseOf, owl:FunctionalProperty and the
    Intangible/Enumeration→Thing remap, and gates on rdfs:Class /
    rdf:Property existence (src/plan.rs:1783-1925)."""
    import os

    import pytest

    ref = "/root/reference/src/data"
    files = ["schema.ttl", "shapes.ttl", "bioschemas.ttl", "shapes-bio.ttl"]
    if not all(os.path.exists(f"{ref}/{f}") for f in files):
        pytest.skip("reference config not present")
    from yago4_spark.plans.ttl import load_schema

    schema = load_schema([f"{ref}/{f}" for f in files])
    got = triples(build_yago_schema_triples(spark, schema))

    # class comment from schema.ttl, verbatim
    person_comments = [g for g in got
                       if g[0] == f"<{S}Person>" and "comment" in g[1]]
    assert len(person_comments) == 1
    assert "A person" in person_comments[0][2]
    # property comment + functional (birthDate has sh:maxCount 1)
    assert any(g[0] == f"<{S}birthDate>" and "comment" in g[1] for g in got)
    assert (f"<{S}birthDate>", f"<{vocab.RDF_TYPE}>",
            "<http://www.w3.org/2002/07/owl#FunctionalProperty>") in got
    # owl:inverseOf via schema:inverseOf (alumniOf ↔ alumni)
    inv = {(g[0], g[2]) for g in got if g[1] == f"<{vocab.OWL_INVERSE_OF}>"}
    assert (f"<{S}alumniOf>", f"<{S}alumni>") in inv
    # subclass remap: nothing may point at Intangible / StructuredValue
    parents = {g[2] for g in got if g[1] == f"<{vocab.RDFS_SUBCLASS_OF}>"}
    assert f"<{S}Intangible>" not in parents
    assert f"<{S}StructuredValue>" not in parents
    # gating: rdfs:label is not an rdf:Property in schema.ttl → skipped
    assert not any(g[0] == f"<{vocab.RDFS_LABEL}>" for g in got)
    # datatype range remap: rdf:langString → rdf:PlainLiteral
    objs = {g[2] for g in got}
    assert f"<{vocab.RDF_LANG_STRING}>" not in objs


def test_shapes_output(spark):
    got = triples(build_yago_shapes_triples(spark, sample_schema()))
    YV = vocab.YAGO_VALUE_PREFIX
    # the NodeShape subject is the target class itself (plan.rs:2086-2095)
    assert (f"<{S}Person>", f"<{vocab.SH}targetClass>", f"<{S}Person>") in got
    assert (f"<{S}Person>", f"<{vocab.RDF_TYPE}>",
            f"<{vocab.SH}NodeShape>") in got
    # property shape id: {yagov}shape-prop-{target}-{path} linked via
    # sh:property (plan.rs:2097-2111)
    bd_shape = f"<{YV}shape-prop-schema-Person-schema-birthDate>"
    assert (f"<{S}Person>", f"<{vocab.SH}property>", bd_shape) in got
    assert (bd_shape, f"<{vocab.SH}path>", f"<{S}birthDate>") in got
    assert (bd_shape, f"<{vocab.SH}maxCount>",
            '"1"^^<http://www.w3.org/2001/XMLSchema#integer>') in got
    issn_shape = f"<{YV}shape-prop-schema-Periodical-schema-issn>"
    assert any(g[0] == issn_shape and g[1] == f"<{vocab.SH}pattern>"
               and g[2] == '"^[0-9]{4}-[0-9]{3}[0-9X]$"' for g in got) or any(
        g[1] == f"<{vocab.SH}pattern>"
        and g[2] == '"^[0-9]{4}-[0-9]{3}[0-9X]$"' for g in got)
    # sh:or list members are {yagov}sh-datatype-... IRIs (plan.rs:2126-2145)
    or_heads = [g for g in got
                if g[0] == bd_shape and g[1] == f"<{vocab.SH}or>"]
    assert len(or_heads) == 1 and or_heads[0][2].startswith("_:list-")
    member_dts = {g[2] for g in got
                  if g[1] == f"<{vocab.SH}datatype>"
                  and g[0].startswith(f"<{YV}sh-datatype-")}
    assert member_dts == {
        f"<{vocab.XSD_DATE_TIME}>", f"<{vocab.XSD_DATE}>",
        f"<{vocab.XSD_G_YEAR_MONTH}>", f"<{vocab.XSD_G_YEAR}>",
    }
    # deterministic: two builds emit identical triples
    again = triples(build_yago_shapes_triples(spark, sample_schema()))
    assert got == again
