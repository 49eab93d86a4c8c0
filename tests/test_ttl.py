"""Tests for the driver-side Turtle subset parser + shape-config loader
(pure Python, no Spark). The sample TTL uses the reference's config
vocabulary (schema.rs:188-301) with our own content."""

from __future__ import annotations

from yago4_spark import vocab
from yago4_spark.plans.ttl import parse_turtle, schema_from_turtle

SAMPLE = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ys: <http://yago-knowledge.org/schema#> .
@prefix schema: <http://schema.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix wd: <http://www.wikidata.org/entity/> .
@prefix wdt: <http://www.wikidata.org/prop/direct/> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .

# a node shape with two property shapes
schema:PersonShape a sh:NodeShape ;
    sh:targetClass schema:Person ;
    rdfs:label "Person" ;
    ys:fromClass wd:Q5 ;
    sh:property [
        sh:path schema:birthDate ;
        ys:fromProperty wdt:P569 ;
        sh:maxCount 1 ;
        sh:or ( [ sh:datatype xsd:date ] [ sh:datatype xsd:dateTime ] ) ;
    ] , [
        sh:path schema:spouse ;
        ys:fromProperty wdt:P26 ;
        sh:node schema:PersonShape ;
    ] .

schema:WorkShape a sh:NodeShape ;
    sh:targetClass schema:CreativeWork ;
    ys:fromClass wd:Q17537576 ;
    sh:property [
        sh:path schema:issn ;
        ys:fromProperty wdt:P236 ;
        sh:datatype xsd:string ;
        sh:pattern "^[0-9]{4}-[0-9]{3}[0-9X]$" ;
        sh:uniqueLang true ;
    ] .

[] a ys:AnnotationPropertyShape ;
    sh:path schema:startDate ;
    ys:fromProperty <http://www.wikidata.org/prop/direct/P580> ;
    sh:datatype xsd:date .

schema:Person rdfs:subClassOf schema:Thing .
schema:Person owl:disjointWith schema:CreativeWork .
schema:CreativeWork owl:disjointWith schema:Person .
"""


REF_DATA = "/root/reference/src/data"
REF_FILES = ["schema.ttl", "shapes.ttl", "bioschemas.ttl", "shapes-bio.ttl"]


def _ref_available():
    import os
    return all(os.path.exists(f"{REF_DATA}/{f}") for f in REF_FILES)


def test_real_config_parse_counts():
    """The full reference config (Schema::open(), schema.rs:68-74) must
    load: 262 + 6 bio NodeShapes, 205 + 13 bio sh:property shapes —
    target_class defaults to the shape IRI (schema.rs:118-126)."""
    import pytest
    if not _ref_available():
        pytest.skip("reference config not present")
    from yago4_spark.plans.ttl import load_schema

    s = load_schema([f"{REF_DATA}/{f}" for f in REF_FILES])
    assert len(s.node_shapes) == 268
    assert len(s.property_shapes) == 218
    assert len(s.annotation_shapes) == 2
    # every node shape got its target class from the shape IRI itself
    assert all(ns.target_class == ns.id for ns in s.node_shapes)
    # ontology objects loaded from schema.ttl
    assert len(s.classes) > 800 and len(s.properties) > 1300
    thing = s.classes["http://schema.org/Thing"]
    assert thing.comment and "most generic type" in thing.comment

    by_path = {}
    for ps in s.property_shapes:
        by_path.setdefault(ps.path, []).append(ps)
    # label family → direct predicate scans, not PID statement scans
    label = [p for p in by_path[vocab.RDFS_LABEL]
             if p.parent_shape == "http://schema.org/Thing"][0]
    assert label.from_predicates == ("skos:prefLabel",)
    assert label.from_properties == ()
    assert label.is_unique_lang
    # dates arrive via sh:or of 4 datatypes (Person/birthDate)
    bd = [p for p in by_path["http://schema.org/birthDate"]
          if p.parent_shape == "http://schema.org/Person"][0]
    assert bd.from_properties == (569,)
    assert len(bd.datatypes) == 4 and bd.max_count == 1
    # ISSN pattern survives
    issn = by_path["http://schema.org/issn"][0]
    assert issn.pattern == "^[0-9]{4}-[0-9]{3}[0-9X]$"
    # disjointness: the 5 top classes from shapes.ttl, symmetric-deduped
    assert len(s.disjoint) == 9
    # subclass surface follows subclass_of_from_yago_schema
    # (plan.rs:2224-2248): only node-shape targets, no StructuredValue
    # or Series parents, Intangible remapped to Thing
    parents = {p for _, p in s.super_classes}
    assert "http://schema.org/StructuredValue" not in parents
    assert "http://schema.org/Series" not in parents
    assert "http://schema.org/Intangible" not in parents
    children = {c for c, _ in s.super_classes}
    targets = {ns.target_class for ns in s.node_shapes}
    assert children <= targets


def test_parse_turtle_triples():
    g = parse_turtle(SAMPLE)
    assert len(g.triples) > 15
    # prefixed names resolved
    subs = {s.value for s, _, _ in g.triples if s.kind == "iri"}
    assert "http://schema.org/PersonShape" in subs


def test_schema_from_turtle():
    schema = schema_from_turtle(SAMPLE, min_instances=2)
    person = schema.node_shape("http://schema.org/Person")
    assert person.from_classes == (5,)
    assert person.label == "Person"

    props = {p.path: p for p in schema.property_shapes}
    bd = props["http://schema.org/birthDate"]
    assert bd.from_properties == (569,)
    assert bd.max_count == 1
    assert set(bd.datatypes) == {vocab.XSD_DATE, vocab.XSD_DATE_TIME}
    assert bd.parent_shape == "http://schema.org/Person"

    sp = props["http://schema.org/spouse"]
    # sh:node references the *shape*; facts dispatch resolves shapes by
    # target class, so the loader records the shape IRI here
    assert sp.nodes == ("http://schema.org/PersonShape",)

    issn = props["http://schema.org/issn"]
    assert issn.pattern == "^[0-9]{4}-[0-9]{3}[0-9X]$"
    assert issn.is_unique_lang

    assert len(schema.annotation_shapes) == 1
    ann = schema.annotation_shapes[0]
    assert ann.path == "http://schema.org/startDate"
    assert ann.from_properties == (580,)

    assert ("http://schema.org/Person", "http://schema.org/Thing") in schema.super_classes
    assert schema.disjoint == [
        ("http://schema.org/Person", "http://schema.org/CreativeWork")
    ]
