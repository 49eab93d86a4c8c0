"""Schema/shapes output round-trip oracle (VERDICT r03 item 6).

The two driver-side outputs (yago_schema, yago_shapes) were golden-
tested but outside the volume differential. Independent check: emit the
triples, serialize through the REAL N-Triples sink path
(triples_to_nt_lines), parse the text BACK through the Turtle parser
(plans/ttl.py — a different code path from the emitter), and assert the
reconstruction matches the source config exactly:

- yago_shapes: schema_from_graph over the re-parsed triples rebuilds
  every NodeShape + PropertyShape constraint surface (datatypes incl.
  sh:or lists, nodes, maxCount, uniqueLang, pattern) for all 200+ real
  config shapes, byte-identical to the loaded config.
- yago_schema: class/property sets count-match the config gates, labels
  round-trip through camel_case_to_regular, and every rdfs:domain /
  rdfs:range owl:unionOf list reconstructs its exact member set.

Reference parity: build_yago_shapes src/plan.rs:2079-2202,
build_yago_schema src/plan.rs:1783-1962, config load src/schema.rs.
"""

from __future__ import annotations

import os

import pytest

from yago4_spark import vocab
from yago4_spark.plans.outputs import (
    build_yago_schema_triples,
    build_yago_shapes_triples,
)
from yago4_spark.plans.shapes import Schema, sample_schema
from yago4_spark.plans.ttl import Graph, Node, parse_turtle, schema_from_graph
from yago4_spark.sources.ntriples import triples_to_nt_lines

REF = "/root/reference/src/data"
FILES = ["schema.ttl", "shapes.ttl", "bioschemas.ttl", "shapes-bio.ttl"]


def nt_text(df) -> str:
    return "\n".join(r["value"] for r in triples_to_nt_lines(df).collect())


def shape_surface(schema: Schema, only_with_props: bool) -> dict:
    """target_class → sorted constraint tuples — the exact surface
    build_yago_shapes_triples emits (ys:fromClass/fromProperty are
    Wikidata provenance, not part of the SHACL output)."""
    by_parent: dict[str, list] = {}
    for ps in schema.property_shapes:
        by_parent.setdefault(ps.parent_shape, []).append(ps)
    out = {}
    for ns in schema.node_shapes:
        props = by_parent.get(ns.target_class, [])
        if not props and only_with_props:
            continue
        # set-dedup: the real config declares Event/composer twice with
        # identical constraints; emission merges them into one
        # PropertyShape node (same shape-prop IRI), as the reference does
        out[ns.target_class] = sorted({
            (ps.path, ps.datatypes, ps.nodes, ps.max_count,
             ps.is_unique_lang, ps.pattern)
            for ps in props
        })
    return out


def range_members(g: Graph, subj: Node, pred: str) -> set:
    members = set()
    for o in g.objects(subj, pred):
        if o.kind == "iri":
            members.add(o.value)
        else:  # owl:unionOf blank
            head = g.object(o, vocab.OWL_UNION_OF)
            members.update(m.value for m in g.rdf_list(head))
    return members


def load_real_schema():
    if not all(os.path.exists(f"{REF}/{f}") for f in FILES):
        pytest.skip("reference config not present")
    from yago4_spark.plans.ttl import load_schema

    return load_schema([f"{REF}/{f}" for f in FILES])


@pytest.mark.parametrize("which", ["sample", "real"])
def test_shapes_roundtrip(spark, which):
    schema = sample_schema() if which == "sample" else load_real_schema()
    text = nt_text(build_yago_shapes_triples(spark, schema))
    rec = schema_from_graph(parse_turtle(text))

    orig = shape_surface(schema, only_with_props=True)
    got = shape_surface(rec, only_with_props=False)
    assert set(got) == set(orig), (
        set(orig) ^ set(got))
    for tc in orig:
        assert got[tc] == orig[tc], (tc, orig[tc], got[tc])
    # every emitted NodeShape reconstructs (scale gate: the real config
    # has 268 node shapes, 49 of which carry its 218 property shapes —
    # 217 distinct after the Event/composer duplicate merges)
    if which == "real":
        assert len(got) == 49
        n_props = sum(len(v) for v in orig.values())
        assert sum(len(v) for v in got.values()) == n_props == 217


@pytest.mark.parametrize("which", ["sample", "real"])
def test_schema_roundtrip(spark, which):
    from yago4_spark.functions.names import camel_case_to_regular

    schema = sample_schema() if which == "sample" else load_real_schema()
    text = nt_text(build_yago_schema_triples(spark, schema))
    g = parse_turtle(text)

    have_ontology = bool(schema.classes or schema.properties)

    # class set count-matches the config gate (plan.rs:1789-1849)
    got_classes = {c.value for c in
                   g.subjects(vocab.RDF_TYPE, Node("iri", vocab.OWL_CLASS))
                   if c.kind == "iri"}
    expect_classes = {
        ns.target_class for ns in schema.node_shapes
        if not have_ontology or ns.target_class in schema.classes
    }
    assert got_classes == expect_classes

    # property set count-matches the config gate (plan.rs:1851-1925)
    prop_types = (vocab.OWL_OBJECT_PROPERTY, vocab.OWL_DATATYPE_PROPERTY,
                  vocab.RDF_PROPERTY)
    got_props = {p.value for t in prop_types
                 for p in g.subjects(vocab.RDF_TYPE, Node("iri", t))
                 if p.kind == "iri"}
    expect_props = {
        ps.path for ps in schema.property_shapes
        if not have_ontology or ps.path in schema.properties
    }
    assert got_props == expect_props

    # labels round-trip through camel_case_to_regular (incl. escaping)
    for cls in sorted(got_classes):
        lbl = g.object(Node("iri", cls), vocab.RDFS_LABEL)
        cd = schema.classes.get(cls)
        src = (cd.label if cd and cd.label else None)
        if src is None:
            ns = next(n for n in schema.node_shapes if n.target_class == cls)
            src = ns.label or cls.rsplit("/", 1)[-1]
        assert lbl is not None and lbl.value == camel_case_to_regular(src)

    # every rdfs:domain / rdfs:range union reconstructs its member set
    domains: dict[str, set] = {}
    obj_ranges: dict[str, set] = {}
    dt_ranges: dict[str, set] = {}
    for ps in schema.property_shapes:
        if ps.path not in expect_props:
            continue
        domains.setdefault(ps.path, set()).add(ps.parent_shape)
        for n in ps.nodes:
            obj_ranges.setdefault(ps.path, set()).add(
                schema.target_class_of(n))
        for dt in ps.datatypes:
            dt_ranges.setdefault(ps.path, set()).add(
                vocab.RDF_PLAIN_LITERAL if dt == vocab.RDF_LANG_STRING
                else dt)
    for path in sorted(expect_props):
        subj = Node("iri", path)
        assert range_members(g, subj, vocab.RDFS_DOMAIN) == domains[path], path
        expect_range = obj_ranges.get(path, set()) | dt_ranges.get(path, set())
        assert range_members(g, subj, vocab.RDFS_RANGE) == expect_range, path


@pytest.mark.parametrize("which", ["sample", "real"])
def test_surface_functions_roundtrip(spark, which):
    """The library surface extractors (used by differential_report.py's
    two round-trip rows) agree: config-derived surface == surface pulled
    from the re-parsed NT emission, for both outputs."""
    from yago4_spark.plans.roundtrip import (
        schema_surface_from_config,
        schema_surface_from_graph,
        shapes_surface_from_config,
        shapes_surface_from_graph,
    )

    schema = sample_schema() if which == "sample" else load_real_schema()

    g = parse_turtle(nt_text(build_yago_shapes_triples(spark, schema)))
    assert shapes_surface_from_graph(g) == shapes_surface_from_config(schema)

    g2 = parse_turtle(nt_text(build_yago_schema_triples(spark, schema)))
    got, exp = schema_surface_from_graph(g2), schema_surface_from_config(schema)
    assert got == exp, (sorted(exp - got)[:5], sorted(got - exp)[:5])
