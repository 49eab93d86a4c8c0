"""Schema/shapes output round-trip surfaces (driver-side).

Flattens (a) the shape config and (b) a re-parsed N-Triples graph of
the yago_schema / yago_shapes outputs into comparable fact sets, so the
differential report and tests can score the round trip
config → emit → NT serialize → parse → reconstruct as P/R.

Reference parity: build_yago_shapes src/plan.rs:2079-2202,
build_yago_schema src/plan.rs:1783-1962.
"""

from __future__ import annotations

from .. import vocab
from .shapes import Schema
from .ttl import Graph, Node, schema_from_graph


def shapes_surface_from_config(schema: Schema) -> set:
    """{(target_class, path, datatypes, nodes, max_count, unique_lang,
    pattern)} for every node shape WITH property shapes — exactly the
    SHACL surface build_yago_shapes_triples emits (ys:fromClass /
    fromProperty are Wikidata provenance, not part of the output;
    identical duplicate declarations merge, as the emission does)."""
    targets = {ns.target_class for ns in schema.node_shapes}
    return {
        (ps.parent_shape, ps.path, ps.datatypes, ps.nodes, ps.max_count,
         ps.is_unique_lang, ps.pattern)
        for ps in schema.property_shapes
        if ps.parent_shape in targets
    }


def shapes_surface_from_graph(g: Graph) -> set:
    """Same surface reconstructed from a re-parsed emission graph via
    schema_from_graph — the independent read path."""
    rec = schema_from_graph(g)
    return shapes_surface_from_config(rec)


def schema_surface_from_config(schema: Schema) -> set:
    """Flat facts the OWL schema output must carry: typed classes and
    properties (with the config's ontology gates), their en labels
    (camel-case split), and the exact rdfs:domain / rdfs:range member
    sets (owl:unionOf flattened; langString → PlainLiteral remap)."""
    from ..functions.names import camel_case_to_regular

    have_ontology = bool(schema.classes or schema.properties)
    facts: set = set()
    for ns in schema.node_shapes:
        tc = ns.target_class
        cd = schema.classes.get(tc)
        if have_ontology and cd is None:
            continue
        facts.add(("class", tc))
        label = (cd.label if cd else None) or ns.label or tc.rsplit("/", 1)[-1]
        facts.add(("class_label", tc, camel_case_to_regular(label)))

    domains: dict[str, set] = {}
    ranges: dict[str, set] = {}
    for ps in schema.property_shapes:
        pd = schema.properties.get(ps.path)
        if have_ontology and pd is None:
            continue
        facts.add(("prop", ps.path))
        label = (pd.label if pd else None) or ps.path.rsplit("/", 1)[-1]
        facts.add(("prop_label", ps.path, camel_case_to_regular(label)))
        domains.setdefault(ps.path, set()).add(ps.parent_shape)
        r = ranges.setdefault(ps.path, set())
        for n in ps.nodes:
            r.add(schema.target_class_of(n))
        for dt in ps.datatypes:
            r.add(vocab.RDF_PLAIN_LITERAL if dt == vocab.RDF_LANG_STRING
                  else dt)
    for path, members in domains.items():
        facts.update(("domain", path, m) for m in members)
    for path, members in ranges.items():
        facts.update(("range", path, m) for m in members)
    return facts


def _members(g: Graph, subj: Node, pred: str) -> set:
    out = set()
    for o in g.objects(subj, pred):
        if o.kind == "iri":
            out.add(o.value)
        else:  # owl:unionOf blank node
            head = g.object(o, vocab.OWL_UNION_OF)
            out.update(m.value for m in g.rdf_list(head))
    return out


def schema_surface_from_graph(g: Graph) -> set:
    """The same flat facts pulled out of a re-parsed emission graph."""
    facts: set = set()
    classes = [c for c in g.subjects(vocab.RDF_TYPE,
                                     Node("iri", vocab.OWL_CLASS))
               if c.kind == "iri"]
    for c in classes:
        facts.add(("class", c.value))
        lbl = g.object(c, vocab.RDFS_LABEL)
        if lbl is not None:
            facts.add(("class_label", c.value, lbl.value))
    prop_types = (vocab.OWL_OBJECT_PROPERTY, vocab.OWL_DATATYPE_PROPERTY,
                  vocab.RDF_PROPERTY)
    props = {p for t in prop_types
             for p in g.subjects(vocab.RDF_TYPE, Node("iri", t))
             if p.kind == "iri"}
    for p in props:
        facts.add(("prop", p.value))
        lbl = g.object(p, vocab.RDFS_LABEL)
        if lbl is not None:
            facts.add(("prop_label", p.value, lbl.value))
        facts.update(("domain", p.value, m)
                     for m in _members(g, p, vocab.RDFS_DOMAIN))
        facts.update(("range", p.value, m)
                     for m in _members(g, p, vocab.RDFS_RANGE))
    return facts
