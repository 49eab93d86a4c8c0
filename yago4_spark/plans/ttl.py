"""Minimal driver-side Turtle parser + SHACL shape-config loader.

The reference embeds 21k lines of Turtle and parses it with rio
(src/schema.rs:68-74,319-346); its config vocabulary is SHACL plus
``ys:fromClass`` / ``ys:fromProperty`` / ``ys:AnnotationPropertyShape``
(src/vocab.rs:290-298). rdflib is not in this sandbox, so this is a
small Turtle-subset parser sufficient for that config surface:

- @prefix declarations, prefixed names, <IRIs>, ``a``
- ``;`` predicate lists, ``,`` object lists
- anonymous blank nodes ``[ ... ]`` (used by sh:property)
- RDF collections ``( ... )`` (used by sh:or)
- string / long-string (``\"\"\"...\"\"\"``) / integer / boolean literals
- labeled blank nodes ``_:label`` (so the pipeline's own N-Triples
  output re-parses — the schema/shapes round-trip oracle,
  tests/test_shapes_roundtrip.py)

Multi-file load mirrors ``Schema::open()`` (src/schema.rs:68-74): all
config files merge into ONE graph — schema.ttl supplies the rdfs:Class /
rdf:Property ontology (labels, comments, subclass, disjoint, inverse)
that the shapes files reference.

Driver-side only (config-sized data) — never on executors.
"""

from __future__ import annotations

import itertools
import re
from pathlib import Path

from .. import terms, vocab
from .shapes import (
    AnnotationShape,
    ClassDef,
    NodeShape,
    PropertyDef,
    PropertyShape,
    Schema,
)

_TOKEN = re.compile(
    r"""
      (?P<comment>\#[^\n]*)
    | (?P<iri><[^>]*>)
    | (?P<longstring>\"{3}(?:\"{0,2}(?:[^"\\]|\\.))*\"{3})
    | (?P<string>"(?:[^"\\]|\\.)*")
    | (?P<kw>@prefix|@base)
    | (?P<dtsuffix>\^\^)
    | (?P<langtag>@[A-Za-z][A-Za-z0-9\-]*)
    | (?P<punct>[;,.\[\]()])
    | (?P<a>\ba\b)
    | (?P<boolean>\btrue\b|\bfalse\b)
    | (?P<number>[+-]?\d+(?:\.\d+)?)
    | (?P<pname>[A-Za-z_][\w\-.]*)?:(?P<local>[\w\-.%]*)
    | (?P<ws>\s+)
    """,
    re.VERBOSE,
)

_ESCAPE = re.compile(r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|[tbnrf\"'\\])")
_ESCAPE_MAP = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
               '"': '"', "'": "'", "\\": "\\"}


def _unescape(raw: str) -> str:
    """Turtle/N-Triples string unescaping (ECHAR + UCHAR)."""
    def sub(m: re.Match) -> str:
        e = m.group(1)
        if e[0] in "uU":
            return chr(int(e[1:], 16))
        return _ESCAPE_MAP[e]

    return _ESCAPE.sub(sub, raw)


RDF_FIRST = vocab.RDF_FIRST
RDF_REST = vocab.RDF_REST
RDF_NIL = vocab.RDF_NIL


class Node:
    __slots__ = ("kind", "value")

    def __init__(self, kind: str, value: str):
        self.kind = kind        # iri | blank | literal
        self.value = value

    def __eq__(self, other):
        return (isinstance(other, Node)
                and self.kind == other.kind and self.value == other.value)

    def __hash__(self):
        return hash((self.kind, self.value))

    def __repr__(self):
        return f"Node({self.kind!r}, {self.value!r})"


def _tokenize(text: str):
    pos = 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            raise ValueError(f"TTL tokenize error at {text[pos:pos+40]!r}")
        pos = m.end()
        if m.lastgroup in ("ws", "comment"):
            continue
        yield m


class TurtleParser:
    def __init__(self, text: str, blank_prefix: str = ""):
        self.tokens = list(_tokenize(text))
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.triples: list[tuple[Node, Node, Node]] = []
        self._blank_ids = itertools.count()
        # distinguishes blank labels across merged files (the reference
        # seeds rio's blank labels with a per-file hash, schema.rs:326-329)
        self._blank_prefix = blank_prefix

    def _peek(self):
        return self.tokens[self.i] if self.i < len(self.tokens) else None

    def _next(self):
        t = self.tokens[self.i]
        self.i += 1
        return t

    def parse(self) -> list[tuple[Node, Node, Node]]:
        while self._peek() is not None:
            t = self._peek()
            if t.group("kw") == "@prefix":
                self._next()
                p = self._next()
                prefix = p.group("pname") or ""
                iri_tok = self._next()
                self.prefixes[prefix] = iri_tok.group("iri")[1:-1]
                dot = self._next()
                assert dot.group("punct") == ".", "expected . after @prefix"
            else:
                subj = self._parse_node()
                self._parse_predicate_object_list(subj)
                dot = self._next()
                assert dot.group("punct") == ".", (
                    f"expected . got {dot.group(0)!r}"
                )
        return self.triples

    def _new_blank(self) -> Node:
        return Node("blank", f"_:{self._blank_prefix}b{next(self._blank_ids)}")

    def _parse_node(self) -> Node:
        t = self._next()
        if t.group("iri"):
            return Node("iri", t.group("iri")[1:-1])
        if t.group("longstring") or t.group("string"):
            raw = t.group("longstring")
            raw = raw[3:-3] if raw else t.group("string")[1:-1]
            # consume optional ^^datatype / @lang (ignored for config use)
            nxt = self._peek()
            if nxt is not None and nxt.group("dtsuffix"):
                self._next()
                self._parse_node()  # the datatype IRI
            elif nxt is not None and nxt.group("langtag"):
                self._next()
            return Node("literal", _unescape(raw))
        if t.group("a"):
            return Node("iri", vocab.RDF_TYPE)
        if t.group("boolean"):
            return Node("literal", t.group("boolean"))
        if t.group("number"):
            return Node("literal", t.group("number"))
        if t.group("local") is not None and t.group(0).find(":") != -1:
            prefix = t.group("pname") or ""
            if prefix == "_":  # labeled blank node (N-Triples `_:label`)
                return Node("blank", f"_:{t.group('local')}")
            base = self.prefixes.get(prefix)
            if base is None:
                raise ValueError(f"unknown prefix {prefix!r}")
            return Node("iri", base + t.group("local"))
        if t.group("punct") == "[":
            b = self._new_blank()
            if self._peek() and self._peek().group("punct") == "]":
                self._next()
                return b
            self._parse_predicate_object_list(b)
            close = self._next()
            assert close.group("punct") == "]"
            return b
        if t.group("punct") == "(":
            items = []
            while self._peek() and self._peek().group("punct") != ")":
                items.append(self._parse_node())
            self._next()  # )
            return self._emit_list(items)
        raise ValueError(f"unexpected token {t.group(0)!r}")

    def _emit_list(self, items: list[Node]) -> Node:
        head: Node = Node("iri", RDF_NIL)
        for item in reversed(items):
            cell = self._new_blank()
            self.triples.append((cell, Node("iri", RDF_FIRST), item))
            self.triples.append((cell, Node("iri", RDF_REST), head))
            head = cell
        return head

    def _parse_predicate_object_list(self, subj: Node) -> None:
        while True:
            pred = self._parse_node()
            while True:
                obj = self._parse_node()
                self.triples.append((subj, pred, obj))
                if self._peek() and self._peek().group("punct") == ",":
                    self._next()
                    continue
                break
            if self._peek() and self._peek().group("punct") == ";":
                self._next()
                if self._peek() and self._peek().group("punct") in (".", "]"):
                    break
                continue
            break


class Graph:
    """Indexed triple store — the 21k-line config yields ~17k triples and
    the shape loader issues thousands of lookups, so (s,p)→o and
    (p,o)→s hash indexes replace the previous linear scans."""

    def __init__(self, triples: list[tuple[Node, Node, Node]]):
        # Set semantics like the reference's SimpleGraph
        # (HashSet<YagoTriple>, schema.rs:313-314): a triple restated
        # across merged config files must not duplicate ClassDef
        # super_classes, (predicate_key, sid) scan pairs, or sh:datatype
        # lists (a duplicated singleton datatype would otherwise miss its
        # dispatch branch). Order-preserving dedupe.
        self.triples = list(dict.fromkeys(triples))
        triples = self.triples
        self._spo: dict[tuple[Node, str], list[Node]] = {}
        self._pos: dict[tuple[str, Node], list[Node]] = {}
        for s, p, o in triples:
            if p.kind == "iri":
                self._spo.setdefault((s, p.value), []).append(o)
                self._pos.setdefault((p.value, o), []).append(s)

    def objects(self, s: Node, p_iri: str) -> list[Node]:
        return self._spo.get((s, p_iri), [])

    def object(self, s: Node, p_iri: str) -> Node | None:
        objs = self.objects(s, p_iri)
        return objs[0] if objs else None

    def subjects(self, p_iri: str, o: Node) -> list[Node]:
        return self._pos.get((p_iri, o), [])

    def rdf_list(self, head: Node | None) -> list[Node]:
        out = []
        while head is not None and not (head.kind == "iri" and head.value == RDF_NIL):
            first = self.object(head, RDF_FIRST)
            if first is not None:
                out.append(first)
            head = self.object(head, RDF_REST)
        return out


def parse_turtle(text: str) -> Graph:
    return Graph(TurtleParser(text).parse())


def parse_turtle_files(texts: list[str]) -> Graph:
    """Merge several Turtle files into one graph (Schema::open(),
    src/schema.rs:68-74), keeping blank labels distinct per file."""
    all_triples: list[tuple[Node, Node, Node]] = []
    for i, text in enumerate(texts):
        all_triples.extend(TurtleParser(text, blank_prefix=f"f{i}").parse())
    return Graph(all_triples)


_QID_RE = re.compile(r"Q(\d+)$")
# PIDs only from the 14 Wikidata property namespaces (model.rs:209-224) —
# a plain IRI like skos:prefLabel must NOT be mistaken for a PID.
_WD_PID_PREFIXES = tuple(vocab.PROPERTY_PREFIXES)

SH = vocab.SH
YS = vocab.YS


def _pid(node: Node) -> int | None:
    for pfx in _WD_PID_PREFIXES:
        if node.value.startswith(pfx):
            rest = node.value[len(pfx):]
            if rest.isdigit():
                return int(rest)
    return None


def _qid(node: Node) -> int | None:
    m = _QID_RE.search(node.value)
    return int(m.group(1)) if m else None


def _shape_roots(g: Graph, pnode: Node) -> list[Node]:
    """The property-shape node plus every sh:or list member
    (property_shape_roots, src/schema.rs:276-284)."""
    roots = [pnode]
    for or_head in g.objects(pnode, SH + "or"):
        roots.extend(g.rdf_list(or_head))
    return roots


def _split_from_properties(g: Graph, pnode: Node
                           ) -> tuple[tuple[int, ...], tuple[str, ...]]:
    """ys:fromProperty values: Wikidata PIDs → from_properties (statement
    scans), any other IRI (skos:prefLabel, schema:description…) →
    from_predicates (direct predicate_key scans, plan.rs:818-892)."""
    pids, keys = [], []
    for o in g.objects(pnode, YS + "fromProperty"):
        p = _pid(o)
        if p is not None:
            pids.append(p)
        elif o.kind == "iri":
            keys.append(terms.predicate_key_py({"kind": "iri", "text": o.value}))
    return tuple(pids), tuple(keys)


def _property_shape(g: Graph, pnode: Node, parent: str) -> PropertyShape:
    path = g.object(pnode, SH + "path")
    assert path is not None, f"property shape {pnode} without sh:path"
    from_props, from_preds = _split_from_properties(g, pnode)
    roots = _shape_roots(g, pnode)
    dts = tuple(o.value for r in roots for o in g.objects(r, SH + "datatype"))
    nodes = tuple(o.value for r in roots for o in g.objects(r, SH + "node"))
    max_count = g.object(pnode, SH + "maxCount")
    unique_lang = g.object(pnode, SH + "uniqueLang")
    pattern = g.object(pnode, SH + "pattern")
    return PropertyShape(
        path=path.value,
        parent_shape=parent,
        from_properties=from_props,
        datatypes=dts,
        nodes=nodes,
        max_count=int(max_count.value) if max_count else None,
        is_unique_lang=bool(unique_lang and unique_lang.value in ("true", "1")),
        pattern=pattern.value if pattern else None,
        from_predicates=from_preds,
    )


def schema_from_graph(g: Graph,
                      min_instances: int = vocab.MIN_NUMBER_OF_INSTANCES
                      ) -> Schema:
    """Build a Schema from a (merged) config graph using the reference's
    rules (schema.rs:76-301):

    - NodeShape.target_class defaults to the shape IRI itself when
      sh:targetClass is absent (schema.rs:118-126) — the real shapes.ttl
      NEVER uses sh:targetClass.
    - PropertyShape datatypes/nodes collect sh:datatype AND sh:node from
      the shape node plus all sh:or alternatives (schema.rs:276-284).
    - Class/Property ontology objects (labels, comments, subclass,
      disjoint, subPropertyOf, owl:inverseOf + schema:inverseOf) come
      from rdfs:Class / rdf:Property-typed subjects (schema.rs:76-186).
    - super_classes follows subclass_of_from_yago_schema
      (plan.rs:2224-2248): node-shape target classes only, Intangible /
      MedicalIntangible → Thing, StructuredValue / Series dropped.
    """
    schema = Schema(min_instances=min_instances)

    node_shapes = g.subjects(vocab.RDF_TYPE, Node("iri", SH + "NodeShape"))
    for ns in node_shapes:
        target = g.object(ns, SH + "targetClass") or ns
        from_classes = tuple(
            q for q in (_qid(o) for o in g.objects(ns, YS + "fromClass"))
            if q is not None
        )
        label = g.object(ns, vocab.RDFS_LABEL)
        schema.node_shapes.append(
            NodeShape(target.value, from_classes,
                      label.value if label else "", id=ns.value)
        )
        for pnode in g.objects(ns, SH + "property"):
            schema.property_shapes.append(_property_shape(g, pnode, target.value))

    for ann in g.subjects(vocab.RDF_TYPE, Node("iri", YS + "AnnotationPropertyShape")):
        path = g.object(ann, SH + "path")
        if path is None:
            continue
        from_props, _ = _split_from_properties(g, ann)
        roots = _shape_roots(g, ann)
        dts = tuple(o.value for r in roots for o in g.objects(r, SH + "datatype"))
        schema.annotation_shapes.append(
            AnnotationShape(path.value, from_props, dts)
        )

    # --- ontology objects (schema.rs:76-186) ---------------------------
    for c in g.subjects(vocab.RDF_TYPE, Node("iri", vocab.RDFS_CLASS)):
        if c.kind != "iri" or c.value in schema.classes:
            continue
        label = g.object(c, vocab.RDFS_LABEL)
        comment = g.object(c, vocab.RDFS_COMMENT)
        schema.classes[c.value] = ClassDef(
            id=c.value,
            label=label.value if label else None,
            comment=comment.value if comment else None,
            super_classes=tuple(o.value for o in g.objects(c, vocab.RDFS_SUBCLASS_OF)
                                if o.kind == "iri"),
            disjoint_classes=tuple(o.value for o in g.objects(c, vocab.OWL_DISJOINT_WITH)
                                   if o.kind == "iri"),
        )
    for t in (vocab.RDF_PROPERTY, vocab.OWL_DATATYPE_PROPERTY,
              vocab.OWL_OBJECT_PROPERTY):
        for p in g.subjects(vocab.RDF_TYPE, Node("iri", t)):
            if p.kind != "iri" or p.value in schema.properties:
                continue
            label = g.object(p, vocab.RDFS_LABEL)
            comment = g.object(p, vocab.RDFS_COMMENT)
            inverse = tuple(
                o.value
                for pred in (vocab.OWL_INVERSE_OF, vocab.SCHEMA_INVERSE_OF)
                for o in g.objects(p, pred) if o.kind == "iri"
            )
            schema.properties[p.value] = PropertyDef(
                id=p.value,
                label=label.value if label else None,
                comment=comment.value if comment else None,
                super_properties=tuple(
                    o.value for o in g.objects(p, vocab.RDFS_SUB_PROPERTY_OF)
                    if o.kind == "iri"),
                inverse=inverse,
            )

    # --- subclass + disjoint surface ------------------------------------
    if schema.classes:
        seen = set()
        for ns in schema.node_shapes:
            cd = schema.classes.get(ns.target_class)
            if cd is None:
                continue
            for sc in cd.super_classes:
                if sc in (vocab.SCHEMA_INTANGIBLE, vocab.SCHEMA_MEDICAL_INTANGIBLE):
                    edge = (ns.target_class, vocab.SCHEMA_THING)
                elif sc in (vocab.SCHEMA_STRUCTURED_VALUE, vocab.SCHEMA_SERIES):
                    continue
                else:
                    edge = (ns.target_class, sc)
                if edge not in seen:
                    seen.add(edge)
                    schema.super_classes.append(edge)
    else:
        # legacy shapes-only configs: raw rdfs:subClassOf triples
        for (s, p, o) in g.triples:
            if p.kind == "iri" and p.value == vocab.RDFS_SUBCLASS_OF:
                schema.super_classes.append((s.value, o.value))

    shape_targets = {ns.target_class for ns in schema.node_shapes}
    for (s, p, o) in g.triples:
        if p.kind == "iri" and p.value == vocab.OWL_DISJOINT_WITH:
            if s.value in shape_targets and o.value in shape_targets:
                pair = (s.value, o.value)
                if (o.value, s.value) not in schema.disjoint:
                    schema.disjoint.append(pair)
    return schema


def schema_from_turtle(text: str,
                       min_instances: int = vocab.MIN_NUMBER_OF_INSTANCES
                       ) -> Schema:
    """Single-file convenience wrapper over :func:`schema_from_graph`."""
    return schema_from_graph(parse_turtle(text), min_instances)


def load_schema(paths: list[str | Path],
                min_instances: int = vocab.MIN_NUMBER_OF_INSTANCES) -> Schema:
    """Load + merge a list of Turtle config files (ontology files first,
    like the reference's SCHEMA_DATA order: schema.ttl, shapes.ttl,
    bioschemas.ttl, shapes-bio.ttl — src/schema.rs:303-308)."""
    texts = [Path(p).read_text() for p in paths]
    return schema_from_graph(parse_turtle_files(texts), min_instances)
