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
- string / integer / boolean literals

Driver-side only (config-sized data) — never on executors.
"""

from __future__ import annotations

import itertools
import re
from dataclasses import dataclass, field

from .. import vocab
from .shapes import AnnotationShape, NodeShape, PropertyShape, Schema

_TOKEN = re.compile(
    r"""
      (?P<comment>\#[^\n]*)
    | (?P<iri><[^>]*>)
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

RDF_FIRST = vocab.RDF_FIRST
RDF_REST = vocab.RDF_REST
RDF_NIL = vocab.RDF_NIL


@dataclass
class Node:
    kind: str  # iri | blank | literal
    value: str

    def __hash__(self):
        return hash((self.kind, self.value))


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
    def __init__(self, text: str):
        self.tokens = list(_tokenize(text))
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.triples: list[tuple[Node, Node, Node]] = []
        self._blank_ids = itertools.count()

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
        return Node("blank", f"_:b{next(self._blank_ids)}")

    def _parse_node(self) -> Node:
        t = self._next()
        if t.group("iri"):
            return Node("iri", t.group("iri")[1:-1])
        if t.group("string"):
            raw = t.group("string")[1:-1]
            # consume optional ^^datatype / @lang (ignored for config use)
            nxt = self._peek()
            if nxt is not None and nxt.group("dtsuffix"):
                self._next()
                self._parse_node()  # the datatype IRI
            elif nxt is not None and nxt.group("langtag"):
                self._next()
            return Node("literal", raw.replace('\\"', '"'))
        if t.group("a"):
            return Node("iri", vocab.RDF_TYPE)
        if t.group("boolean"):
            return Node("literal", t.group("boolean"))
        if t.group("number"):
            return Node("literal", t.group("number"))
        if t.group("local") is not None and t.group(0).find(":") != -1:
            prefix = t.group("pname") or ""
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


@dataclass
class Graph:
    triples: list[tuple[Node, Node, Node]] = field(default_factory=list)

    def objects(self, s: Node, p_iri: str) -> list[Node]:
        return [o for (ts, tp, o) in self.triples
                if ts == s and tp.kind == "iri" and tp.value == p_iri]

    def object(self, s: Node, p_iri: str) -> Node | None:
        objs = self.objects(s, p_iri)
        return objs[0] if objs else None

    def subjects(self, p_iri: str, o: Node) -> list[Node]:
        return [s for (s, tp, to) in self.triples
                if to == o and tp.kind == "iri" and tp.value == p_iri]

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


_QID_RE = re.compile(r"Q(\d+)$")
_PID_RE = re.compile(r"P(\d+)$")

SH = vocab.SH
YS = vocab.YS


def schema_from_turtle(text: str,
                       min_instances: int = vocab.MIN_NUMBER_OF_INSTANCES
                       ) -> Schema:
    """Build a Schema from shapes Turtle using the reference's config
    vocabulary (schema.rs:188-301): sh:targetClass, ys:fromClass,
    sh:property → [sh:path, ys:fromProperty, sh:datatype | sh:or list,
    sh:node, sh:maxCount, sh:uniqueLang, sh:pattern],
    ys:AnnotationPropertyShape, rdfs:subClassOf, owl:disjointWith."""
    g = parse_turtle(text)
    schema = Schema(min_instances=min_instances)

    def qid(node: Node) -> int | None:
        m = _QID_RE.search(node.value)
        return int(m.group(1)) if m else None

    def pid(node: Node) -> int | None:
        m = _PID_RE.search(node.value)
        return int(m.group(1)) if m else None

    node_shapes = g.subjects(vocab.RDF_TYPE, Node("iri", SH + "NodeShape"))
    for ns in node_shapes:
        target = g.object(ns, SH + "targetClass")
        if target is None:
            continue
        from_classes = tuple(
            q for q in (qid(o) for o in g.objects(ns, YS + "fromClass"))
            if q is not None
        )
        label = g.object(ns, vocab.RDFS_LABEL)
        schema.node_shapes.append(
            NodeShape(target.value, from_classes,
                      label.value if label else "")
        )
        for pnode in g.objects(ns, SH + "property"):
            path = g.object(pnode, SH + "path")
            if path is None:
                continue
            from_props = tuple(
                p for p in (pid(o) for o in g.objects(pnode, YS + "fromProperty"))
                if p is not None
            )
            dts = [o.value for o in g.objects(pnode, SH + "datatype")]
            for or_head in g.objects(pnode, SH + "or"):
                for alt in g.rdf_list(or_head):
                    dt = g.object(alt, SH + "datatype")
                    if dt is not None:
                        dts.append(dt.value)
                    nd = g.object(alt, SH + "node")
                    if nd is not None:
                        dts.append(("node", nd.value))
            nodes = [o.value for o in g.objects(pnode, SH + "node")]
            nodes += [v for v in dts if isinstance(v, tuple)]
            dts = tuple(v for v in dts if isinstance(v, str))
            nodes = tuple(
                v[1] if isinstance(v, tuple) else v for v in nodes
            )
            max_count = g.object(pnode, SH + "maxCount")
            unique_lang = g.object(pnode, SH + "uniqueLang")
            pattern = g.object(pnode, SH + "pattern")
            schema.property_shapes.append(PropertyShape(
                path=path.value,
                parent_shape=target.value,
                from_properties=from_props,
                datatypes=dts,
                nodes=nodes,
                max_count=int(max_count.value) if max_count else None,
                is_unique_lang=bool(unique_lang and unique_lang.value == "true"),
                pattern=pattern.value if pattern else None,
            ))

    for ann in g.subjects(vocab.RDF_TYPE, Node("iri", YS + "AnnotationPropertyShape")):
        path = g.object(ann, SH + "path")
        if path is None:
            continue
        from_props = tuple(
            p for p in (pid(o) for o in g.objects(ann, YS + "fromProperty"))
            if p is not None
        )
        dts = [o.value for o in g.objects(ann, SH + "datatype")]
        for or_head in g.objects(ann, SH + "or"):
            for alt in g.rdf_list(or_head):
                dt = g.object(alt, SH + "datatype")
                if dt is not None:
                    dts.append(dt.value)
        schema.annotation_shapes.append(
            AnnotationShape(path.value, from_props, tuple(dts))
        )

    for (s, p, o) in g.triples:
        if p.kind == "iri" and p.value == vocab.RDFS_SUBCLASS_OF:
            schema.super_classes.append((s.value, o.value))
        if p.kind == "iri" and p.value == vocab.OWL_DISJOINT_WITH:
            pair = (s.value, o.value)
            if (o.value, s.value) not in schema.disjoint:
                schema.disjoint.append(pair)
    return schema
