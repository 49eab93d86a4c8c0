"""SHACL-style shape configuration — the declarative mapping rules.

The reference drives its whole pipeline from 21k lines of Turtle
(src/data/shapes.ttl parsed by src/schema.rs:188-301 into ``NodeShape`` /
``PropertyShape`` objects). We keep the same object model as plain Python
dataclasses: driver-side config that *parameterizes generated DataFrame
plans* — it never touches executor code, so no TTL parser is needed in
the hot path. A production deployment can populate these from the real
shapes.ttl; tests use ``sample_schema()`` (mirrors FIXTURES.md §4).

Constraint surface covered (schema.rs:37-56):
fromClass, fromProperty, sh:datatype (+ sh:or lists), sh:node,
sh:maxCount, sh:uniqueLang, sh:pattern, annotation property shapes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .. import vocab


@dataclass(frozen=True)
class NodeShape:
    """One target class and where it comes from in Wikidata
    (schema.rs:37-42). ``target_class`` defaults to the shape IRI itself
    when the config has no sh:targetClass (schema.rs:118-126) — the real
    shapes.ttl never uses sh:targetClass."""

    target_class: str                       # schema.org class IRI
    from_classes: tuple[int, ...]           # Wikidata QIDs (ys:fromClass)
    label: str = ""
    id: str = ""                            # shape IRI ('' → target_class)


@dataclass(frozen=True)
class ClassDef:
    """An rdfs:Class from the ontology files (schema.rs:17-23): label,
    comment, raw super/disjoint edges — consumed by the schema output and
    the schema.org-internal subclass closure."""

    id: str
    label: str | None = None
    comment: str | None = None
    super_classes: tuple[str, ...] = ()
    disjoint_classes: tuple[str, ...] = ()


@dataclass(frozen=True)
class PropertyDef:
    """An rdf:Property / owl:*Property from the ontology files
    (schema.rs:26-33)."""

    id: str
    label: str | None = None
    comment: str | None = None
    super_properties: tuple[str, ...] = ()
    inverse: tuple[str, ...] = ()           # owl:inverseOf + schema:inverseOf


@dataclass(frozen=True)
class PropertyShape:
    """One property mapping with its constraints (schema.rs:46-56)."""

    path: str                               # schema.org property IRI
    parent_shape: str                       # target_class of owning NodeShape
    from_properties: tuple[int, ...]        # Wikidata PIDs (ys:fromProperty)
    datatypes: tuple[str, ...] = ()         # allowed XSD datatype IRIs (sh:or)
    nodes: tuple[str, ...] = ()             # expected object classes (sh:node)
    max_count: int | None = None            # sh:maxCount
    is_unique_lang: bool = False            # sh:uniqueLang
    pattern: str | None = None              # sh:pattern
    # direct-predicate sources (the label family maps from full predicates
    # like skos:prefLabel on the entity itself, not statement nodes —
    # consumed by build_simple_properties, src/plan.rs:818-892). Values
    # are predicate_key strings.
    from_predicates: tuple[str, ...] = ()


@dataclass(frozen=True)
class AnnotationShape:
    """Qualifier → RDF★ annotation mapping (ys:AnnotationPropertyShape,
    shapes.ttl:2223-2259): qualifier PID → annotation predicate IRI."""

    path: str                               # annotation predicate IRI
    from_properties: tuple[int, ...]        # qualifier PIDs (pq:)
    datatypes: tuple[str, ...] = ()


@dataclass
class Schema:
    node_shapes: list[NodeShape] = field(default_factory=list)
    property_shapes: list[PropertyShape] = field(default_factory=list)
    annotation_shapes: list[AnnotationShape] = field(default_factory=list)
    # schema.org-internal subclass edges (child IRI, parent IRI)
    super_classes: list[tuple[str, str]] = field(default_factory=list)
    # disjoint class pairs (both directions implied)
    disjoint: list[tuple[str, str]] = field(default_factory=list)
    min_instances: int = vocab.MIN_NUMBER_OF_INSTANCES
    # ontology objects from the full config load (schema.ttl etc.);
    # empty for hand-built schemas — consumers must treat as optional
    classes: dict[str, ClassDef] = field(default_factory=dict)
    properties: dict[str, PropertyDef] = field(default_factory=dict)

    def node_shape(self, target_class: str) -> NodeShape:
        for ns in self.node_shapes:
            if ns.target_class == target_class:
                return ns
        raise KeyError(target_class)

    def target_class_of(self, iri: str) -> str:
        """Resolve a sh:node value — a shape IRI or a target class — to
        the shape's target class (the reference indexes shapes by IRI and
        reads .target_class, schema.rs:1914-1920)."""
        for ns in self.node_shapes:
            if ns.target_class == iri or (ns.id or ns.target_class) == iri:
                return ns.target_class
        return iri

    def property_shapes_for(self, target_class: str) -> list[PropertyShape]:
        return [p for p in self.property_shapes if p.parent_shape == target_class]

    def mapped_class_qids(self) -> list[int]:
        out: list[int] = []
        for ns in self.node_shapes:
            out.extend(ns.from_classes)
        return sorted(set(out))

    def disjoint_pairs_expanded(self) -> list[tuple[str, str]]:
        out = []
        for a, b in self.disjoint:
            out.append((a, b))
            out.append((b, a))
        return out


# QIDs used by the test universe (arbitrary but stable; Q5/Q3331189-style
# realism is irrelevant — rules are what's under test).
Q_HUMAN = 5
Q_CREATIVE_WORK = 17537576
Q_PLACE = 618123
Q_ORG = 43229
Q_ENTITY = 35120  # "entity" → schema:Thing

ISSN_PATTERN = "^[0-9]{4}-[0-9]{3}[0-9X]$"  # shapes.ttl:431


def sample_schema(min_instances: int = 2) -> Schema:
    """The reduced shape config from FIXTURES.md §4: 6 node shapes,
    Person×CreativeWork disjointness, and property shapes covering every
    constraint kind the reference reads."""
    S = vocab.SCHEMA
    return Schema(
        node_shapes=[
            NodeShape(S + "Thing", (Q_ENTITY,), "Thing"),
            NodeShape(S + "Person", (Q_HUMAN,), "Person"),
            NodeShape(S + "Place", (Q_PLACE,), "Place"),
            NodeShape(S + "CreativeWork", (Q_CREATIVE_WORK,), "CreativeWork"),
            NodeShape(S + "Organization", (Q_ORG,), "Organization"),
            NodeShape(S + "GeoCoordinates", (), "GeoCoordinates"),
            NodeShape(S + "ImageObject", (), "ImageObject"),
            NodeShape(S + "QuantitativeValue", (), "QuantitativeValue"),
        ],
        property_shapes=[
            # dates with sh:or of 4 datatypes + maxCount 1 (shapes.ttl Person/birthDate)
            PropertyShape(
                S + "birthDate", S + "Person", (569,),
                datatypes=(vocab.XSD_DATE_TIME, vocab.XSD_DATE,
                           vocab.XSD_G_YEAR_MONTH, vocab.XSD_G_YEAR),
                max_count=1,
            ),
            PropertyShape(
                S + "deathDate", S + "Person", (570,),
                datatypes=(vocab.XSD_DATE_TIME, vocab.XSD_DATE,
                           vocab.XSD_G_YEAR_MONTH, vocab.XSD_G_YEAR),
                max_count=1,
            ),
            # object-range property (sh:node)
            PropertyShape(
                S + "spouse", S + "Person", (26,), nodes=(S + "Person",),
            ),
            PropertyShape(
                S + "birthPlace", S + "Person", (19,), nodes=(S + "Place",),
                max_count=1,
            ),
            # geo coordinates (value-node conversion)
            PropertyShape(
                S + "geo", S + "Place", (625,), nodes=(S + "GeoCoordinates",),
            ),
            # anyURI (url validity branch)
            PropertyShape(
                S + "url", S + "Thing", (856,), datatypes=(vocab.XSD_ANY_URI,),
            ),
            # commons image
            PropertyShape(
                S + "image", S + "Thing", (18,), nodes=(S + "ImageObject",),
            ),
            # duration quantity
            PropertyShape(
                S + "duration", S + "CreativeWork", (2047,),
                datatypes=(vocab.XSD_DURATION,),
            ),
            # integer quantity (unit must be Q199)
            PropertyShape(
                S + "numberOfPages", S + "CreativeWork", (1104,),
                datatypes=(vocab.XSD_INTEGER,),
            ),
            # full QuantitativeValue expansion
            PropertyShape(
                S + "weight", S + "Person", (2067,),
                nodes=(S + "QuantitativeValue",),
            ),
            # string with sh:pattern (ISSN)
            PropertyShape(
                S + "issn", S + "CreativeWork", (236,),
                datatypes=(vocab.XSD_STRING,), pattern=ISSN_PATTERN,
            ),
            # plain string
            PropertyShape(
                S + "familyName", S + "Person", (734,),
                datatypes=(vocab.XSD_STRING,),
            ),
            # label family: direct predicates, langString, uniqueLang
            # (consumed by the labels output, not the facts pipeline)
            PropertyShape(
                vocab.RDFS_LABEL, S + "Thing", (),
                datatypes=(vocab.RDF_LANG_STRING,), is_unique_lang=True,
                from_predicates=("skos:prefLabel",),
            ),
            PropertyShape(
                vocab.RDFS_COMMENT, S + "Thing", (),
                datatypes=(vocab.RDF_LANG_STRING,), is_unique_lang=True,
                from_predicates=("schema:description",),
            ),
            PropertyShape(
                S + "alternateName", S + "Thing", (),
                datatypes=(vocab.RDF_LANG_STRING,),
                from_predicates=("skos:altLabel",),
            ),
        ],
        annotation_shapes=[
            AnnotationShape(S + "startDate", (580,),
                            (vocab.XSD_DATE_TIME, vocab.XSD_DATE,
                             vocab.XSD_G_YEAR_MONTH, vocab.XSD_G_YEAR)),
            AnnotationShape(S + "endDate", (582,),
                            (vocab.XSD_DATE_TIME, vocab.XSD_DATE,
                             vocab.XSD_G_YEAR_MONTH, vocab.XSD_G_YEAR)),
        ],
        super_classes=[
            (S + "Person", S + "Thing"),
            (S + "Place", S + "Thing"),
            (S + "CreativeWork", S + "Thing"),
            (S + "Organization", S + "Thing"),
        ],
        disjoint=[(S + "Person", S + "CreativeWork")],
        min_instances=min_instances,
    )
