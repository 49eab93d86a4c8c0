"""S8: the 8 output builders (SURVEY.md §2.9).

| output            | reference builder                      | citation |
|-------------------|----------------------------------------|----------|
| class.nt          | build_classes_description              | src/plan.rs:771-814 |
| simple-types.nt   | build_simple_instance_of               | src/plan.rs:734-744 |
| full-types.nt     | build_full_instance_of                 | src/plan.rs:747-768 |
| labels.nt         | build_simple_properties_from_schema    | src/plan.rs:818-892 |
| facts / annotated | build_properties_from_wikidata_and_schema | plans/facts.py |
| sameAs.nt         | build_same_as                          | src/plan.rs:1690-1780 |
| schema.nt         | build_yago_schema                      | src/plan.rs:1783-1962 |
| shapes.nt         | build_yago_shapes                      | src/plan.rs:2079-2202 |

Each builder returns a (subject, predicate, object) term-struct
DataFrame; the reference's 8 writer threads become independent Spark
actions writing through the StageCatalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import vocab
from ..sources.statements import StatementsTable
from .facts import datatype_of, iri_lit, iri_term, term_struct, typed_term
from .shapes import Schema
from .taxonomy import Taxonomy


def _label_scans(st: StatementsTable, predicate_keys: tuple[str, ...]) -> DataFrame:
    """(qid, object term) for direct entity predicates (labels family)."""
    return st.scan_many(list(predicate_keys)).where(
        F.col("subject.kind") == "item"
    ).select(F.col("subject.num").alias("qid"), F.col("object").alias("o"))


def build_classes_description(
    st: StatementsTable, taxonomy: Taxonomy, uri_mapping: DataFrame
) -> DataFrame:
    """rdf:type owl:Class + rdfs:subClassOf + rdfs:label + rdfs:comment
    for every YAGO class (src/plan.rs:771-814)."""
    cls = taxonomy.yago_classes  # (cls)
    typed = cls.select(
        iri_term(F.col("cls")).alias("subject"),
        iri_lit(vocab.RDF_TYPE).alias("predicate"),
        iri_lit(vocab.OWL_CLASS).alias("object"),
    )
    sub = taxonomy.sub_class_of.select(
        iri_term(F.col("child")).alias("subject"),
        iri_lit(vocab.RDFS_SUBCLASS_OF).alias("predicate"),
        iri_term(F.col("parent")).alias("object"),
    )

    def desc(predicate_key: str, out_pred: str) -> DataFrame:
        return (
            _label_scans(st, (predicate_key,))
            .join(uri_mapping, "qid", "inner")
            .join(
                taxonomy.yago_classes.withColumnRenamed("cls", "yago"),
                "yago",
                "left_semi",
            )
            .select(
                iri_term(F.col("yago")).alias("subject"),
                iri_lit(out_pred).alias("predicate"),
                F.col("o").alias("object"),
            )
        )

    labels = desc("skos:prefLabel", vocab.RDFS_LABEL)
    comments = desc("schema:description", vocab.RDFS_COMMENT)
    return sub.unionByName(typed).unionByName(labels).unionByName(comments)


def build_simple_instance_of(shape_instances: DataFrame) -> DataFrame:
    """instance rdf:type shape-class (src/plan.rs:734-744)."""
    return shape_instances.select(
        iri_term(F.col("instance")).alias("subject"),
        iri_lit(vocab.RDF_TYPE).alias("predicate"),
        iri_term(F.col("shape")).alias("object"),
    )


def build_full_instance_of(
    st: StatementsTable,
    taxonomy: Taxonomy,
    things: DataFrame,
    uri_mapping: DataFrame,
) -> DataFrame:
    """instance rdf:type yago-class from P31 × class mapping, restricted
    to Thing instances (src/plan.rs:747-768)."""
    from .taxonomy import instance_edges

    p31 = instance_edges(st)  # (instance, cls qids)
    inst_uri = (
        p31.withColumnRenamed("instance", "qid")
        .join(uri_mapping, "qid", "inner")
        .select(F.col("cls").alias("wd_cls"), F.col("yago").alias("instance"))
        .join(things.select(F.col("instance")), "instance", "left_semi")
    )
    return (
        inst_uri.withColumnRenamed("wd_cls", "qid")
        .join(taxonomy.class_mapping, "qid", "inner")
        .select(
            iri_term(F.col("instance")).alias("subject"),
            iri_lit(vocab.RDF_TYPE).alias("predicate"),
            iri_term(F.col("cls")).alias("object"),
        )
        .distinct()
    )


def build_simple_properties(
    st: StatementsTable,
    schema: Schema,
    shape_instances: DataFrame,
    uri_mapping: DataFrame,
    properties: tuple[str, ...],
    enforce_unique_lang: bool = False,
) -> DataFrame:
    """The labels output: direct-predicate property shapes filtered by
    datatype and domain (src/plan.rs:818-892).

    ``enforce_unique_lang``: the reference PARSES sh:uniqueLang but never
    enforces it (a documented gap); opt-in here keeps one deterministic
    value (min by text) per (subject, predicate, language) for shapes
    declaring it. Off by default to preserve reference-output parity."""
    frames = []
    for shape in schema.property_shapes:
        if shape.path not in properties or not shape.from_predicates:
            continue
        scan = _label_scans(st, shape.from_predicates)
        scan = scan.where(datatype_of(F.col("o")).isin(list(shape.datatypes)))
        domain = shape_instances.where(
            F.col("shape") == shape.parent_shape
        ).select(F.col("instance").alias("yago"))
        mapped = (
            scan.join(uri_mapping, "qid", "inner")
            .join(domain, "yago", "left_semi")
            .select(
                iri_term(F.col("yago")).alias("subject"),
                iri_lit(shape.path).alias("predicate"),
                F.col("o").alias("object"),
            )
        )
        if enforce_unique_lang and shape.is_unique_lang:
            mapped = (
                mapped.groupBy(
                    F.col("subject"), F.col("predicate"),
                    F.col("object.lang").alias("_lang"),
                )
                .agg(F.min_by(F.col("object"), F.col("object.text"))
                     .alias("object"))
                .drop("_lang")
            )
        frames.append(mapped)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def build_same_as(
    st: StatementsTable,
    things: DataFrame,
    uri_mapping: DataFrame,
    enwiki_mapping: DataFrame,
) -> DataFrame:
    """owl:sameAs to Wikidata / DBpedia / Freebase + schema:sameAs to all
    Wikipedias (src/plan.rs:1690-1780)."""
    things_uri = things.select(F.col("instance").alias("yago")).distinct()

    wikidata = (
        uri_mapping.join(things_uri, "yago", "left_semi")
        .select(
            iri_term(F.col("yago")).alias("subject"),
            iri_lit(vocab.OWL_SAME_AS).alias("predicate"),
            term_struct(F.lit("item"), num=F.col("qid")).alias("object"),
        )
    )

    dbpedia = (
        enwiki_mapping.join(uri_mapping, "qid", "inner")
        .join(things_uri, "yago", "left_semi")
        .select(
            iri_term(F.col("yago")).alias("subject"),
            iri_lit(vocab.OWL_SAME_AS).alias("predicate"),
            iri_term(
                F.replace(
                    F.col("wp"),
                    F.lit(vocab.ENWIKI_ARTICLE_PREFIX),
                    F.lit(vocab.DBPEDIA_RESOURCE_PREFIX),
                )
            ).alias("object"),
        )
    )

    freebase = (
        st.scan("wdt:P646")
        .where((F.col("subject.kind") == "item") & (F.col("object.kind") == "string"))
        .select(
            F.col("subject.num").alias("qid"), F.col("object.text").alias("fb")
        )
        .where(F.col("fb").rlike(r"/m/0([0-9a-z_]{2,6}|1[0123][0-9a-z_]{5})$"))
        .join(uri_mapping, "qid", "inner")
        .join(things_uri, "yago", "left_semi")
        .select(
            iri_term(F.col("yago")).alias("subject"),
            iri_lit(vocab.OWL_SAME_AS).alias("predicate"),
            iri_term(
                F.concat(
                    F.lit(vocab.FREEBASE_NS_PREFIX),
                    F.regexp_replace(F.expr("substring(fb, 2)"), "/", "."),
                )
            ).alias("object"),
        )
    )

    wikipedia = (
        st.scan("schema:about")
        .where(
            (F.col("subject.kind") == "iri")
            & F.col("subject.text").contains(".wikipedia.org/wiki/")
            & (F.col("object.kind") == "item")
        )
        .select(F.col("object.num").alias("qid"), F.col("subject.text").alias("wp"))
        .join(uri_mapping, "qid", "inner")
        .join(things_uri, "yago", "left_semi")
        .select(
            iri_term(F.col("yago")).alias("subject"),
            iri_lit(vocab.SCHEMA + "sameAs").alias("predicate"),
            term_struct(
                F.lit("typed"), text=F.col("wp"),
                datatype=F.lit(vocab.XSD_ANY_URI),
            ).alias("object"),
        )
    )

    return wikidata.unionByName(dbpedia).unionByName(freebase).unionByName(wikipedia)


def _rows_to_triples(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    """(s_kind, s, p, o_kind, o_text, o_lang) rows → term-struct triples.
    s_kind/o_kind ∈ {iri, blank, langString, string, integer, boolean}."""
    df = spark.createDataFrame(
        rows,
        "s_kind string, s string, p string, o_kind string, o_text string, "
        "o_lang string",
    )
    subj = F.when(F.col("s_kind") == "blank",
                  term_struct(F.lit("blank"), text=F.col("s"))
                  ).otherwise(iri_term(F.col("s")))
    obj = (
        F.when(F.col("o_kind") == "iri", iri_term(F.col("o_text")))
        .when(F.col("o_kind") == "blank",
              term_struct(F.lit("blank"), text=F.col("o_text")))
        .when(F.col("o_kind") == "langString",
              term_struct(F.lit("langString"), text=F.col("o_text"),
                          lang=F.col("o_lang")))
        .when(F.col("o_kind") == "integer",
              term_struct(F.lit("integer"),
                          num=F.col("o_text").cast("long")))
        .when(F.col("o_kind") == "boolean",
              typed_term(F.col("o_text"), F.lit(vocab.XSD_BOOLEAN)))
        .otherwise(term_struct(F.lit("string"), text=F.col("o_text")))
    )
    return df.select(
        subj.alias("subject"),
        iri_term(F.col("p")).alias("predicate"),
        obj.alias("object"),
    )


def _emit_rdf_list(rows: list, items: list[tuple[str, str]]) -> str:
    """Append RDF list cons-cells with the reference's deterministic
    blank labels keyed on the MEMBER SET, 1-based from the head
    (add_list_object, src/plan.rs:2000-2029); items are (kind, value)
    where every value is an IRI. Returns the head label or rdf:nil."""
    from ..functions.names import list_blank_labels

    labels = list_blank_labels([v for _, v in items])
    head = vocab.RDF_NIL
    head_kind = "iri"
    for i in range(len(items) - 1, -1, -1):
        cell = labels[i]
        kind, value = items[i]
        rows.append(("blank", cell, vocab.RDF_FIRST, kind, value, None))
        rows.append(("blank", cell, vocab.RDF_REST, head_kind, head, None))
        head, head_kind = cell, "blank"
    return head


def _output_super_edges(cls_id: str, supers: tuple[str, ...]
                        ) -> list[tuple[str, str]]:
    """The schema output's subclass remap (src/plan.rs:1812-1838):
    Intangible/Enumeration → Thing, MedicalIntangible/MedicalEnumeration
    → MedicalEntity, StructuredValue/Series dropped, else verbatim."""
    out = []
    for sc in supers:
        if sc in (vocab.SCHEMA_INTANGIBLE, vocab.SCHEMA_ENUMERATION):
            out.append((cls_id, vocab.SCHEMA_THING))
        elif sc in (vocab.SCHEMA_MEDICAL_INTANGIBLE,
                    vocab.SCHEMA_MEDICAL_ENUMERATION):
            out.append((cls_id, vocab.SCHEMA_MEDICAL_ENTITY))
        elif sc in (vocab.SCHEMA_STRUCTURED_VALUE, vocab.SCHEMA_SERIES):
            continue
        else:
            out.append((cls_id, sc))
    return out


def build_yago_schema_triples(spark: SparkSession, schema: Schema) -> DataFrame:
    """OWL TBox emission from the driver-side shape config (reference:
    src/plan.rs:1783-1962): classes with camel-case-split labels,
    rdfs:comment, remapped hierarchy (Intangible/Enumeration → Thing
    etc., plan.rs:1812-1838), disjointness, property typing with
    rdfs:comment / rdfs:subPropertyOf / owl:inverseOf /
    owl:FunctionalProperty, and rdfs:domain / rdfs:range aggregated
    across shapes as owl:unionOf RDF lists (add_union_of_object,
    src/plan.rs:1965-1998).

    When the schema has no ontology objects (hand-built configs without
    a schema.ttl), class/property emission is NOT gated on rdfs:Class /
    rdf:Property typing and labels fall back to IRI local names; with
    ontology objects loaded, unlisted classes/properties are skipped
    exactly like the reference's ``schema.class(...)`` /
    ``schema.property(...)`` Option gates."""
    from ..functions.names import camel_case_to_regular

    rows: list[tuple] = []

    def t(s, p, o_kind, o_text=None, o_lang=None, s_kind="iri"):
        rows.append((s_kind, s, p, o_kind, o_text, o_lang))

    have_ontology = bool(schema.classes or schema.properties)

    # --- classes (plan.rs:1789-1849) -----------------------------------
    for ns in schema.node_shapes:
        tc = ns.target_class
        cd = schema.classes.get(tc)
        if have_ontology and cd is None:
            continue
        t(tc, vocab.RDF_TYPE, "iri", vocab.OWL_CLASS)
        label = (cd.label if cd else None) or ns.label or tc.rsplit("/", 1)[-1]
        t(tc, vocab.RDFS_LABEL, "langString", camel_case_to_regular(label), "en")
        if cd:
            if cd.comment:
                t(tc, vocab.RDFS_COMMENT, "string", cd.comment)
            for child, parent in _output_super_edges(tc, cd.super_classes):
                t(child, vocab.RDFS_SUBCLASS_OF, "iri", parent)
            for dj in cd.disjoint_classes:
                t(tc, vocab.OWL_DISJOINT_WITH, "iri", dj)
    if not have_ontology:
        for child, parent in schema.super_classes:
            t(child, vocab.RDFS_SUBCLASS_OF, "iri", parent)
        for a, b in schema.disjoint_pairs_expanded():
            t(a, vocab.OWL_DISJOINT_WITH, "iri", b)

    # --- properties (plan.rs:1851-1925) --------------------------------
    domains: dict[str, set] = {}
    object_ranges: dict[str, set] = {}
    datatype_ranges: dict[str, set] = {}
    emitted: dict[str, set] = {}

    for ps in schema.property_shapes:
        pd = schema.properties.get(ps.path)
        if have_ontology and pd is None:
            continue
        if ps.nodes and not ps.datatypes:
            kind = vocab.OWL_OBJECT_PROPERTY
        elif ps.datatypes and not ps.nodes:
            kind = vocab.OWL_DATATYPE_PROPERTY
        else:
            kind = vocab.RDF_PROPERTY
        done = emitted.setdefault(ps.path, set())
        if kind not in done:
            done.add(kind)
            t(ps.path, vocab.RDF_TYPE, "iri", kind)
        if "_base" not in done:
            done.add("_base")
            label = (pd.label if pd else None) or ps.path.rsplit("/", 1)[-1]
            t(ps.path, vocab.RDFS_LABEL, "langString",
              camel_case_to_regular(label), "en")
            if pd:
                if pd.comment:
                    t(ps.path, vocab.RDFS_COMMENT, "string", pd.comment)
                for sp in pd.super_properties:
                    t(ps.path, vocab.RDFS_SUB_PROPERTY_OF, "iri", sp)
                for inv in pd.inverse:
                    t(ps.path, vocab.OWL_INVERSE_OF, "iri", inv)
        if ps.max_count == 1 and "_functional" not in done:
            done.add("_functional")
            t(ps.path, vocab.RDF_TYPE, "iri", vocab.OWL_FUNCTIONAL_PROPERTY)
        domains.setdefault(ps.path, set()).add(ps.parent_shape)
        for n in ps.nodes:
            object_ranges.setdefault(ps.path, set()).add(
                schema.target_class_of(n))
        for dt in ps.datatypes:
            datatype_ranges.setdefault(ps.path, set()).add(
                # rdf:langString is not in OWL 2 (RDF 1.0) — plan.rs:1918-1922
                vocab.RDF_PLAIN_LITERAL if dt == vocab.RDF_LANG_STRING else dt
            )

    def add_union_of(path: str, pred: str, members: set, member_type: str):
        # add_union_of_object (src/plan.rs:1964-1997): blank label is
        # "{subject}-{predicate}-owl-unionOf-{members}" via string_name —
        # collision-free across properties sharing a local name
        from ..functions.names import string_name, string_names

        ordered = sorted(members)
        if len(ordered) == 1:
            t(path, pred, "iri", ordered[0])
            return
        union = (f"{string_name(path)}-{string_name(pred)}"
                 f"-owl-unionOf-{string_names(ordered)}")
        t(path, pred, "blank", union)
        t(union, vocab.RDF_TYPE, "iri", member_type, s_kind="blank")
        head = _emit_rdf_list(rows, [("iri", m) for m in ordered])
        t(union, vocab.OWL_UNION_OF,
          "blank" if head != vocab.RDF_NIL else "iri", head, s_kind="blank")

    for path in sorted(domains):
        add_union_of(path, vocab.RDFS_DOMAIN, domains[path], vocab.OWL_CLASS)
    for path in sorted(object_ranges):
        add_union_of(path, vocab.RDFS_RANGE, object_ranges[path],
                     vocab.OWL_CLASS)
    for path in sorted(datatype_ranges):
        add_union_of(path, vocab.RDFS_RANGE, datatype_ranges[path],
                     vocab.RDFS_DATATYPE)
    return _rows_to_triples(spark, rows)


def build_yago_shapes_triples(spark: SparkSession, schema: Schema) -> DataFrame:
    """Re-emit the SHACL shape config as triples, mirroring
    build_yago_shapes (src/plan.rs:2079-2202) structurally:

    - node shapes with NO property shapes are skipped (:2083-2085);
    - the NodeShape subject is the target class ITSELF (typed
      sh:NodeShape, sh:targetClass self-edge, :2086-2095);
    - each property shape gets the IRI
      ``{yagov}shape-prop-{string_name(target)}-{string_name(path)}``
      linked via sh:property (:2097-2111) — per (node shape, path), so a
      path reused across shapes yields distinct PropertyShape nodes;
    - multi-datatype / multi-node constraints become sh:or RDF lists of
      ``{yagov}sh-datatype-{...}`` / ``{yagov}sh-node-{...}`` IRIs
      (:2117-2176) with the member-set-keyed cons-cell labels;
    - sh:uniqueLang is "true"^^xsd:boolean, sh:maxCount an integer
      literal, sh:pattern a plain string (:2178-2198)."""
    from ..functions.names import string_names

    rows: list[tuple] = []

    def t(s, p, o_kind, o_text=None, s_kind="iri"):
        rows.append((s_kind, s, p, o_kind, o_text, None))

    def or_list(pshape: str, pred: str, values: tuple, member_prefix: str):
        members = []
        for v in values:
            m = f"{vocab.YAGO_VALUE_PREFIX}{member_prefix}-{string_names([v])}"
            t(m, pred, "iri", v)
            members.append(("iri", m))
        head = _emit_rdf_list(rows, members)
        t(pshape, vocab.SH + "or",
          "blank" if head != vocab.RDF_NIL else "iri", head)

    by_parent: dict[str, list] = {}
    for ps in schema.property_shapes:
        by_parent.setdefault(ps.parent_shape, []).append(ps)

    for ns in schema.node_shapes:
        props = by_parent.get(ns.target_class, [])
        if not props:
            continue  # "Not useful" (plan.rs:2083-2085)
        t(ns.target_class, vocab.RDF_TYPE, "iri", vocab.SH + "NodeShape")
        t(ns.target_class, vocab.SH + "targetClass", "iri", ns.target_class)
        for ps in props:
            pshape = (f"{vocab.YAGO_VALUE_PREFIX}shape-prop-"
                      f"{string_names([ns.target_class, ps.path])}")
            t(ns.target_class, vocab.SH + "property", "iri", pshape)
            t(pshape, vocab.RDF_TYPE, "iri", vocab.SH + "PropertyShape")
            t(pshape, vocab.SH + "path", "iri", ps.path)
            if len(ps.datatypes) == 1:
                t(pshape, vocab.SH + "datatype", "iri", ps.datatypes[0])
            elif len(ps.datatypes) > 1:
                or_list(pshape, vocab.SH + "datatype", ps.datatypes,
                        "sh-datatype")
            if len(ps.nodes) == 1:
                t(pshape, vocab.SH + "node", "iri", ps.nodes[0])
            elif len(ps.nodes) > 1:
                or_list(pshape, vocab.SH + "node", ps.nodes, "sh-node")
            if ps.is_unique_lang:
                t(pshape, vocab.SH + "uniqueLang", "boolean", "true")
            if ps.max_count is not None:
                t(pshape, vocab.SH + "maxCount", "integer", str(ps.max_count))
            if ps.pattern:
                t(pshape, vocab.SH + "pattern", "string", ps.pattern)
    return _rows_to_triples(spark, rows)
