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
from .facts import datatype_of, iri_lit, iri_term, term_struct
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
) -> DataFrame:
    """The labels output: direct-predicate property shapes filtered by
    datatype and domain (src/plan.rs:818-892)."""
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


def build_yago_schema_triples(spark: SparkSession, schema: Schema) -> DataFrame:
    """Reduced OWL TBox emission from the driver-side shape config
    (reference: src/plan.rs:1783-1962 emits the full schema.org ontology
    with Intangible/Enumeration remaps; we emit the classes, hierarchy
    and disjointness our config carries — driver-sized data)."""
    rows = []

    def t(s, p, o_kind, o_text=None, o_lang=None):
        rows.append((s, p, o_kind, o_text, o_lang))

    for ns in schema.node_shapes:
        t(ns.target_class, vocab.RDF_TYPE, "iri", vocab.OWL_CLASS)
        if ns.label:
            t(ns.target_class, vocab.RDFS_LABEL, "langString", ns.label, "en")
    for child, parent in schema.super_classes:
        t(child, vocab.RDFS_SUBCLASS_OF, "iri", parent)
    for a, b in schema.disjoint_pairs_expanded():
        t(a, vocab.OWL_DISJOINT_WITH, "iri", b)
    for ps in schema.property_shapes:
        kind = "ObjectProperty" if ps.nodes else "DatatypeProperty"
        t(ps.path, vocab.RDF_TYPE, "iri", vocab.OWL + kind)
        t(ps.path, vocab.RDFS + "domain", "iri", ps.parent_shape)

    df = spark.createDataFrame(
        rows, "s string, p string, o_kind string, o_text string, o_lang string"
    )
    obj = F.when(
        F.col("o_kind") == "iri", iri_term(F.col("o_text"))
    ).otherwise(
        term_struct(F.lit("langString"), text=F.col("o_text"), lang=F.col("o_lang"))
    )
    return df.select(
        iri_term(F.col("s")).alias("subject"),
        iri_term(F.col("p")).alias("predicate"),
        obj.alias("object"),
    )


def build_yago_shapes_triples(spark: SparkSession, schema: Schema) -> DataFrame:
    """Re-emit the SHACL shape config as triples (reference:
    src/plan.rs:2079-2202; sh:or RDF lists elided — constraints are
    emitted flat, one sh:datatype triple per allowed datatype)."""
    rows = []
    for ns in schema.node_shapes:
        shape_iri = ns.target_class + "Shape"
        rows.append((shape_iri, vocab.RDF_TYPE, vocab.SH + "NodeShape", None))
        rows.append((shape_iri, vocab.SH + "targetClass", ns.target_class, None))
    for ps in schema.property_shapes:
        pshape = ps.path + "Shape"
        rows.append((pshape, vocab.RDF_TYPE, vocab.SH + "PropertyShape", None))
        rows.append((pshape, vocab.SH + "path", ps.path, None))
        for dt in ps.datatypes:
            rows.append((pshape, vocab.SH + "datatype", dt, None))
        for n in ps.nodes:
            rows.append((pshape, vocab.SH + "node", n + "Shape", None))
        if ps.max_count is not None:
            rows.append((pshape, vocab.SH + "maxCount", None, ps.max_count))
        if ps.pattern:
            rows.append((pshape, vocab.SH + "pattern", None, None, ps.pattern))

    norm = [
        (r[0], r[1], r[2], r[3] if len(r) > 3 else None, r[4] if len(r) > 4 else None)
        for r in rows
    ]
    df = spark.createDataFrame(
        norm, "s string, p string, o_iri string, o_int long, o_str string"
    )
    obj = (
        F.when(F.col("o_iri").isNotNull(), iri_term(F.col("o_iri")))
        .when(F.col("o_int").isNotNull(),
              term_struct(F.lit("integer"), num=F.col("o_int")))
        .otherwise(term_struct(F.lit("string"), text=F.col("o_str")))
    )
    return df.select(
        iri_term(F.col("s")).alias("subject"),
        iri_term(F.col("p")).alias("predicate"),
        obj.alias("object"),
    )
