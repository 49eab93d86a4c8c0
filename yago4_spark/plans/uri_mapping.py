"""S3+S4: sitelink mapping and the 4-priority Wikidata→YAGO URI mapping.

Reference: ``wikidata_to_enwikipedia_mapping`` (src/plan.rs:206-223) and
``wikidata_to_yago_uris_mapping`` (src/plan.rs:227-382).

Internal representation: Wikidata items travel as plain ``qid`` longs
(the term-struct ``num`` field) — entity joins are long-key hash joins,
the distributed analog of the reference's ``WikidataItem(u32)`` inlining.

The reference holds the full ~60M-pair mapping in driver RAM; here it is
an ordinary DataFrame — joins against it shuffle (AQE picks broadcast
when a slice is small enough). Priority merge is one window over qid
(see operators.relational.priority_union), not order-dependent unions.
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import vocab
from ..functions.iri import decode_then_encode_iri_path, encode_iri_path
from ..operators.relational import priority_union
from ..sources.statements import StatementsTable
from .shapes import Schema


class YagoSize(Enum):
    FULL = "full"
    ALL_WIKIPEDIAS = "all-wikis"
    ENGLISH_WIKIPEDIA = "en-wiki"


def wikidata_to_enwiki_mapping(st: StatementsTable) -> DataFrame:
    """(qid, wp) for items with an English Wikipedia article
    (src/plan.rs:206-223). One deterministic article per item (the
    reference's HashMap keeps an arbitrary one; we min() for stability)."""
    about = st.scan("schema:about")
    return (
        about.where(
            (F.col("subject.kind") == "iri")
            & F.col("subject.text").startswith(vocab.ENWIKI_ARTICLE_PREFIX)
            & (F.col("object.kind") == "item")
        )
        .groupBy(F.col("object.num").alias("qid"))
        .agg(F.min(F.col("subject.text")).alias("wp"))
    )


def wikidata_items(st: StatementsTable) -> DataFrame:
    """All qids with rdf:type wikibase:Item (src/plan.rs:236-242)."""
    return (
        st.scan("rdf:type")
        .where(
            (F.col("object.kind") == "iri")
            & (F.col("object.text") == vocab.WIKIBASE_ITEM)
            & (F.col("subject.kind") == "item")
        )
        .select(F.col("subject.num").alias("qid"))
        .distinct()
    )


def items_with_any_wikipedia(st: StatementsTable) -> DataFrame:
    return (
        st.scan("schema:about")
        .where(
            (F.col("subject.kind") == "iri")
            & F.col("subject.text").contains(".wikipedia.org/wiki/")
            & (F.col("object.kind") == "item")
        )
        .select(F.col("object.num").alias("qid"))
        .distinct()
    )


def items_to_keep(
    spark: SparkSession, st: StatementsTable, size: YagoSize
) -> DataFrame:
    """Size filter (src/plan.rs:263-282) + the 2 mandatory items."""
    if size == YagoSize.FULL:
        base = wikidata_items(st)
    elif size == YagoSize.ALL_WIKIPEDIAS:
        base = items_with_any_wikipedia(st)
    else:
        base = wikidata_to_enwiki_mapping(st).select("qid")
    mandatory = spark.createDataFrame(
        [(q,) for q in vocab.MANDATORY_WD_ITEMS], "qid long"
    )
    return base.unionByName(mandatory).distinct()


def english_labels(st: StatementsTable) -> DataFrame:
    """(qid, label) for skos:prefLabel@en, deterministic min pick
    (src/plan.rs:317-329)."""
    return (
        st.scan("skos:prefLabel")
        .where(
            (F.col("subject.kind") == "item")
            & (F.col("object.kind") == "langString")
            & (F.col("object.lang") == "en")
        )
        .groupBy(F.col("subject.num").alias("qid"))
        .agg(F.min(F.col("object.text")).alias("label"))
    )


def schema_class_mapping(spark: SparkSession, schema: Schema) -> DataFrame:
    """Priority-0 mapping: ys:fromClass QID → schema.org class IRI
    (src/plan.rs:284-294). Driver-sized config → broadcast everywhere."""
    rows = [
        (qid, ns.target_class)
        for ns in schema.node_shapes
        for qid in ns.from_classes
    ]
    return spark.createDataFrame(rows or [], "qid long, yago string")


def build_uri_mapping(
    spark: SparkSession,
    st: StatementsTable,
    schema: Schema,
    size: YagoSize = YagoSize.FULL,
) -> DataFrame:
    """The merged (qid, yago) URI mapping with first-source-wins priority:
    schema mapping > enwiki title > english label + _Q{id} > _Q{id}
    (src/plan.rs:296-379).
    """
    keep = items_to_keep(spark, st, size)
    enwiki = wikidata_to_enwiki_mapping(st).join(keep, "qid", "left_semi")

    from_wikipedia = enwiki.select(
        "qid",
        F.concat(
            F.lit(vocab.YAGO_RESOURCE_PREFIX),
            decode_then_encode_iri_path(
                F.expr(f"substring(wp, {len(vocab.ENWIKI_ARTICLE_PREFIX) + 1})")
            ),
        ).alias("yago"),
    )

    from_label = (
        english_labels(st)
        .join(keep, "qid", "left_semi")
        .select(
            "qid",
            F.concat(
                F.lit(vocab.YAGO_RESOURCE_PREFIX),
                encode_iri_path(F.col("label")),
                F.lit("_Q"),
                F.col("qid").cast("string"),
            ).alias("yago"),
        )
    )

    fallback = keep.select(
        "qid",
        F.concat(
            F.lit(vocab.YAGO_RESOURCE_PREFIX + "_Q"), F.col("qid").cast("string")
        ).alias("yago"),
    )

    from_schema = F.broadcast(schema_class_mapping(spark, schema))
    return priority_union(
        [from_schema, from_wikipedia, from_label, fallback], key="qid"
    )


def map_to_yago(df: DataFrame, uri_mapping: DataFrame, qid_col: str,
                out_col: str) -> DataFrame:
    """Semi-join + remap (src/plan.rs:2204-2223): rows whose ``qid_col``
    is unmapped are DROPPED (inner-join semantics)."""
    mapped = df.join(
        uri_mapping.withColumnRenamed("qid", qid_col).withColumnRenamed("yago", out_col),
        qid_col,
        "inner",
    )
    return mapped.drop(qid_col)
