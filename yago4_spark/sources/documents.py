"""Interleaved text+media documents — the graft's input table
(BASELINE.json input_hint):

    doc_id: string
    spans:  array<struct<kind: string, text: string,
                         media_ref: string, offset: int>>

This is the 10^12-document-scale front door. Rules:

- spans are ordered by ``offset``; ingest must re-sort (array_sort on the
  struct with offset leading) because upstream writers may shuffle the
  array — the per-row span-sequence invariant (kind, text, media_ref,
  order) is checked in tests against the offset-sorted input.
- text spans carry ``text`` (media_ref null); media spans carry
  ``media_ref`` (text null).
- the synthesizer is deterministic (seed=42 via Python's random module,
  instantiated locally) and embeds dictionary surface forms, case
  variants, unlinked noise, and a hub entity in >=20% of mentions to
  exercise skew handling (FIXTURES.md §1).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

SPAN_SCHEMA = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
        StructField("offset", IntegerType(), False),
    ]
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN_SCHEMA), False),
    ]
)

QID_DICT_SCHEMA = StructType(
    [
        StructField("surface", StringType(), False),
        StructField("qid", LongType(), False),
        StructField("score", DoubleType(), False),
    ]
)

# the skew hub: >=20% of generated mentions point at it (FIXTURES.md §1)
HUB_QID = 5
HUB_SURFACE = "human"

DEFAULT_DICTIONARY: list[tuple[str, int, float]] = [
    (HUB_SURFACE, HUB_QID, 0.9),
    ("Douglas Adams", 42, 0.99),
    ("Berlin", 64, 0.95),
    # ambiguous surface: two QIDs, distinct scores → argmax by
    # (score desc, qid asc) must pick 7889
    ("Mercury", 7889, 0.8),
    ("Mercury", 925, 0.6),
    # tie score → lower qid wins
    ("Phoenix", 16556, 0.7),
    ("Phoenix", 41735, 0.7),
    ("Dürst", 2002, 0.85),
    ("Paris Hilton", 2004, 0.9),
    ("quantum physics", 944, 0.75),
]

_FILLER = (
    "the of a in and on at for with from into study early later known "
    "wrote moved works lived city famous river border group large small"
).split()


def qid_dictionary_df(spark: SparkSession,
                      entries: list[tuple[str, int, float]] | None = None
                      ) -> DataFrame:
    return spark.createDataFrame(entries or DEFAULT_DICTIONARY, QID_DICT_SCHEMA)


def synth_documents(n_docs: int, seed: int = 42,
                    shuffle_every: int = 5) -> list[tuple[str, list]]:
    """Deterministic interleaved documents. Every ``shuffle_every``-th doc
    has its span array order scrambled (offsets intact) to prove ingest
    re-sorts. ~25% of docs mention the hub surface."""
    rng = random.Random(seed)
    surfaces = [s for s, _, _ in DEFAULT_DICTIONARY if s != HUB_SURFACE]
    docs = []
    for i in range(n_docs):
        spans = []
        offset = 0
        n_spans = rng.randint(2, 6)
        for j in range(n_spans):
            if rng.random() < 0.25:
                spans.append(("media", None, f"media://img/{i}_{j}.bin", offset))
                offset += 1
            else:
                words = [rng.choice(_FILLER) for _ in range(rng.randint(3, 8))]
                mention_roll = rng.random()
                if mention_roll < 0.35:
                    words.insert(rng.randrange(len(words)), HUB_SURFACE)
                elif mention_roll < 0.8:
                    surf = rng.choice(surfaces)
                    if rng.random() < 0.3:
                        surf = surf.lower()
                    words.insert(rng.randrange(len(words)), surf)
                text = " ".join(words)
                spans.append(("text", text, None, offset))
                offset += len(text) + 1
        if i % shuffle_every == shuffle_every - 1 and len(spans) > 1:
            rng.shuffle(spans)
        docs.append((f"doc{i}", spans))
    return docs


def documents_df(spark: SparkSession, n_docs: int = 500, seed: int = 42
                 ) -> DataFrame:
    return spark.createDataFrame(synth_documents(n_docs, seed), DOCUMENTS_SCHEMA)


def normalize_spans(docs: DataFrame) -> DataFrame:
    """Re-sort each row's span array by offset — establishes the
    span-sequence invariant without a shuffle (array_sort is per-row,
    JVM-side). Struct comparison sorts by field order, so ``offset``
    leads the sort struct and the original fields ride along."""
    sorted_spans = F.expr(
        "transform(array_sort(transform(spans, s -> struct(s.offset as offset, s as span))), x -> x.span)"
    )
    return docs.withColumn("spans", sorted_spans)


def exploded_text_spans(docs: DataFrame) -> DataFrame:
    """(doc_id, span_idx, offset, text) for text spans, with the
    post-sort array index carried explicitly (posexplode) so downstream
    never depends on shuffle order (SURVEY §7.4.7)."""
    return (
        normalize_spans(docs)
        .select("doc_id", F.posexplode("spans").alias("span_idx", "span"))
        .where(F.col("span.kind") == "text")
        .select(
            "doc_id", "span_idx",
            F.col("span.offset").alias("offset"),
            F.col("span.text").alias("text"),
        )
    )


def exploded_media_spans(docs: DataFrame) -> DataFrame:
    return (
        normalize_spans(docs)
        .select("doc_id", F.posexplode("spans").alias("span_idx", "span"))
        .where(F.col("span.kind") == "media")
        .select(
            "doc_id", "span_idx",
            F.col("span.offset").alias("offset"),
            F.col("span.media_ref").alias("media_ref"),
        )
    )
