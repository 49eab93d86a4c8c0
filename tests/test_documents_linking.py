"""Document front-end tests: span-sequence invariant, mention
extraction, deterministic disambiguation, skew profile (FIXTURES.md §1-2,
north-rule per-row invariant)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yago4_spark.operators.linking import (
    candidate_mentions,
    extract_and_link,
    link_entities,
    mentions_to_statements,
)
from yago4_spark.sources.documents import (
    DOCUMENTS_SCHEMA,
    HUB_QID,
    documents_df,
    exploded_text_spans,
    normalize_spans,
    qid_dictionary_df,
    synth_documents,
)


@pytest.fixture(scope="module")
def docs(spark):
    return documents_df(spark, n_docs=200).persist()


@pytest.fixture(scope="module")
def dictionary(spark):
    return qid_dictionary_df(spark)


def test_span_sequence_invariant(spark, docs):
    """normalize_spans must reproduce exactly the offset-sorted input
    sequence (kind, text, media_ref, order) per row — including for the
    docs whose arrays were written shuffled."""
    raw = synth_documents(200)
    expected = {
        doc_id: [
            (s[0], s[1], s[2]) for s in sorted(spans, key=lambda s: s[3])
        ]
        for doc_id, spans in raw
    }
    got_rows = normalize_spans(docs).collect()
    assert len(got_rows) == 200
    for r in got_rows:
        got = [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
        assert got == expected[r["doc_id"]], r["doc_id"]
    # and at least one raw doc really was stored out of order
    assert any(
        [s[3] for s in spans] != sorted(s[3] for s in spans)
        for _, spans in raw
    )


def test_extraction_goldens(spark, dictionary):
    docs = spark.createDataFrame(
        [
            ("d1", [("text", "he met Douglas Adams in Berlin today", None, 0)]),
            ("d2", [("text", "mercury is ambiguous", None, 0)]),
            ("d3", [("text", "Phoenix rises", None, 0)]),
            ("d4", [("text", "nothing to see here", None, 0)]),
            ("d5", [("text", "the human condition", None, 0),
                    ("media", None, "media://x.bin", 20)]),
        ],
        DOCUMENTS_SCHEMA,
    )
    got = {
        (r["doc_id"], r["surface"], r["qid"])
        for r in extract_and_link(docs, dictionary).collect()
    }
    assert got == {
        ("d1", "Douglas Adams", 42),
        ("d1", "Berlin", 64),
        ("d2", "mercury", 7889),   # ambiguous: higher score wins
        ("d3", "Phoenix", 16556),  # score tie: lower qid wins
        ("d5", "human", HUB_QID),
    }


def test_case_variant_scoring(spark, dictionary):
    docs = spark.createDataFrame(
        [("d1", [("text", "berlin and Berlin", None, 0)])], DOCUMENTS_SCHEMA
    )
    rows = extract_and_link(docs, dictionary).collect()
    scores = {r["token_start"]: r["score"] for r in rows}
    assert scores[0] == pytest.approx(0.95 * 0.9)  # lowercase variant
    assert scores[2] == pytest.approx(0.95)        # exact match


def test_longest_match_and_containment(spark):
    dic = qid_dictionary_df(
        spark, [("New York", 60, 0.9), ("York", 61, 0.8), ("New", 62, 0.1)]
    )
    docs = spark.createDataFrame(
        [("d1", [("text", "in New York city", None, 0)])], DOCUMENTS_SCHEMA
    )
    got = {
        (r["surface"], r["qid"])
        for r in extract_and_link(docs, dic).collect()
    }
    # "New York" wins at token 1; "York" at token 2 is contained → dropped
    assert got == {("New York", 60)}


def test_hub_skew_share(docs, dictionary):
    """>=20% of linked mentions hit the hub entity — the fixture must
    keep exercising the salted-aggregation path."""
    mentions = extract_and_link(docs, dictionary).persist()
    total = mentions.count()
    hub = mentions.where(F.col("qid") == HUB_QID).count()
    assert total > 50
    assert hub / total >= 0.2
    # salted two-phase count agrees with plain count per entity
    from yago4_spark.operators.relational import salted_count

    salted = {
        r["qid"]: r["count"]
        for r in salted_count(mentions.select("qid"), ["qid"]).collect()
    }
    plain = {
        r["qid"]: r["count"]
        for r in mentions.groupBy("qid").count().collect()
    }
    assert salted == plain


def test_mentions_to_statements(spark, dictionary):
    docs = spark.createDataFrame(
        [("d9", [("text", "Berlin", None, 0)])], DOCUMENTS_SCHEMA
    )
    st = mentions_to_statements(extract_and_link(docs, dictionary))
    row = st.collect()[0]
    assert row["subject"]["text"] == "http://yago-knowledge.org/document/d9"
    assert row["object"]["kind"] == "item" and row["object"]["num"] == 64
    assert row["predicate_key"] == "iri:http:__schema.org_mentions"


def test_mention_char_offsets(spark, docs, dictionary):
    """Span-level provenance: substring(span_text, char_start, char_end)
    must reproduce every linked mention's surface exactly."""
    spans = exploded_text_spans(docs)
    linked = extract_and_link(docs, dictionary)
    joined = linked.join(
        spans.select("doc_id", "span_idx", "offset", "text"),
        ["doc_id", "span_idx"],
    ).select(
        "surface", "char_start", "char_end",
        F.expr("substring(text, char_start - offset + 1, "
               "char_end - char_start)").alias("cut"),
    )
    rows = joined.collect()
    assert rows
    bad = [r for r in rows if r["cut"] != r["surface"]]
    assert not bad, bad[:3]
