"""Mention extraction + entity linking — the graft's S1/S2 stages
(north rule: "vectorized Arrow UDFs batch-parse interleaved document
spans into candidate mentions, score entity links against a broadcast
Wikidata QID dictionary").

Design (Spark-first, no per-row Python):

1. **Candidate generation is a JOIN, not a scan-per-row**: text spans are
   tokenized JVM-side (split + posexplode), n-grams up to
   ``max_ngram`` are rebuilt with array slicing, and candidates
   equi-join the broadcast dictionary on the (lowercased) surface.
   This scales as (tokens × max_ngram) rows — linear in corpus size,
   embarrassingly parallel, no Python in the loop.
2. **Scoring + disambiguation**: deterministic argmax per mention
   occurrence by (score DESC, qid ASC) — one hash aggregation (max_by),
   never a sort window (windows anti-scale, see session.py notes).
3. **Skew**: the hub surface ("human"-like, >=20% of mentions) makes the
   per-qid aggregation skewed, NOT the join (the dictionary side is
   broadcast, so there is no shuffle-join skew by construction — this is
   the main reason extraction-as-broadcast-join is the right 100 TB
   design). Downstream per-entity aggregates use salted two-phase
   aggregation (operators.relational.salted_count).
4. Overlapping candidates: longest-match-wins per (doc, span, start
   token), then containment pruning — deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.documents import exploded_text_spans


def candidate_mentions(text_spans: DataFrame, dictionary: DataFrame,
                       max_ngram: int = 3) -> DataFrame:
    """(doc_id, span_idx, token_start, ngram_len, surface, qid, score).

    ``text_spans``: (doc_id, span_idx, offset, text)
    ``dictionary``: (surface, qid, score) — broadcast.

    Case handling: candidates match the dictionary surface lowercased;
    the original surface is carried for exactness scoring (exact-case
    match keeps full score, case-variant matches at score*0.9 — a
    deterministic rule for the fixture's case-variant coverage).
    """
    tokens = text_spans.select(
        "doc_id", "span_idx", "offset",
        F.split(F.col("text"), " ").alias("toks"),
    ).withColumn(
        # char position of each token within the span, one linear fold
        # (span-level provenance: emitted mentions carry char offsets)
        "tok_pos",
        F.expr(
            "aggregate(toks, "
            "struct(0 as acc, cast(array() as array<int>) as ps), "
            "(s, x) -> struct(cast(s.acc + length(x) + 1 as int), "
            "                 array_append(s.ps, s.acc)), "
            "s -> s.ps)"
        ),
    )
    # n-grams via slice: one row per (start, len<=max_ngram)
    ngrams = tokens.select(
        "doc_id", "span_idx", "offset", "tok_pos", "toks",
        F.posexplode(F.col("toks")).alias("token_start", "_tok"),
    ).select(
        "doc_id", "span_idx", "token_start",
        (F.col("offset")
         + F.element_at(F.col("tok_pos"), F.col("token_start") + 1)
         ).alias("char_start"),
        F.explode(
            F.expr(
                f"transform(sequence(1, {max_ngram}), "
                "n -> struct(n as ngram_len, "
                "array_join(slice(toks, token_start + 1, n), ' ') as surface_text, "
                "size(toks) - token_start as remaining))"
            )
        ).alias("g"),
    ).where(
        F.col("g.ngram_len") <= F.col("g.remaining")
    ).select(
        "doc_id", "span_idx", "token_start", "char_start",
        F.col("g.ngram_len").alias("ngram_len"),
        F.col("g.surface_text").alias("surface_text"),
    )

    dic = F.broadcast(
        dictionary.select(
            F.lower(F.col("surface")).alias("surface_lc"),
            F.col("surface").alias("dict_surface"),
            "qid", "score",
        )
    )
    joined = ngrams.join(
        dic, F.lower(F.col("surface_text")) == F.col("surface_lc"), "inner"
    )
    return joined.select(
        "doc_id", "span_idx", "token_start", "ngram_len",
        "char_start",
        (F.col("char_start") + F.length(F.col("surface_text")))
        .alias("char_end"),
        F.col("surface_text").alias("surface"),
        "qid",
        F.when(F.col("surface_text") == F.col("dict_surface"), F.col("score"))
        .otherwise(F.col("score") * 0.9)
        .alias("score"),
    )


def link_entities(candidates: DataFrame) -> DataFrame:
    """Resolve candidates to one entity per mention occurrence.

    1. argmax by (score DESC, qid ASC) per (doc, span, start, len) —
       the deterministic disambiguation rule (FIXTURES.md §2);
    2. longest-match-wins per start token (1+2 fuse into a single
       max_by ordered by (len DESC, score DESC, qid ASC) — identical
       semantics, one hash aggregation);
    3. drop candidates contained inside a longer chosen mention.
    Returns (doc_id, span_idx, token_start, ngram_len, surface, qid,
    score).
    """
    # Both argmax steps are HASH aggregations (max_by over an ordering
    # struct), not sort windows: partial aggregation runs map-side, no
    # per-partition sort, and — measured — hash agg scales with cores
    # where WindowExec's sort+buffer anti-scales. One shuffle on
    # (doc_id, span_idx) serves both aggs (superset grouping keys) and
    # the containment self-join below.
    candidates = candidates.repartition("doc_id", "span_idx")
    # step 1+2 fused: per (doc, span, start) pick by (len DESC, score
    # DESC, qid ASC). Step 1's per-(start,len) argmax by (score, qid) is
    # subsumed: the combined ordering struct resolves (len) first, then
    # exactly step 1's ordering within a length.
    ordering = F.struct(
        F.col("ngram_len"), F.col("score"), (-F.col("qid")).alias("nq")
    )
    longest = (
        candidates.groupBy("doc_id", "span_idx", "token_start")
        .agg(
            F.max_by(F.struct("ngram_len", "surface", "qid", "score",
                              "char_start", "char_end"),
                     ordering).alias("m")
        )
        .select(
            "doc_id", "span_idx", "token_start",
            F.col("m.ngram_len").alias("ngram_len"),
            F.col("m.surface").alias("surface"),
            F.col("m.qid").alias("qid"),
            F.col("m.score").alias("score"),
            F.col("m.char_start").alias("char_start"),
            F.col("m.char_end").alias("char_end"),
        )
    )
    # containment pruning: a mention starting inside a longer mention to
    # its left is dropped. ONE left-anti self-join: equi keys
    # (doc_id, span_idx) — which both sides are already partitioned on,
    # so no new exchange — with the containment range as an extra join
    # condition. The MERGE hint stops AQE from broadcasting the (large)
    # build side, which would be a single-threaded driver hash build.
    marks = longest.select(
        F.col("doc_id").alias("m_doc"),
        F.col("span_idx").alias("m_span"),
        F.col("token_start").alias("l_start"),
        F.col("ngram_len").alias("l_len"),
    )
    cond = (
        (F.col("doc_id") == F.col("m_doc"))
        & (F.col("span_idx") == F.col("m_span"))
        & (F.col("l_start") < F.col("token_start"))
        & (F.col("token_start") < F.col("l_start") + F.col("l_len"))
    )
    return longest.hint("merge").join(marks, cond, "left_anti")


def extract_and_link(docs: DataFrame, dictionary: DataFrame,
                     max_ngram: int = 3) -> DataFrame:
    """documents → linked mentions (the S1+S2 composition)."""
    return link_entities(
        candidate_mentions(exploded_text_spans(docs), dictionary, max_ngram)
    )


def mentions_to_statements(mentions: DataFrame) -> DataFrame:
    """Emit (subject, predicate, object) term structs: doc IRI
    --schema:mentions--> wd entity, the graft's statement emission into
    the same triple shape the KG pipeline consumes."""
    from ..plans.facts import iri_term, term_struct
    from .. import terms as T

    out = mentions.select(
        iri_term(
            F.concat(F.lit("http://yago-knowledge.org/document/"), F.col("doc_id"))
        ).alias("subject"),
        iri_term(F.lit("http://schema.org/mentions")).alias("predicate"),
        term_struct(F.lit("item"), num=F.col("qid")).alias("object"),
    )
    return out.withColumn(
        "predicate_key", T.predicate_key_col(F.col("predicate"))
    )
