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
    # ONE exchange for the whole linking pipeline, placed where the data
    # is narrowest: the raw span text. HashPartitioning(doc_id) is
    # preserved by every narrow op below (explode, broadcast join) and
    # satisfies the clustering needs of BOTH downstream consumers — the
    # disambiguation groupBy on (doc, span, start) and the containment
    # anti-join on (doc, span) — so neither inserts another shuffle.
    # Shuffling candidates instead (the old shape) moved ~4.5× the rows,
    # each carrying surface strings; measured N→4N scaling efficiency of
    # the linking job was bandwidth-bound at 0.61 under that plan.
    tokens = text_spans.repartition("doc_id").select(
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
    # Prefix prefilter: an n-gram can only match a dictionary surface if
    # its FIRST token matches the surface's first token (both sides are
    # single-space tokenized, so full-string lowercase equality implies
    # first-token equality — no match is lost). Semi-joining the token
    # stream against the broadcast set of dictionary first-tokens BEFORE
    # building n-grams skips the 3-surface string construction for every
    # non-matching start — candidate generation is allocation-bound, and
    # this removes the allocations for the (dominant) miss fraction.
    # (no distinct: left-semi ignores duplicate build keys, and distinct
    # would cost a dictionary-side exchange before the broadcast)
    first_toks = F.broadcast(
        dictionary.select(
            F.lower(F.split(F.col("surface"), " ").getItem(0))
            .alias("_first_lc")
        )
    )
    starts = tokens.select(
        "doc_id", "span_idx", "offset", "tok_pos", "toks",
        F.posexplode(F.col("toks")).alias("token_start", "_tok"),
    ).join(first_toks, F.lower(F.col("_tok")) == F.col("_first_lc"),
           "left_semi")

    # n-grams via slice: one row per (start, len<=max_ngram)
    ngrams = starts.select(
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
    # where WindowExec's sort+buffer anti-scales. No exchange here:
    # candidate_mentions already clusters by doc_id (the one shuffle of
    # the pipeline, on the narrow span text), which satisfies the
    # (doc, span, start) grouping AND the (doc, span) anti-join below.
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
    # its left is dropped. "Exists an earlier chosen mention whose end
    # extends past my start" ⟺ running max of (start + len) over
    # preceding rows > my start — ONE window over the already-
    # disambiguated mentions (unique starts ⇒ deterministic order).
    # Unlike the windows the module notes warn about, this one runs
    # AFTER the hash aggs over a few rows per (doc, span) — a local
    # sort, no exchange (doc_id clustering satisfies it). The previous
    # left-anti self-join formulation recomputed the whole candidate
    # pipeline for its second branch (self-join realiasing defeats
    # exchange reuse), doubling the dominant candidate-generation cost.
    from pyspark.sql import Window

    w = (
        Window.partitionBy("doc_id", "span_idx")
        .orderBy("token_start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_end = F.max(F.col("token_start") + F.col("ngram_len")).over(w)
    return (
        longest.withColumn("_prev_end", prev_end)
        .where(F.col("_prev_end").isNull()
               | (F.col("_prev_end") <= F.col("token_start")))
        .drop("_prev_end")
    )


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
