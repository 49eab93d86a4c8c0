"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` demonstrates every operator class from SURVEY.md §2 (plus
the training-data extensions) against the driver's parquet tables;
``oracle_sql()`` gives the DuckDB twin for each (column names and value
formatting matched so the driver's order-insensitive value hash agrees).
``entry()`` runs the flagship graft slice: documents → candidate
mentions → entity linking → salted per-entity aggregation.

Engine implementation lives in ``yago4_spark/`` (see SURVEY.md §7).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# flagship: the graft slice (span docs → mention candidates → linking →
# salted per-entity aggregation). Uses the engine's operators directly.
# --------------------------------------------------------------------------

DEMO_DICT = [
    ("spark", 101, 0.9),
    ("query", 103, 0.85),
    ("data", 104, 0.7),
    ("data", 204, 0.7),          # score tie → qid asc wins (104)
    ("hash join", 106, 0.95),
    ("hash", 107, 0.5),
    ("merge batch", 108, 0.8),
    ("window", 109, 0.6),
    # "join" overlaps the tail of "hash join": standalone occurrences
    # are legit mentions, occurrences inside a chosen "hash join" are
    # CONTAINED and must be pruned — keeps link_entities' containment
    # path live in the driver-gate corpus (the round-5 ops mutation
    # sweep found it vacuous without this: no dictionary surface
    # started inside another match)
    ("join", 110, 0.45),
]


def _text_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.lit(0).alias("span_idx"),
        F.lit(0).alias("offset"),
        "text",
    )


def _dict_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        DEMO_DICT, "surface string, qid long, score double"
    )


def entry(spark: SparkSession) -> DataFrame:
    """documents(sf0.001) → extract candidate mentions (token n-gram ×
    broadcast dictionary join) → deterministic disambiguation → salted
    two-phase per-entity counts."""
    from yago4_spark.operators.linking import candidate_mentions, link_entities
    from yago4_spark.operators.relational import salted_count

    sf_dir = "/root/testdata/sf0.001"
    spans = _text_spans(spark, sf_dir)
    linked = link_entities(candidate_mentions(spans, _dict_df(spark)))
    counts = salted_count(linked.select("qid"), ["qid"])
    return counts.select("qid", F.col("count").alias("mention_count")).orderBy(
        "qid"
    )


# --------------------------------------------------------------------------
# operator demo queries (SURVEY.md §2 → TPC-H-ish tables)
# --------------------------------------------------------------------------

def q_lineitem_scan(spark, sf):
    """§2.1 predicate scan + §2.2 filter/projection (pushdown + pruning)."""
    return (
        _t(spark, sf, "lineitem")
        .where((F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 45))
        .select("l_orderkey", "l_partkey", "l_quantity")
    )


def q_first_order_per_customer(spark, sf):
    """§2.1 first-object pick, deterministic (min by order date, key)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        _t(spark, sf, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


def q_parts_semi_join(spark, sf):
    """§2.3 semi join (existence probe)."""
    li = _t(spark, sf, "lineitem").where(F.col("l_quantity") >= 49)
    return (
        _t(spark, sf, "part")
        .join(li.select(F.col("l_partkey").alias("p_partkey")), "p_partkey",
              "left_semi")
        .select("p_partkey", "p_name")
    )


def q_customers_anti_join(spark, sf):
    """§2.3 anti join (bad-class exclusion pattern)."""
    o = _t(spark, sf, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return (
        _t(spark, sf, "customer")
        .join(o, "c_custkey", "left_anti")
        .select("c_custkey", "c_name")
    )


def q_revenue_by_nation(spark, sf):
    """§2.3 n-way equi-join with broadcast dims + §2.4 aggregation."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = F.broadcast(_t(spark, sf, "nation"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def q_customers_min_orders(spark, sf):
    """§2.4 group+count>=threshold — the P31 hub pattern, salted
    two-phase aggregation under the hood."""
    from yago4_spark.operators.relational import salted_count

    counts = salted_count(
        _t(spark, sf, "orders").select("o_custkey"), ["o_custkey"]
    )
    return counts.where(F.col("count") >= 12).select(
        "o_custkey", F.col("count").alias("order_cnt")
    )


def q_orders_maxcount_filter(spark, sf):
    """§2.4 SHACL sh:maxCount: drop ALL rows of keys exceeding the cap."""
    from yago4_spark.operators.relational import max_count_filter

    return max_count_filter(
        _t(spark, sf, "orders").select("o_orderkey", "o_custkey"),
        ["o_custkey"], 8,
    )


def q_priority_union_tiers(spark, sf):
    """§2.5 priority union (first-source-wins, URI-mapping pattern)."""
    from yago4_spark.operators.relational import priority_union

    c = _t(spark, sf, "customer")
    high = c.where(F.col("c_acctbal") > 5000).select(
        "c_custkey", F.lit("high").alias("tier")
    )
    std = c.select("c_custkey", F.lit("std").alias("tier"))
    return priority_union([high, std], key="c_custkey")


def q_suppkeys_intersect(spark, sf):
    """§2.5 set intersection."""
    a = _t(spark, sf, "lineitem").select(F.col("l_suppkey").alias("suppkey"))
    b = _t(spark, sf, "supplier").where(F.col("s_acctbal") > 2000).select(
        F.col("s_suppkey").alias("suppkey")
    )
    return a.intersect(b)


def q_closure_custkey_tree(spark, sf):
    """§2.6 transitive closure as iterative DataFrame self-joins over the
    halving tree c → c/2 (descendants of node 3)."""
    from yago4_spark.operators.closure import transitive_closure

    c = _t(spark, sf, "customer")
    edges = c.where(F.col("c_custkey") > 1).select(
        (F.col("c_custkey") / 2).cast("long").alias("src"),
        F.col("c_custkey").alias("dst"),
    )
    seeds = spark.createDataFrame([(3,)], "node long")
    return transitive_closure(seeds, edges)


def q_top_orders_per_customer(spark, sf):
    """§2.10 window ranking (reference gap we fill)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        _t(spark, sf, "orders")
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )


def q_events_hourly(spark, sf):
    """§2.10 streaming analog: tumbling 1h window aggregation (batch
    form; Structured Streaming shares the same plan)."""
    e = _t(spark, sf, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")),
                          "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


# --- training-data ops ------------------------------------------------

def q_events_sessions(spark, sf):
    """§2.10 session windows (gaps-and-islands batch twin of the
    applyInPandasWithState streaming operator, streaming/sessions.py)."""
    from yago4_spark.streaming.sessions import sessionize_events

    return sessionize_events(_t(spark, sf, "events"), gap_minutes=60)


def q_doc_text_stats(spark, sf):
    from yago4_spark.functions.text import (
        fingerprint,
        mean_word_length,
        token_count,
    )

    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.round(mean_word_length(F.col("text")), 6).alias("mean_word_len"),
        fingerprint(F.col("text")).alias("fp"),
    )


def q_doc_lang_id(spark, sf):
    from yago4_spark.functions.text import lang_id

    return _t(spark, sf, "documents").select(
        "doc_id", lang_id(F.col("text")).alias("lang")
    )


def _doubled_docs(spark, sf):
    d = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    return d.unionByName(
        d.select(F.concat(F.col("doc_id"), F.lit("_c")).alias("doc_id"), "text")
    )


def q_doc_quality(spark, sf):
    """Composite quality score + BPE-ish token estimate per document
    (functions/text.py quality_score / bpe_ish_token_count)."""
    from yago4_spark.functions.text import bpe_ish_token_count, quality_score

    return _t(spark, sf, "documents").select(
        "doc_id",
        quality_score(F.col("text")).alias("quality"),
        bpe_ish_token_count(F.col("text")).alias("bpe_tokens"),
    )


def q_dedup_exact(spark, sf):
    """Exact dedup (hash groupBy) over a corpus with planted duplicates."""
    from yago4_spark.operators.dedup import exact_duplicates

    groups = exact_duplicates(_doubled_docs(spark, sf))
    return groups.select(
        "fp", "dup_count", F.array_min("doc_ids").alias("min_doc_id")
    )


def q_dedup_exact_canonical(spark, sf):
    """Skew-safe exact dedup: per-member (doc_id, canonical, dup_count)
    via min/count aggregates + join back — no per-group collect_list
    row (the single-row hub hazard of plain exact_duplicates)."""
    from yago4_spark.operators.dedup import exact_dedup_canonical

    return exact_dedup_canonical(_doubled_docs(spark, sf))


def q_dedup_minhash_lsh(spark, sf):
    """MinHash+LSH candidate pairs (shingle→minhash→band→bucket join)."""
    from yago4_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _doubled_docs(spark, sf), n=3, num_hashes=8, bands=2
    )


def q_dedup_ngram_jaccard(spark, sf):
    """n-gram Jaccard near-dup pairs (shingle-blocked, never all-pairs)."""
    from yago4_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_doubled_docs(spark, sf), n=3, threshold=0.8)


def q_dedup_clusters(spark, sf):
    """Duplicate-cluster construction: connected components over the
    MinHash-LSH pair graph via iterative min-label propagation —
    (doc_id, canonical); a dedup pipeline keeps doc_id == canonical.
    Oracle: WITH RECURSIVE reachability + MIN per component."""
    from yago4_spark.operators.dedup import dup_clusters, minhash_lsh_pairs

    return dup_clusters(
        minhash_lsh_pairs(_doubled_docs(spark, sf), n=3, num_hashes=8,
                          bands=2))


def q_dedup_simhash_pairs(spark, sf):
    """SimHash near-dup pairs: banded blocking with a pigeonhole
    guarantee (4 bands of 4 bits — exact for hamming <= 3), grouped-
    pairs candidate generation, integer xor+bit_count verify."""
    from yago4_spark.operators.dedup import simhash_near_dup_pairs

    return simhash_near_dup_pairs(_doubled_docs(spark, sf), bits=16,
                                  n_bands=4, max_hamming=3)


def q_doc_simhash(spark, sf):
    from yago4_spark.operators.dedup import simhash

    return simhash(
        _t(spark, sf, "documents").select(
            F.col("doc_id").cast("string").alias("doc_id"), "text"
        ),
        bits=16,
    )


def q_doc_simhash64(spark, sf):
    """Production-width (64-bit) simhash: bits 0-31 from the md5 hex
    nibbles' low bit, bits 32-63 from the same nibbles' second bit —
    two independent lanes from one md5 (round-4 trap: reading hex digit
    b directly silently zeroed bits >= 32). Bit 63 lands in the long's
    sign bit, so hashes can be negative."""
    from yago4_spark.operators.dedup import simhash

    return simhash(
        _t(spark, sf, "documents").select(
            F.col("doc_id").cast("string").alias("doc_id"), "text"
        ),
        bits=64,
    )


def q_dedup_simhash_pairs64(spark, sf):
    """64-bit simhash near-dup pairs: 4 bands of 16 bits (pigeonhole-
    exact for hamming <= 3), arithmetic-shift+mask band extraction
    (portable across Spark and DuckDB for negative hashes), xor +
    bit_count verify."""
    from yago4_spark.operators.dedup import simhash_near_dup_pairs

    return simhash_near_dup_pairs(_doubled_docs(spark, sf), bits=64,
                                  n_bands=4, max_hamming=3)


_ANN_QUERY = [1.0] + [0.0] * 63


def q_ann_cosine_topk(spark, sf):
    """Brute-force cosine top-k (exact ANN baseline)."""
    from yago4_spark.operators.similarity import cosine_topk

    return cosine_topk(_t(spark, sf, "embeddings"), _ANN_QUERY, k=10)


def q_ann_ivf_topk(spark, sf):
    """IVF-bucketed approximate top-k (the 100 TB scale path): probe the
    n_probe cells nearest the query, brute-force inside them. Oracle
    replicates the deterministic centroid pick + rounded-cosine argmax
    assignment in SQL."""
    from yago4_spark.operators.similarity import ivf_topk

    return ivf_topk(_t(spark, sf, "embeddings"), _ANN_QUERY, k=10,
                    n_cells=8, n_probe=4)


def q_media_features(spark, sf):
    """Real multimodal decode (VERDICT r03 item 4): one synthetic media
    object per document (media://obj/<doc_id> — even md5 lead byte →
    binary PPM image, odd → PCM WAV), payload bytes generated and then
    REALLY decoded (header parse + numpy pixels / stdlib wave) by
    std-only kernels in functions/media.py. The oracle recomputes the
    expected kind/width/height/duration from the md5 formulas in SQL —
    a broken encoder OR parser breaks the match. Features (pixel/energy
    stats) aren't SQL-expressible; they're golden-tested in
    tests/test_training_ops.py."""
    from yago4_spark.functions.media import (
        decode_media_payloads,
        synth_media_payloads,
    )

    refs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit(0).alias("span_idx"),
        F.concat(F.lit("media://obj/"), F.col("doc_id").cast("string"))
        .alias("media_ref"),
    )
    return decode_media_payloads(synth_media_payloads(refs)).select(
        "doc_id", "media_ref", "media_kind", "width", "height", "duration_ms"
    )


_ANN_BATCH = [
    (0, [1.0] + [0.0] * 63),
    (1, [0.0] * 7 + [1.0] + [0.0] * 56),
    (2, [0.5] * 16 + [0.0] * 48),
]


def q_ann_ivf_topk_batch(spark, sf):
    """Batched IVF top-k: one cell-assignment job amortized across a
    3-query batch (the query-workload shape of ivf_topk — VERDICT r03
    item 3). Oracle replicates the assignment + per-query probe + per-
    query top-k in SQL; centroids use the oracle-simple first-n seed."""
    from yago4_spark.operators.similarity import ivf_topk_batch

    return ivf_topk_batch(_t(spark, sf, "embeddings"), _ANN_BATCH, k=5,
                          n_cells=8, n_probe=4)


_NEAR_DUP_MAX_BLOCK = 40  # small enough that sf0.01's 500 vectors split


def q_embedding_near_dup(spark, sf):
    """Embedding-cosine near-dup pairs, blocked by the label column
    (threshold tuned to the synthetic corpus's similarity range so the
    check is non-vacuous). Hub-block cap: blocks larger than
    _NEAR_DUP_MAX_BLOCK are sub-split ceil(n/max) ways by vec_id modulo
    (deterministic, mirrored in the oracle SQL) so no single block goes
    O(n²) — the same cap embedding_near_dup_pairs applies per IVF cell."""
    from yago4_spark.operators.similarity import cosine

    e = _t(spark, sf, "embeddings")
    counts = e.groupBy("label").agg(F.count(F.lit(1)).alias("_n"))
    n_blocks = F.greatest(
        F.lit(1).cast("long"),
        F.ceil(F.col("_n") / F.lit(_NEAR_DUP_MAX_BLOCK)).cast("long"),
    )
    e = (
        e.join(F.broadcast(counts), "label")
        .withColumn("block", F.pmod(F.col("vec_id"), n_blocks))
    )
    a = e.select(F.col("label"), F.col("block"),
                 F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = e.select(F.col("label"), F.col("block"),
                 F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    return (
        a.join(b, ["label", "block"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(cosine(F.col("va").cast("array<double>"),
                           F.col("vb").cast("array<double>")), 6).alias("sim"),
        )
        .where(F.col("sim") >= 0.4)
    )


def q_mention_candidates(spark, sf):
    """Entity-linking candidates: token n-grams × broadcast dictionary,
    disambiguated per occurrence by (score DESC, qid ASC)."""
    from yago4_spark.operators.linking import candidate_mentions

    cands = candidate_mentions(
        _text_spans(spark, sf), _dict_df(spark), max_ngram=2
    )
    w = Window.partitionBy("doc_id", "span_idx", "token_start",
                           "ngram_len").orderBy(
        F.col("score").desc(), F.col("qid").asc()
    )
    return (
        cands.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "token_start", "ngram_len", "char_start",
                "char_end", "surface", "qid",
                F.round("score", 6).alias("score"))
    )


def q_linked_mentions(spark, sf):
    """Full linking pipeline (candidate_mentions → link_entities):
    fused longest-match + (score DESC, qid ASC) disambiguation per
    start token, then containment pruning (a mention starting inside a
    longer chosen mention to its left is dropped). Oracle replicates
    the argmax and the running-max prune window in SQL — this is the
    oracle twin for operators/linking.py:138-205, which
    mention_candidates alone does not cover."""
    from yago4_spark.operators.linking import candidate_mentions, link_entities

    linked = link_entities(candidate_mentions(
        _text_spans(spark, sf), _dict_df(spark), max_ngram=2))
    return linked.select(
        "doc_id", "token_start", "ngram_len", "char_start", "char_end",
        "surface", "qid", F.round("score", 6).alias("score"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "lineitem_scan": q_lineitem_scan,
        "first_order_per_customer": q_first_order_per_customer,
        "parts_semi_join": q_parts_semi_join,
        "customers_anti_join": q_customers_anti_join,
        "revenue_by_nation": q_revenue_by_nation,
        "customers_min_orders": q_customers_min_orders,
        "orders_maxcount_filter": q_orders_maxcount_filter,
        "priority_union_tiers": q_priority_union_tiers,
        "suppkeys_intersect": q_suppkeys_intersect,
        "closure_custkey_tree": q_closure_custkey_tree,
        "top_orders_per_customer": q_top_orders_per_customer,
        "events_hourly": q_events_hourly,
        "events_sessions": q_events_sessions,
        "doc_text_stats": q_doc_text_stats,
        "doc_lang_id": q_doc_lang_id,
        "doc_quality": q_doc_quality,
        "dedup_exact": q_dedup_exact,
        "dedup_exact_canonical": q_dedup_exact_canonical,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "doc_simhash": q_doc_simhash,
        "doc_simhash64": q_doc_simhash64,
        "dedup_simhash_pairs": q_dedup_simhash_pairs,
        "dedup_simhash_pairs64": q_dedup_simhash_pairs64,
        "dedup_clusters": q_dedup_clusters,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_ivf_topk_batch": q_ann_ivf_topk_batch,
        "media_features": q_media_features,
        "embedding_near_dup": q_embedding_near_dup,
        "mention_candidates": q_mention_candidates,
        "linked_mentions": q_linked_mentions,
    }


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

_LANG_PROFILES_SQL = {
    "en": "['the','and','of','to','a','in','is','it','for','on']",
    "de": "['der','die','das','und','ist','nicht','ein','mit','zu','ich']",
    "fr": "['le','la','les','et','est','une','pour','dans','que','pas']",
    "es": "['el','la','los','y','es','una','para','en','que','no']",
}

_SHINGLES_SQL = """
WITH corpus AS (
    SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
    UNION ALL
    SELECT CAST(doc_id AS VARCHAR) || '_c', text FROM documents
), toks AS (
    SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS a
    FROM corpus
), sh AS (
    SELECT DISTINCT doc_id,
           array_to_string(a[i:i+2], ' ') AS shingle
    FROM toks, LATERAL (SELECT unnest(generate_series(1, len(a) - 2)) AS i)
    WHERE len(a) >= 3
)
"""


def oracle_sql() -> dict[str, str]:
    lang_hits = ", ".join(
        f"len(list_distinct(list_intersect(toks, {arr}))) AS h_{lang}"
        for lang, arr in _LANG_PROFILES_SQL.items()
    )
    return {
        "lineitem_scan": """
            SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
            WHERE l_returnflag = 'R' AND l_quantity >= 45
        """,
        "first_order_per_customer": """
            SELECT o_custkey, o_orderkey, o_orderdate FROM (
                SELECT o_custkey, o_orderkey, o_orderdate,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey) rn
                FROM orders) WHERE rn = 1
        """,
        "parts_semi_join": """
            SELECT p_partkey, p_name FROM part
            WHERE EXISTS (SELECT 1 FROM lineitem
                          WHERE l_partkey = p_partkey AND l_quantity >= 49)
        """,
        "customers_anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "revenue_by_nation": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_lineitems
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "customers_min_orders": """
            SELECT o_custkey, count(*) AS order_cnt FROM orders
            GROUP BY o_custkey HAVING count(*) >= 12
        """,
        "orders_maxcount_filter": """
            SELECT o_orderkey, o_custkey FROM orders
            QUALIFY count(*) OVER (PARTITION BY o_custkey) <= 8
        """,
        "priority_union_tiers": """
            SELECT c_custkey, tier FROM (
                SELECT c_custkey, tier, prio,
                       row_number() OVER (PARTITION BY c_custkey
                                          ORDER BY prio) rn
                FROM (
                    SELECT c_custkey, 'high' AS tier, 0 AS prio FROM customer
                    WHERE c_acctbal > 5000
                    UNION ALL
                    SELECT c_custkey, 'std', 1 FROM customer
                )) WHERE rn = 1
        """,
        "suppkeys_intersect": """
            SELECT l_suppkey AS suppkey FROM lineitem
            INTERSECT
            SELECT s_suppkey FROM supplier WHERE s_acctbal > 2000
        """,
        "closure_custkey_tree": """
            WITH RECURSIVE r(node) AS (
                SELECT CAST(3 AS BIGINT)
                UNION
                SELECT c.c_custkey FROM customer c, r
                WHERE c.c_custkey // 2 = r.node
                  AND c.c_custkey > 1
            ) SELECT node FROM r
        """,
        "top_orders_per_customer": """
            SELECT o_custkey, o_orderkey, rnk FROM (
                SELECT o_custkey, o_orderkey,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC,
                                                   o_orderkey ASC) rnk
                FROM orders) WHERE rnk <= 3
        """,
        "events_hourly": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                   event_type,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "events_sessions": """
            WITH marked AS (
                SELECT user_id, ts, event_id, value,
                       CASE WHEN lag(ts) OVER w IS NULL
                            OR ts > lag(ts) OVER w + INTERVAL 3600 SECONDS
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sess AS (
                SELECT *, sum(new_s) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS sid
                FROM marked
            )
            SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
                   count(*) AS n_events, round(sum(value), 2) AS sum_value
            FROM sess GROUP BY user_id, sid
        """,
        "doc_text_stats": r"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+'))
                   END AS n_tokens,
                   round(len(regexp_replace(text, '\s+', '', 'g')) * 1.0 /
                         greatest(CASE WHEN trim(text) = '' THEN 0
                                       ELSE len(regexp_split_to_array(trim(text), '\s+'))
                                  END, 1), 6) AS mean_word_len,
                   md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
            FROM documents
        """,
        "doc_lang_id": rf"""
            WITH t AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS toks
                FROM documents
            ), h AS (
                SELECT doc_id, {lang_hits} FROM t
            )
            SELECT doc_id,
                   CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
                        WHEN h_de = greatest(h_en, h_de, h_fr, h_es) THEN 'de'
                        WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
                        WHEN h_es = greatest(h_en, h_de, h_fr, h_es) THEN 'es'
                        ELSE 'fr' END AS lang
            FROM h
        """,
        "doc_quality": r"""
            WITH t AS (
                SELECT doc_id, text,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\s+'))
                       END AS n
                FROM documents
            ), m AS (
                SELECT doc_id, text, n,
                       len(regexp_replace(text, '\s+', '', 'g')) * 1.0e0 /
                           greatest(n, 1) AS mwl,
                       len(regexp_replace(text, '[^.,;:!?''"()\[\]-]', '', 'g')) * 1.0e0 /
                           greatest(len(text), 1) AS pr
                FROM t
            )
            SELECT doc_id,
                   round((CASE WHEN n >= 10 AND n <= 10000 THEN 1.0e0 ELSE 0.3e0 END) * 0.4e0 +
                         (CASE WHEN mwl >= 2.0e0 AND mwl <= 12.0e0 THEN 1.0e0 ELSE 0.4e0 END) * 0.4e0 +
                         (CASE WHEN pr <= 0.2e0 THEN 1.0e0 ELSE 0.5e0 END) * 0.2e0, 6) AS quality,
                   (CASE WHEN trim(text) = '' THEN 0
                         ELSE len(regexp_split_to_array(
                                  trim(regexp_replace(text, '[^A-Za-z0-9\s]', ' ', 'g')),
                                  '\s+'))
                    END) +
                   len(regexp_replace(text, '[A-Za-z0-9]+|\s+', '', 'g')) AS bpe_tokens
            FROM m
        """,
        "dedup_exact": r"""
            WITH corpus AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
                UNION ALL
                SELECT CAST(doc_id AS VARCHAR) || '_c', text FROM documents
            ), fps AS (
                SELECT doc_id,
                       md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
                FROM corpus
            )
            SELECT fp, count(*) AS dup_count, min(doc_id) AS min_doc_id
            FROM fps GROUP BY fp HAVING count(*) > 1
        """,
        "dedup_exact_canonical": r"""
            WITH corpus AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
                UNION ALL
                SELECT CAST(doc_id AS VARCHAR) || '_c', text FROM documents
            ), fps AS (
                SELECT doc_id,
                       md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
                FROM corpus
            ), groups AS (
                SELECT fp, min(doc_id) AS canonical, count(*) AS dup_count
                FROM fps GROUP BY fp HAVING count(*) > 1
            )
            SELECT fps.doc_id, g.canonical, g.dup_count
            FROM fps JOIN groups g USING (fp)
        """,
        "dedup_minhash_lsh": _SHINGLES_SQL + r"""
        , seeded AS (
            SELECT doc_id, i AS h,
                   min(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS mh
            FROM sh, LATERAL (SELECT unnest(generate_series(0, 7)) AS i)
            GROUP BY doc_id, i
        ), sigs AS (
            SELECT doc_id, array_agg(mh ORDER BY h) AS sig
            FROM seeded GROUP BY doc_id
        ), buckets AS (
            SELECT doc_id, b AS band,
                   md5(array_to_string(sig[b*4+1:b*4+4], '|')) AS bucket
            FROM sigs, LATERAL (SELECT unnest([0, 1]) AS b)
        ), kept AS (
            SELECT band, bucket FROM buckets GROUP BY band, bucket
            HAVING count(*) BETWEEN 2 AND 4096
        )
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM buckets a
        JOIN kept USING (band, bucket)
        JOIN buckets b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        """,
        "dedup_ngram_jaccard": _SHINGLES_SQL + r"""
        , hot AS (
            SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > 1000
        ), shc AS (
            SELECT sh.* FROM sh ANTI JOIN hot USING (shingle)
        ), sizes AS (
            SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id
        ), common AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
            FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               round(common * 1.0 / (sa.n_sh + sb.n_sh - common), 6) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE common * 1.0 / (sa.n_sh + sb.n_sh - common) >= 0.8
        """,
        "doc_simhash": r"""
            WITH toks AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id, tok,
                       count(*) AS w, md5(tok) AS h
                FROM (SELECT doc_id,
                             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
                      FROM documents)
                GROUP BY doc_id, tok
            ), bits AS (
                SELECT doc_id, b AS bit,
                       sum(CASE WHEN substring(h, b + 1, 1) IN
                                ('1','3','5','7','9','b','d','f')
                                THEN w ELSE -w END) AS s
                FROM toks, LATERAL (SELECT unnest(generate_series(0, 15)) AS b)
                GROUP BY doc_id, b
            )
            SELECT doc_id,
                   CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, bit) AS BIGINT)
                                 ELSE 0 END) AS BIGINT) AS simhash
            FROM bits GROUP BY doc_id
        """,
        "dedup_clusters": _SHINGLES_SQL.replace(
            "WITH corpus", "WITH RECURSIVE corpus") + r"""
        , seeded AS (
            SELECT doc_id, i AS h,
                   min(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS mh
            FROM sh, LATERAL (SELECT unnest(generate_series(0, 7)) AS i)
            GROUP BY doc_id, i
        ), sigs AS (
            SELECT doc_id, array_agg(mh ORDER BY h) AS sig
            FROM seeded GROUP BY doc_id
        ), buckets AS (
            SELECT doc_id, b AS band,
                   md5(array_to_string(sig[b*4+1:b*4+4], '|')) AS bucket
            FROM sigs, LATERAL (SELECT unnest([0, 1]) AS b)
        ), kept AS (
            SELECT band, bucket FROM buckets GROUP BY band, bucket
            HAVING count(*) BETWEEN 2 AND 4096
        ), pairs AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM buckets a
            JOIN kept USING (band, bucket)
            JOIN buckets b
              ON a.band = b.band AND a.bucket = b.bucket
             AND a.doc_id < b.doc_id
        ), edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION
            SELECT id_b, id_a FROM pairs
        ), reach AS (
            SELECT src AS node, src AS r FROM edges
            UNION
            SELECT e.dst AS node, reach.r
            FROM reach JOIN edges e ON reach.node = e.src
        )
        SELECT node AS doc_id, min(r) AS canonical
        FROM reach GROUP BY node
        """,
        "dedup_simhash_pairs": r"""
            WITH corpus AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
                UNION ALL
                SELECT CAST(doc_id AS VARCHAR) || '_c', text FROM documents
            ), toks AS (
                SELECT doc_id, tok, count(*) AS w, md5(tok) AS h
                FROM (SELECT doc_id,
                             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
                      FROM corpus)
                GROUP BY doc_id, tok
            ), bits AS (
                SELECT doc_id, b AS bit,
                       sum(CASE WHEN substring(h, b + 1, 1) IN
                                ('1','3','5','7','9','b','d','f')
                                THEN w ELSE -w END) AS s
                FROM toks, LATERAL (SELECT unnest(generate_series(0, 15)) AS b)
                GROUP BY doc_id, b
            ), hashes AS (
                SELECT doc_id,
                       CAST(sum(CASE WHEN s > 0
                                     THEN CAST(pow(2, bit) AS BIGINT)
                                     ELSE 0 END) AS BIGINT) AS simhash
                FROM bits GROUP BY doc_id
            ), bands AS (
                SELECT doc_id, simhash, b AS band,
                       (simhash >> (b * 4)) & 15 AS val
                FROM hashes, LATERAL (SELECT unnest(generate_series(0, 3)) AS b)
            ), kept AS (
                SELECT band, val FROM bands GROUP BY band, val
                HAVING count(*) BETWEEN 2 AND 4096
            ), cand AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                       a.simhash AS h_a, b.simhash AS h_b
                FROM bands a
                JOIN kept USING (band, val)
                JOIN bands b
                  ON a.band = b.band AND a.val = b.val
                 AND a.doc_id < b.doc_id
            )
            SELECT id_a, id_b,
                   CAST(bit_count(xor(h_a, h_b)) AS INTEGER) AS hamming
            FROM cand WHERE bit_count(xor(h_a, h_b)) <= 3
        """,
        "doc_simhash64": r"""
            WITH toks AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id, tok,
                       count(*) AS w, md5(tok) AS h
                FROM (SELECT doc_id,
                             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
                      FROM documents)
                GROUP BY doc_id, tok
            ), bits AS (
                SELECT doc_id, b AS bit,
                       sum(CASE WHEN (CASE WHEN b < 32
                                THEN substring(h, b + 1, 1) IN
                                     ('1','3','5','7','9','b','d','f')
                                ELSE substring(h, b - 31, 1) IN
                                     ('2','3','6','7','a','b','e','f') END)
                                THEN w ELSE -w END) AS s
                FROM toks, LATERAL (SELECT unnest(generate_series(0, 63)) AS b)
                GROUP BY doc_id, b
            )
            SELECT doc_id,
                   CAST(sum(CASE WHEN s > 0 THEN
                                 (CASE WHEN bit = 63
                                       THEN -9223372036854775807 - 1
                                       ELSE CAST(pow(2, bit) AS BIGINT) END)
                                 ELSE 0 END) AS BIGINT) AS simhash
            FROM bits GROUP BY doc_id
        """,
        "dedup_simhash_pairs64": r"""
            WITH corpus AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
                UNION ALL
                SELECT CAST(doc_id AS VARCHAR) || '_c', text FROM documents
            ), toks AS (
                SELECT doc_id, tok, count(*) AS w, md5(tok) AS h
                FROM (SELECT doc_id,
                             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
                      FROM corpus)
                GROUP BY doc_id, tok
            ), bits AS (
                SELECT doc_id, b AS bit,
                       sum(CASE WHEN (CASE WHEN b < 32
                                THEN substring(h, b + 1, 1) IN
                                     ('1','3','5','7','9','b','d','f')
                                ELSE substring(h, b - 31, 1) IN
                                     ('2','3','6','7','a','b','e','f') END)
                                THEN w ELSE -w END) AS s
                FROM toks, LATERAL (SELECT unnest(generate_series(0, 63)) AS b)
                GROUP BY doc_id, b
            ), hashes AS (
                SELECT doc_id,
                       CAST(sum(CASE WHEN s > 0 THEN
                                     (CASE WHEN bit = 63
                                           THEN -9223372036854775807 - 1
                                           ELSE CAST(pow(2, bit) AS BIGINT) END)
                                     ELSE 0 END) AS BIGINT) AS simhash
                FROM bits GROUP BY doc_id
            ), bands AS (
                SELECT doc_id, simhash, b AS band,
                       (simhash >> (b * 16)) & 65535 AS val
                FROM hashes, LATERAL (SELECT unnest(generate_series(0, 3)) AS b)
            ), kept AS (
                SELECT band, val FROM bands GROUP BY band, val
                HAVING count(*) BETWEEN 2 AND 4096
            ), cand AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                       a.simhash AS h_a, b.simhash AS h_b
                FROM bands a
                JOIN kept USING (band, val)
                JOIN bands b
                  ON a.band = b.band AND a.val = b.val
                 AND a.doc_id < b.doc_id
            )
            SELECT id_a, id_b,
                   CAST(bit_count(xor(h_a, h_b)) AS INTEGER) AS hamming
            FROM cand WHERE bit_count(xor(h_a, h_b)) <= 3
        """,
        "ann_cosine_topk": f"""
            SELECT vec_id,
                   round(list_cosine_similarity(
                       CAST(embedding AS DOUBLE[]),
                       {list(map(float, _ANN_QUERY))}), 6) AS sim
            FROM embeddings
            ORDER BY sim DESC, vec_id ASC LIMIT 10
        """,
        "ann_ivf_topk": f"""
            WITH cents AS (
                SELECT row_number() OVER (ORDER BY vec_id ASC) - 1 AS cell,
                       CAST(embedding AS DOUBLE[]) AS cvec
                FROM (SELECT vec_id, embedding FROM embeddings
                      ORDER BY vec_id ASC LIMIT 8)
            ), sims AS (
                SELECT e.vec_id, c.cell,
                       round(list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]), c.cvec), 6) AS csim,
                       CAST(e.embedding AS DOUBLE[]) AS v
                FROM embeddings e CROSS JOIN cents c
            ), assigned AS (
                SELECT vec_id, cell, v FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY vec_id
                        ORDER BY csim DESC, cell ASC) rn
                    FROM sims) WHERE rn = 1
            ), probe AS (
                SELECT cell FROM (
                    SELECT cell,
                           round(list_cosine_similarity(
                               cvec, {list(map(float, _ANN_QUERY))}), 6) AS s
                    FROM cents)
                ORDER BY s DESC, cell ASC LIMIT 4
            )
            SELECT vec_id,
                   round(list_cosine_similarity(
                       v, {list(map(float, _ANN_QUERY))}), 6) AS sim
            FROM assigned WHERE cell IN (SELECT cell FROM probe)
            ORDER BY sim DESC, vec_id ASC LIMIT 10
        """,
        "media_features": """
            WITH hb AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                       'media://obj/' || CAST(doc_id AS VARCHAR) AS media_ref,
                       md5('media://obj/' || CAST(doc_id AS VARCHAR)) AS h
                FROM documents
            ), b AS (
                SELECT doc_id, media_ref,
                       CAST(('0x' || substr(h, 1, 2)) AS INTEGER) AS h0,
                       CAST(('0x' || substr(h, 3, 2)) AS INTEGER) AS h1,
                       CAST(('0x' || substr(h, 5, 2)) AS INTEGER) AS h2
                FROM hb
            )
            SELECT doc_id, media_ref,
                   CASE WHEN h0 % 2 = 0 THEN 'image' ELSE 'audio'
                   END AS media_kind,
                   CASE WHEN h0 % 2 = 0 THEN 4 + h1 % 28 END AS width,
                   CASE WHEN h0 % 2 = 0 THEN 4 + h2 % 28 END AS height,
                   CASE WHEN h0 % 2 = 1
                        THEN CAST((160 + h1 * 8) / 8 AS INTEGER)
                   END AS duration_ms
            FROM b
        """,
        "ann_ivf_topk_batch": f"""
            WITH cents AS (
                SELECT row_number() OVER (ORDER BY vec_id ASC) - 1 AS cell,
                       CAST(embedding AS DOUBLE[]) AS cvec
                FROM (SELECT vec_id, embedding FROM embeddings
                      ORDER BY vec_id ASC LIMIT 8)
            ), sims AS (
                SELECT e.vec_id, c.cell,
                       round(list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]), c.cvec), 6) AS csim,
                       CAST(e.embedding AS DOUBLE[]) AS v
                FROM embeddings e CROSS JOIN cents c
            ), assigned AS (
                SELECT vec_id, cell, v FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY vec_id
                        ORDER BY csim DESC, cell ASC) rn
                    FROM sims) WHERE rn = 1
            ), queries(query_id, qvec) AS (VALUES
                {", ".join(f"({qid}, CAST({list(map(float, qv))} AS DOUBLE[]))"
                           for qid, qv in _ANN_BATCH)}
            ), probe AS (
                SELECT query_id, qvec, cell FROM (
                    SELECT q.query_id, q.qvec, c.cell,
                           row_number() OVER (
                               PARTITION BY q.query_id
                               ORDER BY round(list_cosine_similarity(
                                   c.cvec, q.qvec), 6) DESC, c.cell ASC) rn
                    FROM queries q CROSS JOIN cents c) WHERE rn <= 4
            ), scored AS (
                SELECT p.query_id, a.vec_id,
                       round(list_cosine_similarity(a.v, p.qvec), 6) AS sim
                FROM assigned a JOIN probe p ON a.cell = p.cell
            )
            SELECT query_id, vec_id, sim FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY sim DESC, vec_id ASC) rn
                FROM scored) WHERE rn <= 5
        """,
        "embedding_near_dup": f"""
            WITH blocked AS (
                SELECT e.*,
                       e.vec_id % greatest(1, CAST(ceil(
                           c._n / {_NEAR_DUP_MAX_BLOCK}.0) AS BIGINT)) AS block
                FROM embeddings e
                JOIN (SELECT label, count(*) AS _n
                      FROM embeddings GROUP BY label) c USING (label)
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])), 6) AS sim
            FROM blocked a JOIN blocked b
              ON a.label = b.label AND a.block = b.block
             AND a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(
                      CAST(a.embedding AS DOUBLE[]),
                      CAST(b.embedding AS DOUBLE[])), 6) >= 0.4
        """,
        "mention_candidates": r"""
            WITH dict(surface, qid, score) AS (VALUES
                ('spark', 101, 0.9), ('query', 103, 0.85),
                ('data', 104, 0.7), ('data', 204, 0.7),
                ('hash join', 106, 0.95), ('hash', 107, 0.5),
                ('merge batch', 108, 0.8), ('window', 109, 0.6),
                ('join', 110, 0.45)
            ), toks AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
                FROM documents
            ), grams AS (
                SELECT doc_id, i - 1 AS token_start, n AS ngram_len,
                       CASE WHEN i = 1 THEN 0
                            ELSE length(array_to_string(a[1:i-1], ' ')) + 1
                       END AS char_start,
                       array_to_string(a[i:i+n-1], ' ') AS surface
                FROM toks,
                     LATERAL (SELECT unnest(generate_series(1, len(a))) AS i),
                     LATERAL (SELECT unnest([1, 2]) AS n)
                WHERE i + n - 1 <= len(a)
            ), cands AS (
                SELECT g.doc_id, g.token_start, g.ngram_len, g.char_start,
                       g.char_start + length(g.surface) AS char_end,
                       g.surface, d.qid,
                       CASE WHEN g.surface = d.surface THEN d.score
                            ELSE d.score * 0.9 END AS score
                FROM grams g JOIN dict d ON lower(g.surface) = lower(d.surface)
            )
            SELECT doc_id, token_start, ngram_len, char_start, char_end,
                   surface, qid,
                   CAST(round(score, 6) AS DOUBLE) AS score
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY doc_id, token_start, ngram_len
                      ORDER BY score DESC, qid ASC) rn
                  FROM cands) WHERE rn = 1
        """,
        "linked_mentions": r"""
            WITH dict(surface, qid, score) AS (VALUES
                ('spark', 101, 0.9), ('query', 103, 0.85),
                ('data', 104, 0.7), ('data', 204, 0.7),
                ('hash join', 106, 0.95), ('hash', 107, 0.5),
                ('merge batch', 108, 0.8), ('window', 109, 0.6),
                ('join', 110, 0.45)
            ), toks AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
                FROM documents
            ), grams AS (
                SELECT doc_id, i - 1 AS token_start, n AS ngram_len,
                       CASE WHEN i = 1 THEN 0
                            ELSE length(array_to_string(a[1:i-1], ' ')) + 1
                       END AS char_start,
                       array_to_string(a[i:i+n-1], ' ') AS surface
                FROM toks,
                     LATERAL (SELECT unnest(generate_series(1, len(a))) AS i),
                     LATERAL (SELECT unnest([1, 2]) AS n)
                WHERE i + n - 1 <= len(a)
            ), cands AS (
                SELECT g.doc_id, g.token_start, g.ngram_len, g.char_start,
                       g.char_start + length(g.surface) AS char_end,
                       g.surface, d.qid,
                       CASE WHEN g.surface = d.surface THEN d.score
                            ELSE d.score * 0.9 END AS score
                FROM grams g JOIN dict d ON lower(g.surface) = lower(d.surface)
            ), chosen AS (
                SELECT doc_id, token_start, ngram_len, char_start, char_end,
                       surface, qid, score
                FROM (SELECT *, row_number() OVER (
                          PARTITION BY doc_id, token_start
                          ORDER BY ngram_len DESC, score DESC, qid ASC) rn
                      FROM cands) WHERE rn = 1
            ), pruned AS (
                SELECT *, max(token_start + ngram_len) OVER (
                    PARTITION BY doc_id ORDER BY token_start
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ) AS prev_end
                FROM chosen
            )
            SELECT doc_id, token_start, ngram_len, char_start, char_end,
                   surface, qid, CAST(round(score, 6) AS DOUBLE) AS score
            FROM pruned
            WHERE prev_end IS NULL OR prev_end <= token_start
        """,
    }
