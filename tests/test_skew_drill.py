"""Pair-family skew drill (ROADMAP round-6 candidate): one massive
boilerplate group — the adversarial shape LSH dedup actually surfaces
at scale (shared page templates, license headers) — driven end-to-end
through every pair-generating operator.

What the caps must buy us, asserted per operator:
- BOUNDED WORK: no operator enumerates the C(n,2) pairs of the
  boilerplate group (3,000 docs → 4.5M pairs uncapped); the hub
  bucket/cell is dropped (LSH, simhash, shingle-DF) or sub-split
  (embedding cells), so emitted pair counts stay ~3 orders below C(n,2).
- PRESERVED RECALL off the hub: planted near-dup pairs among ordinary
  documents are still found — the caps only trade recall ON the
  degenerate group.
- RECOVERY: the boilerplate group the near-dup paths skip is exactly
  what exact dedup catches with one hash groupBy, so a real pipeline
  (exact pass + capped near-dup pass + clustering) still removes it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yago4_spark.operators.dedup import (
    dup_clusters,
    exact_dedup_canonical,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from yago4_spark.operators.similarity import (
    deterministic_centroids,
    embedding_near_dup_pairs,
)

N_BOILER = 3_000       # one group of byte-identical boilerplate docs
N_TAIL = 1_000         # ordinary unique docs
N_PLANTED = 25         # tail docs with an exact twin (t{i} / t{i}d)
CAP = 500              # bucket/shingle-DF cap well under N_BOILER

BOILER_TEXT = (
    "this page is part of the standard site template with navigation "
    "header footer copyright notice and cookie consent banner text"
)


@pytest.fixture(scope="module")
def skew_docs(spark):
    boiler = spark.range(N_BOILER).select(
        F.concat(F.lit("b"), F.col("id")).alias("doc_id"),
        F.lit(BOILER_TEXT).alias("text"),
    )
    # tail docs: unique body, shared function words; first N_PLANTED
    # get an exact twin so every near-dup operator has on-tail recall
    # to demonstrate (identical text → jaccard 1.0, hamming 0, same
    # minhash signature — found regardless of hash specifics)
    # mostly-unique bodies (three id-derived tokens) + a short shared
    # suffix: cross-tail shingle overlap stays low (jaccard ~0.2), so
    # band collisions between DIFFERENT tail docs are rare — the found
    # pairs are the planted twins, not noise
    body = F.concat(
        F.lit("doc "), F.col("id"),
        F.lit(" ref"), F.col("id") * 7919,
        F.lit(" key"), F.col("id") * 104729,
        F.lit(" topic "), F.pmod(F.col("id"), F.lit(97)),
        F.lit(" filler common tail words here"),
    )
    tail = spark.range(N_TAIL).select(
        F.concat(F.lit("t"), F.col("id")).alias("doc_id"), body.alias("text"))
    twins = spark.range(N_PLANTED).select(
        F.concat(F.lit("t"), F.col("id"), F.lit("d")).alias("doc_id"),
        body.alias("text"))
    return boiler.unionByName(tail).unionByName(twins).persist()


def _no_hub_pairs(pairs_df):
    """Zero emitted pairs may touch two boilerplate docs."""
    return pairs_df.where(
        F.col("id_a").startswith("b") & F.col("id_b").startswith("b")
    ).isEmpty()


def _planted_found(pairs_df) -> int:
    """How many of the N_PLANTED exact twins were recovered."""
    return (
        pairs_df.where(
            (F.col("id_a") == F.concat(F.lit("t"), F.expr(
                "substring(id_b, 2, length(id_b) - 2)")))
            & F.col("id_b").endswith("d")
        ).count()
    )


def test_lsh_drops_hub_bucket_keeps_tail(spark, skew_docs):
    pairs = minhash_lsh_pairs(skew_docs, max_bucket_size=CAP).persist()
    assert _no_hub_pairs(pairs)
    assert _planted_found(pairs) == N_PLANTED
    # identical docs collide in EVERY band — without the cap this is
    # 4 × C(3000, 2) streamed candidates; with it the whole output is
    # a sparse tail set
    assert pairs.count() < 50_000
    pairs.unpersist()


def test_ngram_jaccard_drops_hub_shingles_keeps_tail(spark, skew_docs):
    pairs = ngram_jaccard_pairs(
        skew_docs, threshold=0.8, max_shingle_df=CAP).persist()
    assert _no_hub_pairs(pairs)
    assert _planted_found(pairs) == N_PLANTED
    assert pairs.count() < 50_000
    pairs.unpersist()


def test_simhash_drops_hub_bucket_keeps_tail(spark, skew_docs):
    pairs = simhash_near_dup_pairs(
        skew_docs, bits=32, n_bands=4, max_hamming=3,
        max_bucket_size=CAP).persist()
    assert _no_hub_pairs(pairs)
    assert _planted_found(pairs) == N_PLANTED
    assert pairs.count() < 50_000
    pairs.unpersist()


def test_embedding_hub_cell_subsplits(spark):
    n_hub, n_rest, cell_cap = 1_500, 300, 200
    hub = spark.range(n_hub).select(
        F.concat(F.lit("h"), F.col("id")).alias("vec_id"),
        F.expr("array(1.0F, 0.0F, 0.0F, 0.0F)").alias("embedding"),
    )
    # distinct directions, far from the hub and from each other
    rest = spark.range(n_rest).select(
        F.concat(F.lit("r"), F.col("id")).alias("vec_id"),
        F.expr(
            "array(0.0F, cast(cos(id) as float), "
            "cast(sin(id) as float), cast(id % 7 as float))"
        ).alias("embedding"),
    )
    emb = hub.unionByName(rest)
    pairs = embedding_near_dup_pairs(
        emb, threshold=0.999, n_cells=4, max_cell_size=cell_cap,
        centroids=deterministic_centroids(emb, 4),
    ).persist()
    n = pairs.count()
    hub_pairs = pairs.where(
        F.col("id_a").startswith("h") & F.col("id_b").startswith("h")
    ).count()
    # uncapped, the identical-vector cell alone is C(1500,2) ≈ 1.12M
    # pairs in ONE task; sub-split into blocks of ~cell_cap it is
    # ~8 × C(~190, 2) ≈ 150k, spread over as many tasks
    assert 0 < hub_pairs <= n < 400_000
    pairs.unpersist()


def test_exact_canonical_no_group_arrays(spark, skew_docs):
    """exact_dedup_canonical handles the hub group with aggregates only
    — no collect_list of the whole group in the plan, and the 3,000-doc
    group maps every member to one canonical."""
    out = exact_dedup_canonical(skew_docs).persist()
    boiler = out.where(F.col("doc_id").startswith("b"))
    assert boiler.count() == N_BOILER
    assert boiler.select("canonical").distinct().collect()[0][0] == "b0"
    assert boiler.select("dup_count").distinct().collect()[0][0] == N_BOILER
    # twins: 2-member groups, canonical = the original t{i}
    twins = out.where(F.col("doc_id").endswith("d"))
    assert twins.count() == N_PLANTED
    assert twins.where(F.col("canonical") == F.expr(
        "substring(doc_id, 1, length(doc_id) - 1)")).count() == N_PLANTED
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan
    out.unpersist()


def test_pipeline_recovers_boilerplate(spark, skew_docs):
    """Exact pass + capped near-dup pass + clustering: the group every
    capped operator skipped is still removed, without any C(n,2)."""
    exact = exact_duplicates(skew_docs)
    # star edges (canonical, member) — NOT the C(n,2) expansion
    star = exact.select(
        F.element_at("doc_ids", 1).alias("id_a"),
        F.explode(F.expr("slice(doc_ids, 2, size(doc_ids) - 1)"))
        .alias("id_b"),
    )
    near = minhash_lsh_pairs(skew_docs, max_bucket_size=CAP) \
        .select("id_a", "id_b")
    clusters = dup_clusters(star.unionByName(near)).persist()
    boiler = clusters.where(F.col("doc_id").startswith("b"))
    # all 3,000 boilerplate docs collapse to ONE canonical
    assert boiler.count() == N_BOILER
    assert boiler.select("canonical").distinct().count() == 1
    # and each planted twin collapses onto its original
    twin = clusters.where(F.col("doc_id").endswith("d")).count()
    assert twin == N_PLANTED
    clusters.unpersist()
