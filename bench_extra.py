"""Extra measurement harness for the optimization round (guide §1.4):
isolates stages of the expensive declared queries with the noop sink so
plan-level costs are visible. Does NOT replace bench.py (frozen); numbers
from here are cited in OPTIMIZATION_r06.md.

Usage: python bench_extra.py [stage ...]
Stages: simhash_pairs, simhash, minhash, ngram, closure, clusters, ivf
(default: all).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from yago4_spark.session import get_spark


def force(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, thunk, trials=3):
    from yago4_spark.operators.cache import release_all
    ts = []
    for _ in range(trials):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        thunk()
        ts.append(round(time.time() - t0, 3))
        release_all()
    spark.sparkContext.setJobDescription(None)
    print(f"{name}: min={min(ts)} all={ts}", flush=True)
    return min(ts)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    which = set(sys.argv[1:]) or {
        "simhash_pairs", "simhash", "minhash", "ngram", "closure",
        "clusters", "ivf"}
    spark = get_spark(app_name="bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    docs2 = entry_mod._doubled_docs(spark, sf_dir)
    docs1 = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text")

    if "simhash" in which:
        from yago4_spark.operators.dedup import simhash
        timed(spark, "simhash16_docs1", lambda: force(simhash(docs1, bits=16)))
        timed(spark, "simhash64_docs1", lambda: force(simhash(docs1, bits=64)))

    if "simhash_pairs" in which:
        from yago4_spark.operators import dedup as D

        def upto_grouped(bits, n_bands):
            w = bits // n_bands
            mask = (1 << w) - 1
            sh = D.simhash(docs2, bits=bits)
            bands = sh.select(
                "doc_id", "simhash",
                F.explode(F.array(*[
                    F.struct(F.lit(i).alias("band"),
                             F.expr(f"shiftright(simhash, {i * w}) & {mask}")
                             .alias("val"))
                    for i in range(n_bands)])).alias("bv"),
            ).select("doc_id", "simhash", "bv.band", "bv.val")
            return (bands.groupBy("band", "val")
                    .agg(F.sort_array(F.collect_list(
                        F.struct(F.col("doc_id"), F.col("simhash"))))
                        .alias("ids"))
                    .where((F.size("ids") >= 2) & (F.size("ids") <= 4096)))

        def pre_distinct(bits, n_bands, max_hamming):
            grouped = upto_grouped(bits, n_bands)
            return (D._stream_pairs(grouped)
                    .select(F.col("id_a.doc_id").alias("id_a"),
                            F.col("id_b.doc_id").alias("id_b"),
                            F.expr("bit_count(id_a.simhash ^ id_b.simhash)")
                            .cast("int").alias("hamming"))
                    .where(F.col("hamming") <= max_hamming))

        timed(spark, "sp16_simhash_only",
              lambda: force(D.simhash(docs2, bits=16)))
        timed(spark, "sp16_upto_grouped", lambda: force(upto_grouped(16, 4)))
        timed(spark, "sp16_pre_distinct", lambda: force(pre_distinct(16, 4, 3)))
        timed(spark, "sp16_full", lambda: force(
            D.simhash_near_dup_pairs(docs2, bits=16, n_bands=4,
                                     max_hamming=3)))
        timed(spark, "sp64_pre_distinct", lambda: force(pre_distinct(64, 4, 3)))
        timed(spark, "sp64_full", lambda: force(
            D.simhash_near_dup_pairs(docs2, bits=64, n_bands=4,
                                     max_hamming=3)))

    if "minhash" in which:
        from yago4_spark.operators import dedup as D
        timed(spark, "mh_shingles",
              lambda: force(D.shingles(docs2, "doc_id", "text", 3)))
        timed(spark, "mh_signatures", lambda: force(
            D.minhash_signatures(docs2, num_hashes=8)))
        timed(spark, "mh_full", lambda: force(
            D.minhash_lsh_pairs(docs2, n=3, num_hashes=8, bands=2)))

    if "ngram" in which:
        from yago4_spark.operators import dedup as D
        timed(spark, "ngram_full", lambda: force(
            D.ngram_jaccard_pairs(docs2, n=3, threshold=0.8)))

    if "closure" in which:
        qs = entry_mod.queries()
        timed(spark, "closure_full",
              lambda: force(qs["closure_custkey_tree"](spark, sf_dir)),
              trials=5)

    if "clusters" in which:
        qs = entry_mod.queries()
        timed(spark, "clusters_full",
              lambda: force(qs["dedup_clusters"](spark, sf_dir)))

    if "ivf" in which:
        qs = entry_mod.queries()
        timed(spark, "ann_ivf_topk",
              lambda: force(qs["ann_ivf_topk"](spark, sf_dir)), trials=5)
        timed(spark, "ann_ivf_topk_batch",
              lambda: force(qs["ann_ivf_topk_batch"](spark, sf_dir)), trials=5)

    spark.stop()


if __name__ == "__main__":
    main()
