"""Oracle sensitivity (mutation) testing for the LLM-ops surface
(VERDICT r04 item 1 — the same technique that closed the KG-pipeline
credibility gap in round 4, applied to the other half of the engine).

The dedup / similarity / linking / media / text operators are checked by
DuckDB SQL oracles (scripts/check_oracle.py) and goldens; this script
measures that layer's POWER. Each mutation is a realistic single-point
bug planted in a COPY of the package (band-slice off-by-one, Jaccard
denominator drop, hub-cap bypass, containment-prune drop, lossy prefix
prefilter, WAV channel-average skip, ...). The kill criterion:

- oracle-killed: any of the 18 LLM-ops queries mismatches its DuckDB
  twin (rows / schema / value-hash) or the query errors;
- test-killed: for behaviors the SQL layer cannot see (pixel features,
  k-means seeding quality, hub-cap engagement), a NAMED pytest must
  fail — the mutation lists which.

A surviving mutant is a real blind spot and fails the run (rc 1).

Mechanics mirror scripts/mutation_check.py: the package + entry +
tests are copied to /tmp; each mutation is a unique-match textual edit
applied to the copy; workers run in a fresh subprocess with cwd at the
copy root (pyspark executors put process cwd at sys.path[0], so the
MUTATED package is what executor Python workers import — the round-4
lesson). The repo tree is never modified.

Usage:
    python scripts/mutation_check_ops.py [sf_dir] [only_mutant ...]
    # default /root/testdata/sf0.01 — the driver's correctness scale

Appends the kill matrix to BASELINE_RESULTS.md and prints a JSON
summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# the LLM-ops query families (every CORRECTNESS query that exercises
# dedup/similarity/linking/media/text code paths)
OPS_QUERIES = [
    "doc_text_stats", "doc_lang_id", "doc_quality",
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "doc_simhash", "doc_simhash64",
    "dedup_simhash_pairs", "dedup_simhash_pairs64", "dedup_clusters",
    "dedup_exact_canonical",
    "ann_cosine_topk", "ann_ivf_topk", "ann_ivf_topk_batch",
    "media_features", "embedding_near_dup",
    "mention_candidates", "linked_mentions",
]

# Each mutation: unique old→new textual edit in ONE package file of the
# copy. `expect` documents which queries/tests SHOULD move
# (informational; the kill criterion is any mismatch / any listed test
# failing). `tests`: pytest node ids that are the designated killer for
# behaviors outside SQL reach — when present they run IN ADDITION to
# the oracle sweep, and either layer catching the mutant counts.
MUTATIONS = [
    # ---- operators/dedup.py -------------------------------------------
    dict(
        name="stream_pairs_off_by_one",
        file="yago4_spark/operators/dedup.py",
        old='F.explode(F.expr("slice(ids, _i + 2, size(ids))")).alias("id_b")',
        new='F.explode(F.expr("slice(ids, _i + 1, size(ids))")).alias("id_b")',
        expect="self-pairs (id,id) leak into every pair family",
    ),
    dict(
        name="lsh_band_slice_off_by_one",
        file="yago4_spark/operators/dedup.py",
        old="slice(sig, b * {rows} + 1, {rows})",
        new="slice(sig, b * {rows} + 2, {rows})",
        expect="test-killed: a consistent band-boundary shift relabels "
               "every bucket IDENTICALLY, so pair sets over an "
               "exact-dup-dominated corpus don't move (first sweep "
               "found this as a SURVIVOR — the blind spot is closed by "
               "the unit twin, not by re-rolling the corpus)",
        tests=["tests/test_training_ops.py::test_lsh_band_buckets"],
    ),
    dict(
        name="jaccard_denominator_drop_common",
        file="yago4_spark/operators/dedup.py",
        old='(F.col("n_a") + F.col("n_b") - F.col("common"))',
        new='(F.col("n_a") + F.col("n_b"))',
        expect="dedup_ngram_jaccard (|A∪B| over-counted → exact dups "
               "score 0.5 < threshold, all pairs vanish)",
    ),
    dict(
        name="ngram_prefilter_inverted",
        file="yago4_spark/operators/dedup.py",
        old='cold = sh.join(hot, "shingle", "left_anti")',
        new='cold = sh.join(hot, "shingle", "inner")',
        expect="dedup_ngram_jaccard (keeps ONLY hot shingles)",
    ),
    dict(
        name="simhash_hamming_off_by_one",
        file="yago4_spark/operators/dedup.py",
        old='verified = F.expr("bit_count(h_a ^ h_b)").cast("int") '
            '<= F.lit(max_hamming)',
        new='verified = F.expr("bit_count(h_a ^ h_b)").cast("int") '
            '< F.lit(max_hamming)',
        expect="dedup_simhash_pairs (hamming==3 pairs dropped)",
    ),
    dict(
        name="simhash_lane1_missing_f",
        file="yago4_spark/operators/dedup.py",
        old='return f"((shiftright({_nib(b - 32)}, 1)) & 1)"',
        new='return f"((shiftright({_nib(b - 32)}, 2)) & 1)"',
        expect="doc_simhash64 / dedup_simhash_pairs64 ONLY (high-bit "
               "lane reads the nibble's 4s bit instead of its 2s bit; "
               "16-bit queries must stay green — the exact regression "
               "the 64-bit oracle exists to catch)",
    ),
    dict(
        name="clusters_max_label",
        file="yago4_spark/operators/dedup.py",
        old='.agg(F.min("label").alias("label"),',
        new='.agg(F.max("label").alias("label"),',
        expect="dedup_clusters (canonical = component max, oracle says min)",
    ),
    dict(
        name="canonical_max_not_min",
        file="yago4_spark/operators/dedup.py",
        old='.agg(F.min("doc_id").alias("canonical"),',
        new='.agg(F.max("doc_id").alias("canonical"),',
        expect="dedup_exact_canonical (canonical = group MAX, oracle "
               "says MIN)",
    ),
    dict(
        name="simhash_cross_band_distinct_dropped",
        file="yago4_spark/operators/dedup.py",
        old="        pairs.where(emit & verified)",
        new="        pairs.where(verified)",
        expect="dedup_simhash_pairs (lowest-kept-band emission disabled: "
               "exact dups agree on ALL 4 bands -> each such pair "
               "emitted 4x, rows mismatch)",
    ),
    dict(
        name="lsh_bucket_cap_bypass",
        file="yago4_spark/operators/dedup.py",
        old='    ).where((F.size("ids") >= 2) & '
            '(F.size("ids") <= max_bucket_size))\n'
            '    return _stream_pairs(grouped)',
        new='    ).where(F.size("ids") >= 2)\n'
            '    return _stream_pairs(grouped)',
        expect="test-killed: the 3k-doc boilerplate bucket streams "
               "C(3000,2) pairs into the drill's zero-hub-pairs gate "
               "(no sf0.01 bucket reaches the cap, so the oracle can't "
               "see it)",
        tests=["tests/test_skew_drill.py::"
               "test_lsh_drops_hub_bucket_keeps_tail"],
    ),
    # ---- operators/similarity.py --------------------------------------
    dict(
        name="ivf_assign_farthest",
        file="yago4_spark/operators/similarity.py",
        old="best = cl[np.argmax(ri, axis=1)]",
        new="best = cl[np.argmin(ri, axis=1)]",
        expect="ann_ivf_topk / ann_ivf_topk_batch (vectors assigned to "
               "FARTHEST centroid → probed cells miss the neighbors)",
    ),
    dict(
        name="ivf_probe_off_by_one",
        file="yago4_spark/operators/similarity.py",
        old='.where(F.col("_rn") <= n_probe)',
        new='.where(F.col("_rn") < n_probe)',
        expect="ann_ivf_topk_batch (3 of 4 probe cells → top-k shifts)",
    ),
    dict(
        name="near_dup_hub_cap_bypass",
        file="yago4_spark/operators/similarity.py",
        old='    n_blocks = F.greatest(\n'
            '        F.lit(1).cast("long"),\n'
            '        F.ceil(F.col("_n") / F.lit(max_cell_size)).cast("long"),\n'
            '    )\n',
        new='    n_blocks = F.lit(1).cast("long")\n',
        expect="test-killed: hub cells stop sub-splitting → O(n²) pair "
               "count (SQL queries use the entry-level label blocking, "
               "so only the pytest cap gate sees this operator)",
        tests=["tests/test_training_ops.py::"
               "test_embedding_near_dup_hub_cell_cap"],
    ),
    dict(
        name="kmeans_seed_degenerate",
        file="yago4_spark/operators/similarity.py",
        old="prev = {i: v for i, v in enumerate(_farthest_point_seed(sample, n_cells))}",
        new="prev = {i: v[1] for i, v in enumerate(sample[:n_cells])}",
        expect="test-killed: first-n-by-id seeding collapses clusters "
               "into one cell (recall@10 gate + blocking-balance gate)",
        tests=["tests/test_training_ops.py::test_kmeans_ivf_recall_mixture",
               "tests/test_training_ops.py::test_near_dup_kmeans_blocking"],
    ),
    # ---- operators/linking.py -----------------------------------------
    dict(
        name="containment_prune_dropped",
        file="yago4_spark/operators/linking.py",
        old='.where(F.col("_prev_end").isNull()\n'
            '               | (F.col("_prev_end") <= F.col("token_start")))',
        new='.where(F.lit(True))',
        expect="linked_mentions (mentions inside a longer chosen mention "
               "leak through — live in the driver corpus since 'join' "
               "joined DEMO_DICT; the crafted New-York golden is the "
               "belt-and-braces killer)",
        tests=["tests/test_documents_linking.py::"
               "test_longest_match_and_containment"],
    ),
    dict(
        name="prefix_prefilter_case_lossy",
        file="yago4_spark/operators/linking.py",
        old='.join(first_toks, F.lower(F.col("_tok")) == F.col("_first_lc"),\n'
            '           "left_semi")',
        new='.join(first_toks, F.col("_tok") == F.col("_first_lc"),\n'
            '           "left_semi")',
        expect="test-killed: the sf corpus is all-lowercase, so a "
               "case-lossy prefilter is equivalent there; the "
               "berlin/Berlin golden exercises the variant path",
        tests=["tests/test_documents_linking.py::test_case_variant_scoring"],
    ),
    dict(
        name="case_variant_bonus_dropped",
        file="yago4_spark/operators/linking.py",
        old='.otherwise(F.col("score") * 0.9)',
        new='.otherwise(F.col("score"))',
        expect="test-killed: no case variants exist in the "
               "all-lowercase sf corpus; the berlin/Berlin golden pins "
               "the 0.9 bonus",
        tests=["tests/test_documents_linking.py::test_case_variant_scoring"],
    ),
    # ---- functions/text.py --------------------------------------------
    dict(
        name="fingerprint_no_ws_collapse",
        file="yago4_spark/functions/text.py",
        old='F.md5(F.lower(F.regexp_replace(F.trim(text), r"\\s+", " ")))',
        new='F.md5(F.lower(F.trim(text)))',
        expect="test-killed: sf docs are single-spaced, so the "
               "collapse is equivalent there; the twin test feeds "
               "whitespace runs",
        tests=["tests/test_training_ops.py::test_text_function_twins"],
    ),
    dict(
        name="quality_weight_skew",
        file="yago4_spark/functions/text.py",
        old="return F.round((length_ok * 0.4 + word_ok * 0.4 + punct_ok * 0.2), 6)",
        new="return F.round((length_ok * 0.5 + word_ok * 0.3 + punct_ok * 0.2), 6)",
        expect="test-killed: every sf doc saturates length_ok == "
               "word_ok == 1.0, where a 0.4/0.4 -> 0.5/0.3 split is "
               "arithmetically invisible; the twin test pins docs where "
               "the gates disagree",
        tests=["tests/test_training_ops.py::test_text_function_twins"],
    ),
    # ---- functions/media.py -------------------------------------------
    dict(
        name="ppm_width_wrong_byte",
        file="yago4_spark/functions/media.py",
        old="width = _IMG_DIM_BASE + h[1] % _IMG_DIM_MOD",
        new="width = _IMG_DIM_BASE + h[2] % _IMG_DIM_MOD",
        expect="media_features (encoder writes the wrong width; the "
               "oracle recomputes width from md5 byte 1 in SQL)",
    ),
    dict(
        name="wav_channel_avg_dropped",
        file="yago4_spark/functions/media.py",
        old="        samples = samples.reshape(-1, ch).mean(axis=1)",
        new="        samples = samples[::ch]",
        expect="test-killed: stereo decode takes the left channel "
               "instead of the mono average (features are not "
               "SQL-expressible; the stereo golden is the killer)",
        tests=["tests/test_training_ops.py::test_media_real_decode_kernels"],
    ),
    dict(
        name="pnm_pixel_offset_off_by_one",
        file="yago4_spark/functions/media.py",
        old="return magic, vals[0], vals[1], vals[2], i + 1",
        new="return magic, vals[0], vals[1], vals[2], i + 2",
        expect="test-killed: pixel buffer shifted one byte (dims still "
               "parse, so the SQL oracle is blind; the exact-stats "
               "golden catches the feature shift)",
        tests=["tests/test_training_ops.py::test_media_real_decode_kernels"],
    ),
]

# Worker: runs the OPS queries from the COPIED entry (mutated package)
# against DuckDB oracles (SQL strings — text, unmutated by design since
# mutations only target yago4_spark/*.py). Reuses check_oracle's
# normalization/hash so the kill criterion is the driver's.
_WORKER = '''\
import json, sys
sf_dir, out_json = sys.argv[1], sys.argv[2]
sys.path.insert(0, ".")
import duckdb
import __spark_entry__ as entry_mod
from scripts.check_oracle import TABLES, value_hash
from yago4_spark.session import get_spark

spark = get_spark(app_name="mutation-ops-worker", master="local[8]",
                  shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
names = json.loads(sys.argv[3])
out = {}
for name in names:
    try:
        sdf = qs[name](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        out[name] = {
            "rows": [len(srows), len(drows)],
            "cols_ok": sorted(scols) == sorted(dcols),
            "hash_ok": value_hash(srows, scols) == value_hash(drows, dcols),
        }
    except Exception as e:
        out[name] = {"err": f"{type(e).__name__}: {e}"[:300]}
with open(out_json, "w") as f:
    json.dump(out, f)
spark.stop()
'''


def run_oracle_worker(base: Path, name: str, sf_dir: str,
                      timeout: int = 900) -> dict | str:
    out_json = base / f"rows_{name}.json"
    try:
        proc = subprocess.run(
            [sys.executable, "worker.py", sf_dir, str(out_json),
             json.dumps(OPS_QUERIES)],
            capture_output=True, text=True, timeout=timeout,
            cwd=str(base / "pkg"),
        )
    except subprocess.TimeoutExpired:
        return "TIMEOUT"
    if proc.returncode != 0:
        tail = "\n".join(proc.stderr.strip().split("\n")[-5:])
        return f"ERROR rc={proc.returncode}: {tail[-400:]}"
    with open(out_json) as f:
        return json.load(f)


def run_killer_tests(base: Path, tests: list[str],
                     timeout: int = 900) -> tuple[bool, str]:
    """True = at least one listed test FAILED (mutant caught)."""
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", *tests, "-q", "--no-header"],
            capture_output=True, text=True, timeout=timeout,
            cwd=str(base / "pkg"),
        )
    except subprocess.TimeoutExpired:
        return True, "pytest TIMEOUT (counted as caught)"
    tail = proc.stdout.strip().split("\n")[-1][:160]
    return proc.returncode != 0, tail


def mismatches(rows: dict) -> list[str]:
    bad = []
    for q, r in rows.items():
        if "err" in r:
            bad.append(f"{q} ERR")
        elif not (r["cols_ok"] and r["hash_ok"]
                  and r["rows"][0] == r["rows"][1]):
            bad.append(
                f"{q} rows={r['rows'][0]}/{r['rows'][1]}"
                f"{'' if r['hash_ok'] else ' hash'}"
                f"{'' if r['cols_ok'] else ' cols'}")
    return bad


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    base = Path("/tmp/mutation_check_ops")
    shutil.rmtree(base, ignore_errors=True)
    (base / "pkg").mkdir(parents=True)

    shutil.copytree(REPO / "yago4_spark", base / "pkg" / "yago4_spark")
    shutil.copytree(REPO / "scripts", base / "pkg" / "scripts")
    shutil.copytree(REPO / "tests", base / "pkg" / "tests")
    shutil.copy(REPO / "__spark_entry__.py", base / "pkg")
    (base / "pkg" / "worker.py").write_text(_WORKER)

    t0 = time.time()
    rows = run_oracle_worker(base, "baseline", sf_dir)
    assert not isinstance(rows, str), f"baseline failed: {rows}"
    bad = mismatches(rows)
    assert not bad, f"baseline oracle sweep not clean: {bad}"
    print(f"[baseline] {len(OPS_QUERIES)}/{len(OPS_QUERIES)} oracle-green "
          f"in {time.time() - t0:.0f}s", flush=True)
    killer_tests = sorted({t for m in MUTATIONS for t in m.get("tests", [])})
    t0 = time.time()
    caught, tail = run_killer_tests(base, killer_tests)
    assert not caught, f"baseline killer tests not green: {tail}"
    print(f"[baseline] killer tests green in {time.time() - t0:.0f}s",
          flush=True)

    results = []
    for m in MUTATIONS:
        if only and m["name"] not in only:
            continue
        target = base / "pkg" / m["file"]
        src = target.read_text()
        n_hits = src.count(m["old"])
        assert n_hits == 1, f"{m['name']}: {n_hits} matches for old text"
        t0 = time.time()
        target.write_text(src.replace(m["old"], m["new"]))
        try:
            out = run_oracle_worker(base, m["name"], sf_dir)
            detail: list[str] = []
            if isinstance(out, str):
                verdict, detail = "killed (worker error)", [out[:90]]
            else:
                detail = mismatches(out)
                verdict = "killed (oracle)" if detail else ""
            if not verdict and m.get("tests"):
                caught, tail = run_killer_tests(base, m["tests"])
                if caught:
                    verdict = "killed (test)"
                    detail = [tail]
            if not verdict:
                verdict = "SURVIVED"
        finally:
            target.write_text(src)
        results.append((m, verdict, detail, time.time() - t0))
        print(f"[{m['name']}] {verdict} "
              f"{'; '.join(detail[:3])} ({time.time() - t0:.0f}s)",
              flush=True)

    killed = sum(1 for _, v, _, _ in results if v != "SURVIVED")
    lines = [
        "",
        f"## LLM-ops mutation kill matrix at {sf_dir} "
        "(scripts/mutation_check_ops.py)",
        "",
        "Single-point mutations planted in a COPY of the dedup/"
        "similarity/linking/media/text operators; each must be caught "
        f"by the {len(OPS_QUERIES)}-query DuckDB oracle sweep (row/"
        "schema/value-hash mismatch) or by its designated pytest "
        "killer. A surviving mutant is an oracle blind spot.",
        "",
        f"**{killed}/{len(results)} mutants killed.**",
        "",
        "| mutation | planted in | outcome | evidence |",
        "|---|---|---|---|",
    ]
    for m, verdict, detail, dt in results:
        ev = "; ".join(detail[:3]).replace("|", "/")
        if len(detail) > 3:
            ev += f" (+{len(detail) - 3} more)"
        out = f"**{verdict}**" if verdict == "SURVIVED" else verdict
        lines.append(f"| {m['name']} | `{m['file']}` | {out} | {ev} |")
    lines.append("")
    report = "\n".join(lines) + "\n"
    print(report)
    with open(REPO / "BASELINE_RESULTS.md", "a") as f:
        f.write(report)
    print(json.dumps({"mutants": len(results), "killed": killed,
                      "survived": [m["name"] for m, v, _, _ in results
                                   if v == "SURVIVED"]}))
    return 0 if killed == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
