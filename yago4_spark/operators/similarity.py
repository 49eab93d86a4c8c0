"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot products run JVM-side via ``F.zip_with`` + ``F.aggregate`` (no
  Python); one pass over the table per query batch.
- ``ivf_topk``: the scale path — a one-level IVF index: k-means-lite
  centroids picked deterministically (first ``n_cells`` vectors by id,
  one assignment pass), queries probe only ``n_probe`` nearest cells.
  At 100 TB the cell assignment is the partition key, so a query touches
  n_probe/n_cells of the data.
- Embedding-cosine near-dup: pairs within a cell with cosine >=
  threshold (blocking by cell, never all-pairs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _py_norm(v: list[float]) -> float:
    """Driver-side twin of :func:`norm`: the SAME left-fold order over
    IEEE doubles as F.aggregate, so a folded-constant centroid norm is
    bit-identical to the Column computation (math.fsum or np.linalg
    would not be)."""
    import math

    acc = 0.0
    for x in v:
        acc = acc + x * x
    return math.sqrt(acc)


def cosine_topk(embeddings: DataFrame, query: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_to: int | None = 6) -> DataFrame:
    """Exact top-k by cosine to a literal query vector; deterministic
    order (sim DESC, id ASC). Rounding keeps float32/float64 engines
    comparable."""
    q = F.array(*[F.lit(float(x)) for x in query])
    sim = cosine(F.col(vec_col).cast("array<double>"), q)
    if round_to is not None:
        sim = F.round(sim, round_to)
    return (
        embeddings.select(F.col(id_col).alias("vec_id"), sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def assign_cells(embeddings: DataFrame, centroids: DataFrame,
                 id_col: str = "vec_id", vec_col: str = "embedding"
                 ) -> DataFrame:
    """(vec_id, cell, embedding): nearest centroid by cosine — the IVF
    assignment pass.

    Centroids are config-sized (n_cells × dim), so they are collected
    and inlined as literals and the argmax is a NARROW per-row
    array_min over (-csim, cell) structs — zero shuffle and no ×n_cells
    crossJoin row explosion. The previous shape (crossJoin + Window
    over vec_id) shuffled the FULL vector table once per call, and
    k-means pays assignment once per Lloyd iteration. csim is rounded
    to 6dp before the argmax so ties break on the LOWEST cell id
    identically across engines (float sum order differs between Spark
    and the oracle), exactly like the old orderBy(csim desc, cell
    asc)."""
    cents = sorted((int(r["cell"]), [float(x) for x in r["cvec"]])
                   for r in centroids.collect())
    return _assign_cells_literal(embeddings, cents, id_col, vec_col)


def _round6_half_up(x):
    """Vectorized twin of Spark's round(double, 6): Spark rounds the
    SHORTEST decimal representation (BigDecimal.valueOf) HALF_UP. The
    fast path scales by 1e6 and floors; rows whose scaled fraction
    lands near the .5 boundary (where binary noise could disagree with
    the decimal string) are redone exactly with Decimal(repr(x)) —
    repr() is the same shortest representation. Returns the scaled
    integers (×1e6), which is all the argmax needs."""
    import decimal

    import numpy as np

    ax = np.abs(x)
    scaled = ax * 1e6
    ri = np.floor(scaled + 0.5)
    frac = scaled - np.floor(scaled)
    sus = np.abs(frac - 0.5) < 1e-9
    if sus.any():
        it = np.nditer(sus, flags=["multi_index"])
        for flag in it:
            if not flag or not np.isfinite(x[it.multi_index]):
                continue
            d = decimal.Decimal(repr(float(ax[it.multi_index]))).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP)
            ri[it.multi_index] = float(d * 1_000_000)
    return np.sign(x) * ri


def _assign_cells_literal(embeddings: DataFrame,
                          cents: list[tuple[int, list[float]]],
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """assign_cells over driver-side centroids — k-means calls this
    directly per Lloyd iteration (its centroids already live on the
    driver; a DataFrame round-trip would cost a collect job per
    iteration).

    The argmax runs as a mapInArrow numpy kernel (guide §4.2): one
    matmul per Arrow batch instead of the previous n_cells×dim literal
    argmin expression, whose tree size forced interpreted per-row
    evaluation (the round-5 perf-weak finding: 0.96s -> 1.6-2.6s on
    ann_ivf_topk). Semantics preserved exactly: cosine rounded to 6dp
    (Spark HALF_UP twin, see :func:`_round6_half_up`), ties -> lowest
    cell id (cents sorted ascending; np.argmax returns the first
    maximum), zero-norm rows -> NaN sims -> lowest cell (all -inf after
    masking), zero-norm centroids never win (their column is -inf
    unless every column is)."""
    assert cents, "assign_cells needs at least one centroid"
    cents = sorted(cents)
    cells = [int(c) for c, _ in cents]
    cmat = [[float(x) for x in cv] for _, cv in cents]
    cnorms = [_py_norm(cv) for cv in cmat]
    out_schema = ", ".join([
        f"vec_id {embeddings.schema[id_col].dataType.simpleString()}",
        "cell int",
        f"embedding {embeddings.schema[vec_col].dataType.simpleString()}",
    ])

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        cm = np.asarray(cmat, dtype=np.float64)
        cn = np.asarray(cnorms, dtype=np.float64)
        cl = np.asarray(cells, dtype=np.int32)
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            emb = batch.column(1)
            flat = np.asarray(emb.flatten(), dtype=np.float64)
            mat = flat.reshape(n, -1)
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = (mat @ cm.T) / (
                    np.sqrt((mat * mat).sum(axis=1))[:, None] * cn[None, :])
                ri = _round6_half_up(sims)
            ri[~np.isfinite(ri)] = -np.inf
            best = cl[np.argmax(ri, axis=1)]
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), pa.array(best, type=pa.int32()), emb],
                names=["vec_id", "cell", "embedding"])

    return embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    ).mapInArrow(kernel, out_schema)


def deterministic_centroids(embeddings: DataFrame, n_cells: int = 8,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Centroids = the n_cells lowest-id vectors (deterministic seed
    choice; a real deployment would run k-means — the probing plan is
    identical)."""
    return (
        embeddings.orderBy(F.col(id_col).asc())
        .limit(n_cells)
        .select(
            (F.row_number().over(Window.orderBy(F.col(id_col).asc())) - 1)
            .alias("cell"),
            F.col(vec_col).alias("cvec"),
        )
    )


def _farthest_point_seed(sample: list[tuple], n_cells: int) -> list[list[float]]:
    """Greedy max-min cosine seeding over a driver-side sample.
    Deterministic: starts at the lowest-id sample vector; each next seed
    is the sample point with the smallest max-cosine to the chosen set
    (ties → lowest id). Zero-norm vectors are skipped as seeds."""
    import numpy as np

    if not sample:
        return []
    sample = sorted(sample, key=lambda t: t[0])
    mat = np.asarray([t[1] for t in sample], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    ok = norms > 0
    unit = np.where(ok[:, None], mat / np.where(ok, norms, 1.0)[:, None], 0.0)
    chosen = [int(np.argmax(ok))] if ok.any() else [0]
    # max cosine to the chosen set so far; non-unit rows never win argmin
    best = unit @ unit[chosen[0]]
    best[~ok] = np.inf
    for _ in range(1, min(n_cells, int(ok.sum()) or 1)):
        nxt = int(np.argmin(best))  # argmin is first-index on ties → lowest id
        if not np.isfinite(best[nxt]):
            break
        chosen.append(nxt)
        best = np.maximum(best, unit @ unit[nxt])
        best[chosen] = np.inf
    out = [list(map(float, mat[i])) for i in chosen]
    while len(out) < n_cells and out:
        out.append(out[len(out) % len(chosen)])  # degenerate corpus: repeat
    return out[:n_cells]


def kmeans_centroids(embeddings: DataFrame, n_cells: int = 8,
                     n_iter: int = 5, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Distributed Lloyd k-means (cosine assignment + per-dimension mean
    = spherical k-means up to normalization, which cosine ignores).

    Deterministic end-to-end: seeded with the n_cells lowest-id vectors,
    assignment ties break on cell id (assign_cells), iteration count is
    fixed. Per iteration: one broadcast crossJoin assignment pass + one
    posexplode/groupBy mean — both partition-parallel, centroids
    (n_cells × dim, config-sized) collect to the driver for
    re-broadcast. Empty cells keep their previous centroid.

    Seeding is deterministic farthest-point (k-means++-style, greedy
    max-min cosine distance) over a hash-ordered sample of ≤1024
    vectors: a first-n-by-id seed on an id-sorted corpus can land every
    seed inside ONE true cluster, from which Lloyd cannot escape (two
    clusters merge into one cell — the local minimum
    test_near_dup_kmeans_blocking guards against). The sample is
    config-sized (≤1024 × dim), so the driver-side greedy pass is not a
    scale concern.

    On corpora with real cluster structure this concentrates each
    cluster in one cell, so ivf_topk probing n_probe/n_cells of the data
    holds recall@10 ≥ 0.9 (test_kmeans_ivf_recall_mixture); the
    first-n-by-id seed alone cannot on such corpora."""
    sample = [
        (r["_i"], list(r["_v"]))
        for r in embeddings.select(
            F.col(id_col).alias("_i"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .orderBy(F.xxhash64(F.col(id_col).cast("string")).asc(),
                 F.col(id_col).asc())
        .limit(1024)
        .collect()
    ]
    prev = {i: v for i, v in enumerate(_farthest_point_seed(sample, n_cells))}
    spark = embeddings.sparkSession
    for _ in range(n_iter):
        assigned = _assign_cells_literal(
            embeddings,
            sorted((c, [float(x) for x in cv]) for c, cv in prev.items()),
            id_col, vec_col)
        dims = assigned.select(
            "cell",
            F.posexplode(F.col("embedding").cast("array<double>"))
            .alias("pos", "val"),
        )
        means = (
            dims.groupBy("cell", "pos").agg(F.avg("val").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell", F.transform("pm", lambda x: x["m"]).alias("cvec"))
        )
        new = {r["cell"]: list(r["cvec"]) for r in means.collect()}
        prev = {**prev, **new}  # empty cells keep previous centroid
    return spark.createDataFrame(
        sorted(prev.items()), "cell int, cvec array<double>")


def ivf_topk(embeddings: DataFrame, query: list[float], k: int = 10,
             n_cells: int = 8, n_probe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroids: DataFrame | None = None) -> DataFrame:
    """Approximate top-k: probe the n_probe cells whose centroids are
    nearest the query, brute-force inside them. ``centroids`` overrides
    the deterministic first-n seed (pass :func:`kmeans_centroids` output
    for corpora with cluster structure)."""
    from .cache import track

    cents = track(centroids if centroids is not None
                  else deterministic_centroids(embeddings, n_cells,
                                               id_col, vec_col))
    assigned = assign_cells(embeddings, cents, id_col, vec_col)

    q = F.array(*[F.lit(float(x)) for x in query])
    probe_cells = [
        r["cell"]
        for r in cents.select(
            "cell",
            F.round(cosine(F.col("cvec").cast("array<double>"), q), 6).alias("s"),
        )
        .orderBy(F.col("s").desc(), F.col("cell").asc())
        .limit(n_probe)
        .collect()
    ]
    sim = F.round(cosine(F.col("embedding").cast("array<double>"), q), 6)
    return (
        assigned.where(F.col("cell").isin(probe_cells))
        .select("vec_id", sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def ivf_topk_batch(embeddings: DataFrame, queries, k: int = 10,
                   n_cells: int = 8, n_probe: int = 2,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   centroids: DataFrame | None = None) -> DataFrame:
    """Batched IVF top-k: ONE cell-assignment job amortized across every
    query in the batch (``ivf_topk`` re-assigns per call — fine for a
    single probe, wrong shape for a query workload at 100 TB).

    ``queries``: list[(query_id, vector)] or a DataFrame
    (query_id, qvec). Returns (query_id, vec_id, sim), top-k per query,
    deterministic (sim DESC, vec_id ASC).

    Plan: centroids broadcast → one assignment pass over the corpus
    (the only full-data job) → per-query probe cells picked on the
    query×centroid table (Q×n_cells rows, config-sized) → probes
    broadcast-joined to the assigned corpus on cell (no shuffle of the
    corpus side beyond the assignment) → per-query top-k window over
    only the probed fraction."""
    from .cache import track

    spark = embeddings.sparkSession
    if not isinstance(queries, DataFrame):
        queries = spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in queries],
            "query_id int, qvec array<double>")
    cents = track(centroids if centroids is not None
                  else deterministic_centroids(embeddings, n_cells,
                                               id_col, vec_col))
    assigned = assign_cells(embeddings, cents, id_col, vec_col)

    qc = queries.crossJoin(F.broadcast(cents)).select(
        "query_id", "qvec", "cell",
        F.round(cosine(F.col("cvec").cast("array<double>"),
                       F.col("qvec").cast("array<double>")), 6).alias("s"),
    )
    wp = Window.partitionBy("query_id").orderBy(F.col("s").desc(),
                                                F.col("cell").asc())
    probes = (
        qc.withColumn("_rn", F.row_number().over(wp))
        .where(F.col("_rn") <= n_probe)
        .select("query_id", "qvec", "cell")
    )
    scored = assigned.join(F.broadcast(probes), "cell").select(
        "query_id", "vec_id",
        F.round(cosine(F.col("embedding").cast("array<double>"),
                       F.col("qvec").cast("array<double>")), 6).alias("sim"),
    )
    wk = Window.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                                F.col("vec_id").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(wk))
        .where(F.col("_rn") <= k)
        .select("query_id", "vec_id", "sim")
    )


def embedding_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                             n_cells: int = 8, max_cell_size: int = 4096,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             centroids: DataFrame | None = None) -> DataFrame:
    """Near-duplicate vector pairs: block by IVF cell, all-pairs only
    within a cell, cosine >= threshold. Returns (id_a, id_b, sim).

    Blocking centroids default to :func:`kmeans_centroids`: on lumpy
    real corpora a first-n-by-id seed concentrates mass in few cells and
    leans on the sub-split cap to bound work, which costs recall (pairs
    split across blocks are never compared); k-means balances the cells
    so the cap stays a safety net instead of the primary partitioner
    (test_near_dup_kmeans_blocking measures the cap engaging far less).
    Pass ``centroids=deterministic_centroids(...)`` for the cheap seed.

    Hub-cell cap: real embedding distributions are lumpy — one dominant
    cell would otherwise run a single O(n²) task. Cells larger than
    ``max_cell_size`` are deterministically sub-split into
    ceil(n/max_cell_size) blocks by id hash (pairs emitted only within a
    block, the same bounded-recall trade the shingle document-frequency
    cap makes for n-gram Jaccard). The split is a broadcast join of the
    per-cell counts + a hash modulo — no window sort over the hub cell,
    which would itself be the skew bottleneck."""
    from .cache import track

    cents = (centroids if centroids is not None
             else kmeans_centroids(embeddings, n_cells, id_col=id_col,
                                   vec_col=vec_col))
    # assignment is now a NARROW projection, so it inherits the input's
    # partitioning (often 1 file-partition at bench scale). The pair
    # join below broadcasts the small side when it can, and a broadcast
    # hash join spreads each block's C(n,2) verify work across the
    # PROBE side's partitions — so re-spread by id hash or one task
    # verifies every pair (observed 12× wall). At cluster scale the
    # join is a shuffle join on (cell, block) and AQE subsumes this
    # exchange into that shuffle.
    assigned = track(
        assign_cells(embeddings, cents, id_col, vec_col)
        .repartition(F.col("vec_id"))
    )
    counts = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("_n"))
    n_blocks = F.greatest(
        F.lit(1).cast("long"),
        F.ceil(F.col("_n") / F.lit(max_cell_size)).cast("long"),
    )
    assigned = (
        assigned.join(F.broadcast(counts), "cell")
        .withColumn("block", F.pmod(F.xxhash64(F.col("vec_id").cast("string")),
                                    n_blocks))
        .drop("_n")
    )
    a = assigned.select(
        F.col("cell"), F.col("block"), F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
    )
    b = assigned.select(
        F.col("cell"), F.col("block"), F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
    )
    return (
        a.join(b, ["cell", "block"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(cosine(F.col("va").cast("array<double>"),
                           F.col("vb").cast("array<double>")), 6).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )
