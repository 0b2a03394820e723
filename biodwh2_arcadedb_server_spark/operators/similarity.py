"""Embedding similarity search (C3): brute-force exact + LSH-bucketed ANN.

- ``cosine_topk``      — exact top-k for one query vector: broadcast
  the query, one scan, TakeOrderedAndProject. The baseline.
- ``knn_join``         — exact top-k for a *set* of query vectors:
  broadcast the (small) query side, crossJoin, per-query window rank.
  Cost O(|queries|·|corpus|) — right when queries are few.
- ``random_hyperplane_lsh`` / ``ann_topk`` — the scale path: sign-bit
  signatures from deterministic pseudo-random hyperplanes bucket the
  corpus; search touches only colliding buckets (multi-probe over
  ``n_tables`` independent tables for recall). At 100 TB the corpus is
  scanned once to build buckets (a write-side cost), and each query
  reads ~corpus/2^bits rows per table instead of everything.

Hyperplane components are derived from xxhash64(table, plane, dim) —
no RNG state, identical on every executor, reproducible across runs.
All vector math uses zip_with/aggregate (JVM-side, codegen).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints must resolve in module globals
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from biodwh2_arcadedb_server_spark.functions import array_dot, array_norm, cosine_similarity


def cosine_topk(
    corpus: DataFrame, query: DataFrame, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact top-k by cosine for a single-row query DataFrame
    (vec_col aliased 'qe'). Returns (id, sim) — see relational.q13."""
    joined = corpus.crossJoin(F.broadcast(query))
    sim = cosine_similarity(F.col(vec_col), F.col("qe"))
    return (
        joined.select(F.col(id_col), sim.alias("sim_raw"))
        .orderBy(F.col("sim_raw").desc(), id_col)
        .limit(k)
        .select(id_col, F.round("sim_raw", 4).alias("sim"))
    )


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact k-NN for every query vector: (query_id, neighbor_id, sim,
    rank). Query side is broadcast; rank via per-query window."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe")
    )
    joined = corpus.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.where(F.col(id_col) != F.col("query_id"))
    sim = cosine_similarity(F.col(vec_col), F.col("qe")).alias("sim_raw")
    scored = joined.select("query_id", F.col(id_col).alias("neighbor_id"), sim)
    w = Window.partitionBy("query_id").orderBy(F.col("sim_raw").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim_raw", 4).alias("sim"), "rank")
    )


def _hyperplane(table: int, plane: int, dim: int):
    """Deterministic pseudo-random hyperplane component in [-1, 1]:
    xxhash64(table, plane, d) scaled. Returns an array Column of
    length ``dim`` built with JVM expressions."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (
            F.pmod(F.xxhash64(F.lit(table), F.lit(plane), d), F.lit(2_000_001)) - F.lit(1_000_000)
        ).cast("double")
        / F.lit(1_000_000.0),
    )


def random_hyperplane_signature(
    vec_col, dim: int, n_planes: int = 8, table: int = 0
):
    """Sign-bit bucket id (long) for one LSH table: bit p = 1 iff
    v·h_p >= 0."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        h = _hyperplane(table, p, dim)
        bit = F.when(array_dot(vec_col, h) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig + bit * F.lit(1 << p).cast("long")
    return sig


_HP_CACHE: dict = {}


def _hyperplane_lits(spark, dim: int, n_planes: int, n_tables: int):
    """All (table, plane) hyperplane components evaluated ONCE per
    session by a single one-row, one-partition JVM job and memoized.
    Same xxhash64-derived values as ``_hyperplane`` — but downstream
    plans then embed one folded json literal instead of
    ``n_tables × n_planes`` ``transform(sequence(...))`` trees, whose
    repeated constant-evaluation inside Catalyst rule passes measured
    as a 4.5s driver-side gap on q31's 8-table plan (profiles r14).
    Data-independent constants (not results), so the memo is shared
    across every caller in the session."""
    key = (spark.sparkContext.applicationId, dim, n_planes, n_tables)
    got = _HP_CACHE.get(key)
    if got is None:
        row = (
            spark.range(0, 1, 1, 1)
            .select(
                *[
                    _hyperplane(t, p, dim).alias(f"h_{t}_{p}")
                    for t in range(n_tables)
                    for p in range(n_planes)
                ]
            )
            .collect()[0]
        )
        got = [
            [list(row[f"h_{t}_{p}"]) for p in range(n_planes)]
            for t in range(n_tables)
        ]
        _HP_CACHE[key] = got
    return got


def _bucketed(
    df: DataFrame, id_alias: str, vec_alias: str, vec_col: str, id_col: str,
    planes_lit, n_planes: int, n_tables: int,
) -> DataFrame:
    """(id, vec, table, bucket) rows — one row per LSH table, with the
    sign-bit signature computed against the folded hyperplane literal.
    Identical bucket values to ``random_hyperplane_signature``.

    Two-step select: the 32 dot products materialize as a plain array
    column BEFORE the per-bit reads — interpreted HOFs don't CSE their
    lambda bodies (see functions.shingles_from_tokens), so inlining
    the transform into every sign-bit would recompute every dot
    product per bit, and the non-cheap alias used many times also
    stops CollapseProject from undoing the split."""
    pre = df.select(
        F.col(id_col).alias(id_alias),
        F.col(vec_col).alias(vec_alias),
        F.transform(planes_lit, lambda h: array_dot(F.col(vec_col), h)).alias(
            "_dots"
        ),
    )

    def _sig(t):
        bits = [
            F.when(
                F.element_at(
                    F.col("_dots"),
                    (t * F.lit(n_planes) + F.lit(p + 1)).cast("int"),
                )
                >= 0,
                F.lit(1 << p).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            for p in range(n_planes)
        ]
        acc = bits[0]
        for b in bits[1:]:
            acc = acc + b
        return acc

    sigs = F.transform(F.sequence(F.lit(0), F.lit(n_tables - 1)), _sig)
    return pre.select(
        id_alias,
        vec_alias,
        F.posexplode(sigs).alias("t", "bucket"),
    )


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate k-NN: bucket corpus and queries by each of
    ``n_tables`` hyperplane signatures and only score collisions;
    dedupe candidates across tables, rank. Recall grows with
    n_tables; cost per query drops ~2^n_planes-fold vs brute force.

    Optimization r14 (guide §2.4/§3.1): the per-table loop used to
    emit ``n_tables`` separate join branches unioned together — 8
    corpus scans and a plan whose analysis alone cost a measured 4.5s
    driver gap. Signatures for ALL tables are now computed in one
    corpus pass against the session-memoized hyperplane literal
    (``_hyperplane_lits``), exploded to (table, bucket) keys, and the
    collision step is ONE broadcast join of the tiny query side on
    (t, bucket) — the same candidate pair set, byte-identical output
    after the unchanged dedupe/score/rank tail."""
    spark = corpus.sparkSession
    hps = _hyperplane_lits(spark, dim, n_planes, n_tables)
    import json as _json

    planes_lit = F.from_json(
        F.lit(_json.dumps([h for tbl in hps for h in tbl])),
        "array<array<double>>",
    )
    c = _bucketed(
        corpus, "neighbor_id", "ce", vec_col, id_col,
        planes_lit, n_planes, n_tables,
    )
    q = _bucketed(
        queries, "query_id", "qe", vec_col, id_col,
        planes_lit, n_planes, n_tables,
    )
    # Broadcast GATE (VERDICT r14 #4 / guide §3.1): the bucketed query
    # side is |queries| x n_tables rows — force-broadcasting it is
    # right for a bounded query set but OOMs the driver/executors when
    # a caller passes a large one (e.g. corpus-vs-corpus at 100 TB).
    # Gate on the optimizer's size estimate of the RAW query frame
    # (driver-only, no job) times the n_tables explosion; above the
    # cap the hint is omitted and the planner picks a shuffle join
    # (or auto-broadcasts if ITS estimate qualifies). Both paths are
    # row-identical — the join produces the same candidate set and the
    # rank tail orders deterministically (tests/test_localrel.py).
    cap = int(
        spark.conf.get("spark.graft.ann.broadcastQueryBytesCap",
                       str(64 << 20))
    )
    try:
        est = int(
            queries._jdf.queryExecution().optimizedPlan().stats()
            .sizeInBytes().toString()
        )
    except Exception:  # noqa: BLE001 — estimate unavailable: keep the hint
        est = 0
    # cap <= 0 disables the hint outright (test hook + the posture for
    # clusters that want the planner's own estimate to decide)
    q_side = F.broadcast(q) if cap > 0 and est * n_tables <= cap else q
    hit = q_side.join(c, ["t", "bucket"]).select(
        "query_id", "neighbor_id", "qe", "ce"
    )
    cands = hit.dropDuplicates(["query_id", "neighbor_id"])
    if exclude_self:
        cands = cands.where(F.col("query_id") != F.col("neighbor_id"))
    scored = cands.select(
        "query_id", "neighbor_id", cosine_similarity("ce", "qe").alias("sim_raw")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim_raw").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim_raw", 4).alias("sim"), "rank")
    )


def _lloyd_sample(X, n_clusters: int, seed: int, max_iter: int = 25, spherical: bool = True):
    """Deterministic k-means on a numpy sample: k-means++ seeding from
    a seeded RNG, Lloyd iterations with empty-cluster reseed to the
    farthest point. ``spherical=True`` renormalizes centroids each
    round (IVF coarse quantizer on the unit sphere); ``False`` keeps
    plain L2 means (PQ sub-quantizers). Pure vectorized numpy — this
    runs ONCE on the driver over a bounded sample, never the corpus."""
    import numpy as np

    rng = np.random.RandomState(seed)
    n = len(X)
    # k-means++ init with an INCREMENTAL min-distance vector: the
    # naive form recomputes d2 against every existing center each
    # round (O(k²·n·d) — 16s at k=160); maintaining the running
    # elementwise minimum is O(k·n·d) and picks the exact same
    # centers (identical d2 values, identical rng call sequence)
    centers = [X[rng.randint(n)]]
    d2 = ((X - centers[0]) ** 2).sum(axis=1)
    for _ in range(1, n_clusters):
        tot = d2.sum()
        if tot <= 0:
            centers.append(X[rng.randint(n)])
        else:
            centers.append(
                X[np.searchsorted(np.cumsum(d2 / tot), rng.rand())]
            )
        d2 = np.minimum(d2, ((X - centers[-1]) ** 2).sum(axis=1))
    C = np.array(centers)
    d2 = np.empty((n, n_clusters))
    for _ in range(max_iter):
        # per-center columns instead of an (n, k, d) broadcast: the
        # same flops and bit-identical sums, without materializing a
        # 335 MB temporary at k=160 (memory traffic, not arithmetic,
        # dominated the broadcast form)
        for j in range(len(C)):
            d2[:, j] = ((X - C[j]) ** 2).sum(axis=1)
        assign = d2.argmin(axis=1)
        newC = np.zeros_like(C)
        for j in range(n_clusters):
            mask = assign == j
            if mask.any():
                c = X[mask].mean(axis=0)
                if spherical:
                    nrm = np.linalg.norm(c)
                    newC[j] = c / nrm if nrm > 0 else c
                else:
                    newC[j] = c
            else:  # empty cell: reseed to the point farthest from its center
                newC[j] = X[d2.min(axis=1).argmax()]
        if np.allclose(newC, C, atol=1e-9):
            C = newC
            break
        C = newC
    return C


def _nearest_cells(vec_col, cent_lit, n_cells: int, n_probe: int):
    """Indices of the ``n_probe`` nearest of ``n_cells`` UNIT-NORM
    centroids to a raw vector column — pure JVM HOFs over the
    centroid literal (no crossJoin, no window). Nearest-on-the-sphere
    reduces to argmax dot(v, c): the row's own norm is constant
    across cells, so the raw vector ranks cells identically to its
    unit form and NO per-row normalization runs (a normalization
    expression inside the lambda would be re-evaluated per centroid —
    O(d²·cells) per row). Sort key is (-dot, idx); slice n_probe."""
    dots = F.transform(
        cent_lit,
        lambda c: -F.aggregate(
            F.zip_with(vec_col, c, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    ranked = F.array_sort(
        F.zip_with(
            dots,
            F.sequence(F.lit(0), F.lit(n_cells - 1)),
            lambda d, i: F.struct(d.alias("negdot"), i.alias("cluster")),
        )
    )
    return F.transform(F.slice(ranked, 1, n_probe), lambda s: s["cluster"])


def _kmll_train_centroids(
    corpus: DataFrame,
    n_clusters: int,
    id_col: str,
    vec_col: str,
    seed: int,
    init_rounds: int = 5,
    oversample: float | None = None,
    phi_plateau: float | None = 0.5,
    max_iter: int = 25,
    stats: dict | None = None,
):
    """k-means||-seeded spherical quantizer training (VERDICT r12 #5
    — the q185 distributed-candidate device applied to the ANN coarse
    quantizer): instead of a hash-ordered SAMPLE + driver kmeans++
    (``_train_spherical_centroids``), the candidate set is drawn from
    the FULL corpus by Bahmani et al. 2012's oversampling — per
    round, one 1-row φ aggregation + one independent-coin selection
    scan over a localCheckpointed (id, unit vec, running best) state,
    with the running (best_d2, best_ord) cost column updated against
    only that round's new candidates. ``phi_plateau`` stops the
    rounds early once a round shrinks φ by less than the factor
    (default 0.5 — the paper's rounds bound is O(log φ), and on
    clusterable corpora φ plateaus in 2-3 rounds: fewer corpus-state
    passes for the same seed quality). The finish is DRIVER-side on
    the ~ℓ·R candidates: Voronoi weights from the running argmin (one
    tiny groupBy), weighted kmeans++ seeding, weighted Lloyd with
    spherical renormalization — numpy over a bounded list, exactly
    the paper's "recluster the weighted candidates" step.

    vs the sampled trainer: candidates come from EVERYWHERE mass
    lives (a hash-ordered sample can under-represent small distant
    clusters), at the same bounded-driver-memory posture; corpus-
    sized work is the initial state projection + per-round scans of
    the checkpointed 3-column state, never a k× rescan."""
    import hashlib
    import math

    import numpy as np

    l = float(oversample if oversample is not None else 2 * n_clusters)

    def _u(rnd: int) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"ivfkmll:{seed}:{rnd}:"),
                            F.col("_i").cast("string"),
                        )
                    ),
                    1, 8,
                ),
                16, 10,
            ).cast("double")
            + 1.0
        ) / 4294967296.0

    def _tb(key):
        return F.struct(key.alias("k"), (-F.col("_i")).alias("t"))

    # unit-normalize once, in-plan (two-step so the norm is a plain
    # column reference, not re-evaluated per element in the lambda)
    raw = corpus.select(
        F.col(id_col).alias("_i"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_vr"),
    ).withColumn(
        "_n",
        F.sqrt(
            F.aggregate("_vr", F.lit(0.0), lambda a, x: a + x * x)
        ),
    )
    unit = raw.select(
        "_i",
        F.transform(
            "_vr", lambda x: x / F.greatest(F.col("_n"), F.lit(1e-12))
        ).alias("_v"),
    )

    def _new_best(cs: list[list[float]], offset: int) -> F.Column:
        cent_lit = _centroid_literal(cs)
        dists = F.transform(
            cent_lit,
            lambda c, j: F.struct(
                F.aggregate(
                    F.zip_with(F.col("_v"), c, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("d"),
                (j + F.lit(offset)).alias("ord"),
            ),
        )
        return F.array_min(dists)

    r0 = unit.select(
        F.max_by(
            F.struct(F.col("_i").alias("i"), F.col("_v").alias("v")),
            _tb(_u(0)),
        ).alias("c")
    ).collect()[0]["c"]
    cands: list[tuple[int, list[float]]] = [(int(r0["i"]), list(r0["v"]))]
    # lazy checkpoints (optimization r15, VERDICT r14 next #4 — the
    # fusion kmeans_assign's inline km|| path already uses): the
    # round's φ aggregation is the FIRST action on the updated state,
    # so a lazy localCheckpoint materializes inside the φ job — one
    # scan per round computes update+φ instead of separate
    # checkpoint and aggregate jobs; the selection scan then reads
    # the materialized state.
    state = unit.withColumn(
        "_best", _new_best([cands[0][1]], 0)
    ).localCheckpoint(eager=False)
    prev_phi: float | None = None
    phis: list[float] = []
    rounds_run = 0
    for r in range(1, init_rounds + 1):
        d2 = F.col("_best")["d"]
        phi = state.select(F.sum(d2).alias("s")).collect()[0]["s"]
        if not phi or phi <= 0:
            break
        phis.append(float(phi))
        if (
            phi_plateau is not None
            and prev_phi is not None
            and phi > phi_plateau * prev_phi
        ):
            break
        prev_phi = float(phi)
        rounds_run = r
        sel = (
            state.where(
                (d2 > 0)
                & (_u(r) < F.least(F.lit(1.0), F.lit(l) * d2 / F.lit(float(phi))))
            )
            .select(F.col("_i").alias("i"), F.col("_v").alias("v"))
            .orderBy("i")
            .collect()  # bounded: E[rows] = min(ℓ, n) per round
        )
        if not sel:
            continue
        offset = len(cands)
        new = [(int(row["i"]), list(row["v"])) for row in sel]
        cands.extend(new)
        state = state.withColumn(
            "_best",
            F.least(F.col("_best"), _new_best([v for _, v in new], offset)),
        ).localCheckpoint(eager=False)  # folds into the next φ agg (or the final Voronoi count)
    word = {
        int(r["ord"]): int(r["count"])
        for r in state.select(F.col("_best")["ord"].alias("ord"))
        .groupBy("ord")
        .count()
        .collect()  # bounded: ≤ |candidates| rows
    }
    if stats is not None:
        stats.update(
            rounds=rounds_run, candidates=len(cands), phi=phis
        )
    X = np.array([v for _, v in cands], dtype=np.float64)
    w = np.array(
        [word.get(o, 0) for o in range(len(cands))], dtype=np.float64
    )
    keep = w > 0
    X, w = X[keep], w[keep]
    ids = [i for (i, _), k_ in zip(cands, keep) if k_]
    if len(X) < n_clusters:
        raise ValueError(
            f"kmeans|| trainer produced {len(X)} weighted candidates < "
            f"k={n_clusters} — raise oversample/init_rounds"
        )

    def _uw(j: int, i: int) -> float:
        return (
            int(
                hashlib.md5(f"ivfkmllw:{seed}:{j}:{i}".encode()).hexdigest()[:8],
                16,
            )
            + 1
        ) / 4294967296.0

    # weighted kmeans++ over the candidates (Efraimidis–Spirakis with
    # weight w·D²), then weighted Lloyd with spherical renorm
    first = max(
        range(len(X)), key=lambda m: (math.log(_uw(0, ids[m])) / w[m], -ids[m])
    )
    sel_idx = [first]
    d2v = ((X - X[first]) ** 2).sum(axis=1)
    while len(sel_idx) < n_clusters:
        j = len(sel_idx)
        best, best_key = None, None
        for m in range(len(X)):
            if m in sel_idx or d2v[m] <= 0:
                continue
            key = (math.log(_uw(j, ids[m])) / (w[m] * d2v[m]), -ids[m])
            if best_key is None or key > best_key:
                best, best_key = m, key
        if best is None:
            raise ValueError(
                f"kmeans|| trainer: fewer than k={n_clusters} distinct "
                "weighted candidates"
            )
        sel_idx.append(best)
        d2v = np.minimum(d2v, ((X - X[best]) ** 2).sum(axis=1))
    C = X[sel_idx].copy()
    for _ in range(max_iter):
        d2m = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2m.argmin(axis=1)
        newC = np.zeros_like(C)
        for j in range(n_clusters):
            mask = assign == j
            if w[mask].sum() > 0:
                c = (X[mask] * w[mask, None]).sum(axis=0) / w[mask].sum()
                nrm = np.linalg.norm(c)
                newC[j] = c / nrm if nrm > 0 else c
            else:
                newC[j] = X[d2m.min(axis=1).argmax()]
        if np.allclose(newC, C, atol=1e-9):
            C = newC
            break
        C = newC
    return C


def _train_spherical_centroids(
    corpus: DataFrame,
    n_clusters: int,
    id_col: str,
    vec_col: str,
    seed: int,
    sample_cap: int,
    max_iter: int,
):
    """Coarse-quantizer training shared by :func:`ivf_topk` and
    :func:`cosine_near_dup_pairs_ann`: spherical k-means on a BOUNDED
    deterministic sample (``sample_cap`` rows picked by hash order —
    a map-side TakeOrdered, one corpus pass), run vectorized on the
    driver, returned as a broadcast centroid literal. Training on a
    sample is statistically standard (FAISS practice — centroids need
    ~100s of points per cell, not the corpus) and removes the
    O(iterations) distributed passes an in-cluster Lloyd's would pay.
    Vectors are normalized in numpy, not in the plan (spherical
    k-means clusters the unit sphere, where L2 order equals cosine
    order, aligning cells with the scoring metric)."""
    import numpy as np

    sample = (
        corpus.select(F.xxhash64(F.col(id_col)).alias("_h"), F.col(vec_col).alias("_v"))
        .orderBy("_h")
        .limit(sample_cap)
        .collect()
    )
    X = np.array([r._v for r in sample], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    return _lloyd_sample(X, n_clusters, seed, max_iter)


def _quantizer(
    corpus: DataFrame,
    n_clusters: int,
    id_col: str,
    vec_col: str,
    seed: int,
    sample_cap: int,
    max_iter: int,
    train_init: str = "sample",
):
    """Coarse-quantizer dispatch: ``train_init="sample"`` — the
    hash-ordered-sample + driver kmeans++ trainer (one corpus pass,
    FAISS practice, the r7 default); ``"kmeans||"`` — the distributed
    Bahmani candidate draw with phi-plateau early stop
    (``_kmll_train_centroids``): candidates come from the full corpus
    so small distant clusters can't be under-sampled, at ~2-3
    passes over a 3-column checkpointed state."""
    if train_init == "sample":
        return _train_spherical_centroids(
            corpus, n_clusters, id_col, vec_col, seed, sample_cap, max_iter
        )
    if train_init == "kmeans||":
        return _kmll_train_centroids(
            corpus, n_clusters, id_col, vec_col, seed, max_iter=max_iter
        )
    raise ValueError(
        f"train_init must be 'sample' or 'kmeans||', got {train_init!r}"
    )


def _centroid_literal(C):
    """Centroid matrix as a nested array literal for JVM-side HOF
    probing. Right for SMALL k (ivf_topk's default 8) — the
    expression tree holds k·d literals, so a large quantizer must
    probe Arrow-side instead (see cosine_near_dup_pairs_ann)."""
    return F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in C])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    exclude_self: bool = True,
    sample_cap: int = 4096,
    max_iter: int = 25,
    train_init: str = "sample",
) -> DataFrame:
    """IVF (inverted-file) approximate k-NN: partition the corpus into
    ``n_clusters`` Voronoi cells, then each query scores only the
    ``n_probe`` cells whose centroids are nearest. Complements the
    hyperplane-LSH path: IVF adapts its partitions to the data
    distribution, so recall per candidate is higher on clustered
    corpora.

    The coarse quantizer is trained the way production IVF indexes
    train (FAISS practice): spherical k-means on a BOUNDED
    deterministic sample (``sample_cap`` rows picked by hash order —
    a map-side TakeOrdered, one corpus pass), run vectorized on the
    driver. Training on a sample is statistically standard (centroids
    need ~100s of points per cell, not the corpus) and removes the
    O(iterations) distributed passes an in-cluster Lloyd's would pay.
    Cell assignment and query probing are pure JVM HOF argmins over
    the broadcast centroid literal — map-only, no crossJoin, no
    window. The only shuffles left are the candidate equi-join on
    cluster id (~n_probe/n_clusters of the corpus read per query) and
    the final per-query top-k. Deterministic for a fixed seed.
    Recall is pytest-gated vs the exact ``knn_join``
    (tests/test_pipeline.py)."""
    dbl = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    C = _quantizer(
        corpus, n_clusters, id_col, vec_col, seed, sample_cap, max_iter,
        train_init,
    )
    cent_lit, n_cells = _centroid_literal(C), len(C)
    assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        dbl.alias("ce"),
        _nearest_cells(F.col(vec_col), cent_lit, n_cells, 1)[0].alias("cluster"),
    )
    probed = queries.select(
        F.col(id_col).alias("query_id"),
        dbl.alias("qe"),
        F.explode(_nearest_cells(F.col(vec_col), cent_lit, n_cells, n_probe)).alias("cluster"),
    )
    cands = probed.join(assigned, "cluster")
    if exclude_self:
        cands = cands.where(F.col("query_id") != F.col("neighbor_id"))
    scored = cands.select(
        "query_id", "neighbor_id", cosine_similarity("ce", "qe").alias("sim_raw")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim_raw").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim_raw", 4).alias("sim"), "rank")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    refine: int = 3,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    exclude_self: bool = True,
    sample_cap: int = 4096,
    max_iter: int = 25,
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (ADC) and exact re-ranking — the memory-compression path of the
    FAISS pair (q77's IVF prunes candidates; PQ shrinks them): each
    unit-normalized vector is encoded as ``m`` sub-quantizer codes
    (here 8 codes × 16 centroids = 8 bytes per vector instead of
    8·dim), and query-to-code distance is m table lookups instead of
    a dim-length dot product. Unit normalization first makes L2 order
    equal cosine order, so ADC ranks by the same metric the exact
    path scores.

    Stages:
    1. Sub-quantizer codebooks: plain-L2 Lloyd's per dim/m-slice on
       the same bounded hash-ordered driver sample IVF trains on.
    2. Corpus encoding: per subvector, argmin against the codebook —
       a dense numpy kernel in an Arrow-batched pandas UDF (the
       blocked-matmul precedent: the codebook ships as a ~KB closure
       and each batch runs one vectorized broadcast; the equivalent
       m×n_codes interpreted-HOF expression measured ~70ms/row).
       Map-only, one pass, no shuffle.
    3. ADC scan: per query, an m×n_codes distance table from the same
       kernel, then a broadcast join against the encoded corpus;
       approximate distance = m element_at lookups folded JVM-side.
    4. Refinement: the ``refine``·k best ADC candidates per query are
       re-scored with exact cosine against the raw vectors (a
       candidate-sized equi-join — k'·|queries| lookups, not a
       corpus scan), and the exact top-k is emitted.

    Scale: the encoded corpus is ~m bytes/vector — at 100 TB of raw
    embeddings the code table is ~1-2% of that and scans at memory
    bandwidth; the raw vectors are touched only by the candidate
    re-rank join. Deterministic for a fixed seed; recall is
    pytest-gated vs the exact ``knn_join`` (tests/test_pipeline.py)."""
    import numpy as np

    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    sub = dim // m
    sample = (
        corpus.select(F.xxhash64(F.col(id_col)).alias("_h"), F.col(vec_col).alias("_v"))
        .orderBy("_h")
        .limit(sample_cap)
        .collect()
    )
    X = np.array([r._v for r in sample], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    books = np.stack(
        [
            _lloyd_sample(
                X[:, j * sub : (j + 1) * sub], n_codes, seed + j, max_iter, spherical=False
            )
            for j in range(m)
        ]
    )  # (m, n_codes, sub) — a few KB; ships as a closure into the UDFs

    from pyspark.sql.functions import pandas_udf

    def _normed(vecs):
        V = np.array(vecs.tolist(), dtype=np.float64)
        return V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)

    # Encoding and table-building are dense per-subvector distance
    # kernels — the sanctioned Arrow path (same rationale as the
    # blocked matmul): one numpy broadcast per batch instead of
    # m×n_codes interpreted HOF lambdas per row (the expression form
    # measured ~70ms/row; this runs the whole batch in BLAS time).
    @pandas_udf("array<int>")
    def _encode(vecs: pd.Series) -> pd.Series:
        V = _normed(vecs)
        codes = np.empty((len(V), m), dtype=np.int32)
        for j in range(m):
            S = V[:, j * sub : (j + 1) * sub]
            D = ((S[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = D.argmin(axis=1)
        return pd.Series(list(codes))

    @pandas_udf("array<array<double>>")
    def _adc_table(vecs: pd.Series) -> pd.Series:
        V = _normed(vecs)
        tabs = np.empty((len(V), m, n_codes), dtype=np.float64)
        for j in range(m):
            S = V[:, j * sub : (j + 1) * sub]
            tabs[:, j, :] = ((S[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        return pd.Series([[list(row) for row in t] for t in tabs])

    encoded = corpus.select(
        F.col(id_col).alias("neighbor_id"), _encode(F.col(vec_col)).alias("codes")
    )
    qtab = queries.select(
        F.col(id_col).alias("query_id"), _adc_table(F.col(vec_col)).alias("tab")
    )
    approx = encoded.crossJoin(F.broadcast(qtab))
    if exclude_self:
        approx = approx.where(F.col("query_id") != F.col("neighbor_id"))
    approx_dist = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("tab"),
            lambda code, trow: F.element_at(trow, code + F.lit(1)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("adist"), F.col("neighbor_id"))
    shortlist = (
        approx.select("query_id", "neighbor_id", approx_dist.alias("adist"))
        .withColumn("_rn", F.row_number().over(wq))
        .where(F.col("_rn") <= refine * k)
        .select("query_id", "neighbor_id")
    )
    # exact re-rank of the candidate-sized shortlist against raw vectors
    cvec = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("ce"),
    )
    qvec = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qe"),
    )
    scored = (
        shortlist.join(cvec, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select("query_id", "neighbor_id", cosine_similarity("ce", "qe").alias("sim_raw"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim_raw").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim_raw", 4).alias("sim"), "rank")
    )


def srp_sign_matrix(out_dim: int, in_dim: int) -> list[list[int]]:
    """Deterministic ±1 sparse-random-projection sign matrix: sign(j,i)
    = +1 iff the first hex digit of md5("srp_j_i") < '8'. Pure
    public-hash derivation — no RNG state, identical everywhere, and
    reproducible verbatim in any engine with md5 (the DuckDB oracle
    inlines the same matrix)."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"srp_{j}_{i}".encode()).hexdigest()[0], 16) < 8 else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def random_projection(
    corpus: DataFrame,
    out_dim: int = 16,
    in_dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction with a ±1 sign
    matrix (Achlioptas, JCSS 2003: database-friendly random
    projections): y_j = (1/√out_dim)·Σ_i sign(j,i)·x_i. Distances are
    preserved within (1±ε) w.h.p., so a 4× narrower embedding column
    feeds every downstream cosine/ANN operator at a quarter of the
    shuffle bytes — the standard first move before similarity search
    at 100 TB.

    Map-only: one zip_with/aggregate fold per output dim, all JVM
    codegen, no exchange. Returns (vec_id, p0..p{out_dim-1}) scalars,
    rounded to 4 dp for cross-engine comparison.

    Hard precondition: ``size(vec_col) == in_dim`` with no NULL
    elements. It is enforced with ``raise_error`` rather than silently
    tolerated — zip_with pads a short vector with NULLs and the fold
    would null-poison the whole projection while an engine that skips
    NULLs (DuckDB list_sum) returns a partial sum: a silent
    wrong-result and a cross-engine divergence. Failing loudly at the
    first nonconforming row is the 100 TB-safe contract."""
    signs = srp_sign_matrix(out_dim, in_dim)
    scale = 1.0 / (out_dim ** 0.5)
    vec = F.when(
        F.size(F.col(vec_col)) == in_dim, F.col(vec_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"random_projection: size({vec_col}) != {in_dim} for {id_col}="),
                F.col(id_col).cast("string"),
            )
        )
    )
    cols = []
    for j in range(out_dim):
        sj = F.array(*[F.lit(float(s)) for s in signs[j]])
        dot = F.aggregate(
            F.zip_with(vec, sj, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cols.append(F.round(dot * F.lit(scale), 4).alias(f"p{j}"))
    return corpus.select(F.col(id_col), *cols)


def cosine_near_dup_pairs_bruteforce(
    corpus: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, sim >= threshold).
    Row-at-a-time reference implementation: O(n²) pairs, one
    interpreted HOF dot per pair. Kept as the correctness reference;
    ``cosine_near_dup_pairs`` below is the production path."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("ea"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("eb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = cosine_similarity("ea", "eb")
    return (
        pairs.select("id_a", "id_b", sim.alias("sim_raw"))
        .where(F.col("sim_raw") >= threshold)
        .select("id_a", "id_b", F.round("sim_raw", 4).alias("sim"))
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """All-pairs cosine >= threshold via **blocked matrix multiply** —
    the scale path for exact near-dup over embeddings.

    1. Normalize each vector once (JVM higher-order fn) so pair
       similarity collapses to a dot product.
    2. Hash-assign each vector to one of ``n_blocks`` blocks; send a
       copy of each vector to every block *pair* it participates in
       (shuffle volume = n_blocks × data, vs n × data for a naive
       cross join).
    3. Per block pair, one vectorized numpy ``A @ B.T`` inside
       ``applyInPandas`` (Arrow-batched; BLAS does the flops).

    n_blocks tunes the memory/parallelism trade: each task holds two
    blocks of ~n/n_blocks vectors. At 100 TB, n_blocks grows so a
    block fits executor memory; the matmul stays dense and local.
    """
    import pandas as pd

    ne = F.transform(vec_col, lambda x: x.cast("double") / array_norm(vec_col))
    base = corpus.select(
        F.col(id_col).cast("long").alias("_id"),
        ne.alias("_ne"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("_blk"),
    )
    # replicate each row to every block pair (g1 <= g2) it belongs to
    partner = F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("_other")
    replicated = base.select("_id", "_ne", "_blk", partner).select(
        "_id",
        "_ne",
        "_blk",
        F.least("_blk", "_other").alias("_g1"),
        F.greatest("_blk", "_other").alias("_g2"),
    ).dropDuplicates(["_id", "_g1", "_g2"])

    thr = float(threshold)

    def block_pair(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        g1, g2 = key
        import numpy as np

        if g1 == g2:
            ids = pdf["_id"].to_numpy()
            m = np.stack(pdf["_ne"].to_numpy())
            sims = m @ m.T
            ia, ib = np.triu_indices(len(ids), k=1)
            mask = sims[ia, ib] >= thr
            a_ids, b_ids = ids[ia[mask]], ids[ib[mask]]
            vals = sims[ia[mask], ib[mask]]
        else:
            left = pdf[pdf["_blk"] == g1]
            right = pdf[pdf["_blk"] == g2]
            if left.empty or right.empty:
                return pd.DataFrame({"id_a": [], "id_b": [], "sim_raw": []})
            la, lb = left["_id"].to_numpy(), right["_id"].to_numpy()
            ma, mb = np.stack(left["_ne"].to_numpy()), np.stack(right["_ne"].to_numpy())
            sims = ma @ mb.T
            ia, ib = np.where(sims >= thr)
            a_ids, b_ids = la[ia], lb[ib]
            vals = sims[ia, ib]
        lo = np.minimum(a_ids, b_ids)
        hi = np.maximum(a_ids, b_ids)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "sim_raw": vals})

    out = replicated.groupBy("_g1", "_g2").applyInPandas(
        block_pair, schema="id_a long, id_b long, sim_raw double"
    )
    return out.select("id_a", "id_b", F.round("sim_raw", 4).alias("sim"))


def cosine_near_dup_pairs_ann(
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    sample_cap: int = 4096,
    max_iter: int = 25,
    train_init: str = "sample",
) -> DataFrame:
    """ANN-shortlisted cosine near-dup pairs — the 100 TB semantic-
    dedup path (SemDeDup shape: Abbas et al. 2023 deduplicate within
    k-means clusters of the embedding space, never across the whole
    corpus).

    1. Train the IVF coarse quantizer (bounded-sample spherical
       k-means, shared with :func:`ivf_topk`).
    2. Multi-probe assignment: each vector joins its ``n_probe``
       nearest cells, so a pair is shortlisted iff the probe sets
       intersect — multi-probe recovers most near-threshold pairs
       that straddle a cell boundary.
    3. Exact all-pairs cosine WITHIN each cell (one vectorized BLAS
       matmul per cell via ``applyInPandas``), keep sims >=
       ``threshold``, dedupe pairs seen in several shared cells.

    Similarities are EXACT (no false positives vs
    :func:`cosine_near_dup_pairs` — the output is a subset); only
    cross-cell pairs can be missed, and the measured recall is
    contract-gated (pipeline q156). Scale: with ``n_clusters`` grown
    ∝ corpus size (bounded cell cardinality), per-cell matmuls are
    O(cell²) each and O(n·cell·n_probe²) total — LINEAR in the
    corpus, vs the O(n²) flops of the exact blocked path; the only
    shuffle is the n_probe-way cell assignment on an 8-byte key."""
    import numpy as np
    import pandas as pd

    C = _quantizer(
        corpus, n_clusters, id_col, vec_col, seed, sample_cap, max_iter,
        train_init,
    )
    Ct = C.T.copy()
    p = min(n_probe, len(C))

    @F.pandas_udf("array<int>")
    def _probe_cells(vs: pd.Series) -> pd.Series:
        # Arrow-side multi-probe: one BLAS matmul per batch against
        # the closure-captured centroid matrix (k·d doubles — ~80 KB
        # at k=160). A JVM centroid LITERAL here would put k·d nodes
        # in the expression tree and per-row interpreted HOF folds —
        # measured 10x slower at k=160 (the scaled-cells regime this
        # path exists for). Raw vectors rank cells like unit vectors
        # (row norm is constant across cells); stable argsort breaks
        # dot ties by cell index, matching _nearest_cells' sort key.
        X = np.stack(vs.to_numpy()).astype(np.float64)
        order = np.argsort(-(X @ Ct), axis=1, kind="stable")[:, :p]
        return pd.Series([r.astype("int32").tolist() for r in order])

    member = corpus.select(
        F.col(id_col).cast("long").alias("_id"),
        # RAW vectors travel; normalization happens Arrow-side in the
        # per-cell kernel (one BLAS pass) — a per-element JVM HOF
        # divide re-evaluates the O(d) norm fold per element, O(d²)
        # interpreted ops per row, measured 20x slower end-to-end
        F.col(vec_col).alias("_ne"),
        F.explode(_probe_cells(F.col(vec_col))).alias("_cell"),
    )
    thr = float(threshold)

    def cell_pairs(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        ids = pdf["_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "sim_raw": []})
        m = np.stack(pdf["_ne"].to_numpy()).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        sims = m @ m.T
        ia, ib = np.triu_indices(len(ids), k=1)
        mask = sims[ia, ib] >= thr
        a_ids, b_ids = ids[ia[mask]], ids[ib[mask]]
        return pd.DataFrame(
            {
                "id_a": np.minimum(a_ids, b_ids),
                "id_b": np.maximum(a_ids, b_ids),
                "sim_raw": sims[ia[mask], ib[mask]],
            }
        )

    out = member.groupBy("_cell").applyInPandas(
        cell_pairs, schema="id_a long, id_b long, sim_raw double"
    )
    # a pair co-resident in several probed cells appears once per cell
    # with a bit-identical sim (same normalized vectors) — dedupe is
    # value-stable
    return (
        out.dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", F.round("sim_raw", 4).alias("sim"))
    )


def kmeans_assign(
    emb: DataFrame,
    k: int = 4,
    iterations: int = 3,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "min-id",
    tol: float | None = None,
    seed: int = 0,
    init_rounds: int = 3,
    oversample: float | None = None,
    phi_plateau: float | None = None,
) -> DataFrame:
    """Distributed fixed-iteration Lloyd k-means over the FULL corpus
    — the cluster-then-balance step of large-scale curation pipelines
    (SemDeDup clusters embeddings with exactly this before in-cluster
    dedup; domain-mixture balancing samples per cluster). The
    sample-trained spherical centroids above (`_train_spherical_
    centroids`) serve ANN cell layout; this is the full-data
    assignment+update iteration, oracle-replayable.

    Per iteration: assignment is MAP-ONLY (argmin over a broadcast
    centroid literal via JVM higher-order functions — no crossJoin,
    no shuffle of the corpus), and the update is ONE groupBy(k)
    aggregation whose per-dimension partial avgs combine map-side —
    at 100 TB each iteration shuffles k×dim doubles per partition,
    nothing else. Centroids (k×dim, a few KB) collect to the driver
    and re-broadcast per round — the documented bounded collect this
    module already uses for IVF.

    Determinism device (oracle-replayable): initial centroids are the
    k vectors with the smallest ids, quantized HALF_UP to 8 decimals
    (the rounding mode BOTH Spark's F.round and DuckDB's round use —
    Python's built-in round is half-even and would diverge on exact
    8dp ties, third review pass), and every updated centroid
    coordinate rounds to 8 decimals before the next assignment.
    Within-round arithmetic is identical doubles in identical element
    order on both engines; the per-dimension MEAN is the one place
    engine-side partial-sum order can differ by ulps, which the 8dp
    rounding absorbs unless the true mean sits within ~1 ulp of a
    rounding boundary — astronomically unlikely per coordinate and
    verified green on all three test corpora, but the contract is
    probabilistic at that boundary, not unconditional.

    PRODUCTION variants (VERDICT r10 #3 — pytest-pinned against a
    seed-deterministic numpy replay, no fixed-round oracle):
    ``init="kmeans++"`` seeds by D²-weighted sampling without
    replacement — the Efraimidis–Spirakis device the sampling staples
    already use, with ``u_r(id)`` a deterministic md5 uniform keyed by
    ``(seed, round, id)`` — fresh per selection round, as E–S sampling
    with round-varying D² weights requires — so the "random" init
    replays exactly. Each of the k−1
    selection rounds is one MAP-ONLY D² scan against the broadcast
    chosen-so-far literal plus a single-row ``max_by`` aggregation —
    k passes total, the classic k-means++ cost, no corpus shuffle.
    ``tol=<eps>`` switches fixed-round Lloyd to convergence-stop:
    iterate until the max |Δcentroid coordinate| (on the 8dp-rounded
    centroids) is ≤ tol, capped at ``iterations`` rounds.

    Dim posture: the update is a wide agg (``dim`` avg columns), the
    RIGHT distributed plan — partials combine map-side so each round
    shuffles k×dim doubles per partition, vs posexplode's n×dim-row
    shuffle. Above spark.sql.codegen.maxFields (default 100) the agg
    leaves whole-stage codegen for the interpreted-but-still-hash
    path — measured fine at dim=256 (pytest pins correctness there);
    at dim≳4k, project the embedding down first (q96's JL transform
    is the curation-pipeline device for exactly that)."""
    def _best_struct(cents: list[list[float]]):
        """struct(d, cluster) of the nearest centroid — a MAP-ONLY
        column over the broadcast centroid literal, shared by the
        Lloyd assignment and the kmeans++ D² scan."""
        cent_lit = _centroid_literal(cents)
        # slice to dim so a longer embedding clusters on its first
        # dim coordinates (matching the init truncation above) rather
        # than zip_with null-padding the shorter centroid
        vec_d = F.transform(
            F.slice(F.col(vec_col), 1, dim), lambda x: x.cast("double")
        )
        dists = F.transform(
            cent_lit,
            lambda c, j: F.struct(
                F.aggregate(
                    F.zip_with(vec_d, c, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("d"),
                j.alias("cluster"),
            ),
        )
        return F.array_min(dists)

    def _assign(cents: list[list[float]]) -> DataFrame:
        return emb.select(
            F.col(id_col),
            F.col(vec_col),
            _best_struct(cents)["cluster"].alias("cluster"),
        )

    from decimal import ROUND_HALF_UP, Decimal

    def _half_up8(x: float) -> float:
        # F.round / DuckDB round are HALF_UP; Python round() is
        # half-even and diverges on exact 8dp ties (e.g. 2**-9)
        return float(
            Decimal(repr(float(x))).quantize(
                Decimal("1e-8"), rounding=ROUND_HALF_UP
            )
        )

    probe = emb.orderBy(id_col).limit(k).select(vec_col).collect()
    if len(probe) < k:
        raise ValueError(f"need at least {k} vectors, got {len(probe)}")
    for r in probe:
        # fail loudly up front (ADVICE r10): a dim larger than the
        # real embedding length used to surface as an opaque
        # TypeError (float(None)) from the null per-dimension avgs
        if r[0] is None or len(r[0]) < dim:
            got = 0 if r[0] is None else len(r[0])
            raise ValueError(
                f"kmeans_assign: {vec_col} has length {got} but dim={dim}; "
                "pass dim <= the embedding length"
            )
    # shared by the sampled inits (kmeans++ / kmeans||):
    # - _u(prefix, rnd): deterministic uniform in (0, 1] keyed by
    #   (prefix, seed, ROUND, id) — the md5 device every sampling
    #   staple here uses, no rand(), rerun- and replay-stable. The
    #   round index is part of the key (ADVICE r11): Efraimidis–
    #   Spirakis sampling draws a FRESH uniform per round; a fixed
    #   u(id) reused against round-varying D² weights systematically
    #   favors high-u rows every round, biasing seed quality.
    # - _tiebreak: u is a 32-bit md5 prefix, so exact collisions are
    #   rare but possible at corpus scale — ties go to the SMALLER id
    #   on both engines (struct ordering here, ORDER BY ..., vec_id
    #   in the DuckDB twins), matching numpy's first-max-index argmax.
    def _u(prefix: str, rnd: int) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"{prefix}:{seed}:{rnd}:"),
                            F.col(id_col).cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("double")
            + 1.0
        ) / 4294967296.0

    def _tiebreak(key):
        return F.struct(key.alias("k"), (-F.col(id_col)).alias("t"))

    vec_d = F.transform(
        F.slice(F.col(vec_col), 1, dim), lambda x: x.cast("double")
    )

    if init == "min-id":
        cents = [[_half_up8(x) for x in r[0][:dim]] for r in probe]
    elif init == "kmeans++":
        # first centroid: plain uniform sample = argmax u₀ (one 1-row agg)
        first = emb.select(
            F.max_by(vec_d, _tiebreak(_u("kmpp", 0))).alias("c")
        ).collect()[0]["c"]
        cents = [[_half_up8(x) for x in first]]
        while len(cents) < k:
            # D²-weighted sample without replacement: Efraimidis–
            # Spirakis key log(u_r)/D² maximized — one map-only scan +
            # one 1-row agg per round with a fresh per-round uniform;
            # D²=0 rows (exact duplicates of a chosen centroid) carry
            # zero weight and are excluded
            d2 = _best_struct(cents)["d"]
            cand = (
                emb.where(d2 > 0)
                .select(
                    F.max_by(
                        vec_d, _tiebreak(F.log(_u("kmpp", len(cents))) / d2)
                    ).alias("c")
                )
                .collect()
            )
            if not cand or cand[0]["c"] is None:
                raise ValueError(
                    f"kmeans_assign: fewer than k={k} distinct vectors "
                    "in the corpus — cannot seed kmeans++"
                )
            cents.append([_half_up8(x) for x in cand[0]["c"]])
    elif init == "kmeans||":
        # Bahmani et al. 2012, "Scalable k-means++": the sequential
        # kmeans++ chain above is k FULL corpus scans — at 100 TB with
        # k in the hundreds the init dominates. k-means|| oversamples
        # ~ℓ candidates per round for only ``init_rounds`` (≈O(log n))
        # passes, maintaining the paper's RUNNING COST ARRAY as an
        # incrementally-updated (best_d2, best_ord) column so each
        # pass evaluates only that round's NEW candidates — total
        # distance work is one (row × candidate) evaluation, not a
        # rescan of the growing set. Per round: a 1-row φ agg + a
        # bounded collect of the independently-selected points
        # (P[select x] = min(1, ℓ·D²(x)/φ), decided by the fresh
        # per-round md5 uniform, so the draw replays exactly). The
        # final running argmin IS the Voronoi weight assignment (one
        # groupBy(|C|) agg, no extra pass); the finish is WEIGHTED
        # kmeans++ on the ~ℓ·R+1 candidates DRIVER-SIDE (Efraimidis–
        # Spirakis with weight w·D², pure python over a bounded list —
        # the paper's "recluster the candidates" step).
        import hashlib
        import math

        l = float(oversample if oversample is not None else 2 * k)
        r0 = emb.select(
            F.max_by(
                F.struct(F.col(id_col).alias("i"), vec_d.alias("v")),
                _tiebreak(_u("kmll", 0)),
            ).alias("c")
        ).collect()[0]["c"]
        cands: list[tuple[int, list[float]]] = [
            (int(r0["i"]), [_half_up8(x) for x in r0["v"]])
        ]

        # Incremental cost column (the paper's running cost array):
        # (_best.d, _best.ord) = distance/index of the nearest
        # candidate SO FAR, updated each round against ONLY that
        # round's new candidates — total distance flops are one
        # evaluation per (row, candidate) instead of re-scanning the
        # whole growing literal every round (measured 1.6× at k=16
        # and the difference grows with ℓ·R). Struct least() keeps
        # the EXISTING entry on exact-distance ties (older ord is
        # smaller), matching the batch argmin's first-index rule.
        def _new_best(cs: list[list[float]], offset: int) -> F.Column:
            cent_lit = _centroid_literal(cs)
            dists = F.transform(
                cent_lit,
                lambda c, j: F.struct(
                    F.aggregate(
                        F.zip_with(
                            F.col("_v"), c, lambda x, y: (x - y) * (x - y)
                        ),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    ).alias("d"),
                    (j + F.lit(offset)).alias("ord"),
                ),
            )
            return F.array_min(dists)

        state = emb.select(
            F.col(id_col), vec_d.alias("_v")
        ).withColumn(
            "_best", _new_best([cands[0][1]], 0)
        ).localCheckpoint(eager=False)  # lazy: folds into the round-1 phi agg (one fewer job/round)
        prev_phi: float | None = None
        for r in range(1, init_rounds + 1):
            d2 = F.col("_best")["d"]
            phi = state.select(F.sum(d2).alias("s")).collect()[0]["s"]
            if not phi or phi <= 0:
                break  # every point coincides with a candidate
            # φ-plateau early stop (opt-in, round 13): Bahmani et
            # al.'s rounds ≈ O(log φ) is an upper bound — once a
            # round shrinks the potential by less than the plateau
            # factor, further oversampling buys ~nothing; stop and
            # keep the candidates gathered so far. Off by default:
            # q185's DuckDB twin replays FIXED rounds.
            if (
                phi_plateau is not None
                and prev_phi is not None
                and phi > phi_plateau * prev_phi
            ):
                break
            prev_phi = float(phi)
            sel = (
                state.where(
                    (d2 > 0)
                    & (
                        _u("kmll", r)
                        < F.least(F.lit(1.0), F.lit(l) * d2 / F.lit(float(phi)))
                    )
                )
                .select(F.col(id_col).alias("i"), F.col("_v").alias("v"))
                .orderBy("i")
                .collect()  # bounded: E[rows] = min(ℓ, n) per round
            )
            if not sel:
                continue
            offset = len(cands)
            new = [
                (int(row["i"]), [_half_up8(x) for x in row["v"]])
                for row in sel
            ]
            cands.extend(new)
            state = state.withColumn(
                "_best",
                F.least(
                    F.col("_best"), _new_best([v for _, v in new], offset)
                ),
            ).localCheckpoint(eager=False)  # lazy: folds into the next phi agg
        # Voronoi weights: the running argmin IS the assignment — one
        # tiny groupBy(|C|), no extra corpus pass
        word = {
            int(r["ord"]): int(r["count"])
            for r in state.select(F.col("_best")["ord"].alias("ord"))
            .groupBy("ord")
            .count()
            .collect()  # bounded: ≤ |candidates| rows
        }

        def _uw(j: int, i: int) -> float:
            return (
                int(
                    hashlib.md5(
                        f"kmllw:{seed}:{j}:{i}".encode()
                    ).hexdigest()[:8],
                    16,
                )
                + 1
            ) / 4294967296.0

        avail = [
            (i, v, word.get(o, 0)) for o, (i, v) in enumerate(cands)
        ]
        eligible = [(i, v, w) for i, v, w in avail if w > 0]
        if len(eligible) < k:
            raise ValueError(
                f"kmeans_assign: k-means|| produced {len(eligible)} "
                f"weighted candidates < k={k} — raise oversample/"
                "init_rounds"
            )
        first_i, first_v, _ = max(
            eligible, key=lambda c: (math.log(_uw(0, c[0])) / c[2], -c[0])
        )
        cents = [first_v]
        chosen_ids = {first_i}
        while len(cents) < k:
            j = len(cents)

            def _d2c(v: list[float]) -> float:
                return min(
                    sum((a - b) * (a - b) for a, b in zip(v, c))
                    for c in cents
                )

            pick = max(
                (
                    (math.log(_uw(j, i)) / (w * d), -i, v)
                    for i, v, w in eligible
                    if i not in chosen_ids and (d := _d2c(v)) > 0
                ),
                default=None,
            )
            if pick is None:
                raise ValueError(
                    f"kmeans_assign: fewer than k={k} distinct weighted "
                    "candidates — cannot seed k-means||"
                )
            cents.append(pick[2])
            chosen_ids.add(-pick[1])
    else:
        raise ValueError(
            f"unknown init {init!r}: use 'min-id', 'kmeans++' or 'kmeans||'"
        )
    for _ in range(iterations):
        assigned = _assign(cents)
        # NARROW update plan (round 14): the old dim-wide agg (64
        # round(avg(element_at..)) columns) cost ~0.8s of DRIVER-side
        # Catalyst analysis per iteration — measured as inter-job
        # gaps, 2.5× the executor time of the whole probe. posexplode
        # to (cluster, dim_index, value) keeps the plan 3 columns at
        # ANY dim; the k×dim result pivots driver-side. Same
        # arithmetic (avg over the same upcast doubles, HALF_UP 8dp),
        # same shuffle volume (k×dim partial avgs combine map-side).
        agg = (
            assigned.select(
                "cluster",
                F.posexplode(F.slice(F.col(vec_col), 1, dim)).alias(
                    "_i", "_x"
                ),
            )
            .groupBy("cluster", "_i")
            .agg(F.round(F.avg(F.col("_x").cast("double")), 8).alias("c"))
            .collect()  # bounded: k*dim rows
        )
        new: dict[int, list[float]] = {}
        for r in agg:
            new.setdefault(int(r["cluster"]), [0.0] * dim)[int(r["_i"])] = (
                float(r["c"])
            )
        # an empty cluster keeps its previous centroid (mirrored by
        # the oracle's LEFT JOIN + COALESCE)
        prev = cents
        cents = [new.get(j, cents[j]) for j in range(k)]
        if tol is not None and all(
            abs(a - b) <= tol for ca, cb in zip(cents, prev) for a, b in zip(ca, cb)
        ):
            break  # converged: centroids moved ≤ tol in every coordinate
    return _assign(cents).select(id_col, "cluster")


def cluster_threshold_sample(
    assigned: DataFrame,
    n_per_cluster: int,
    id_col: str = "vec_id",
    cluster_col: str = "cluster",
    salt: str = "cb:",
    grid: int = 2000,
    accuracy: int = 10000,
) -> DataFrame:
    """Cluster-balanced sampling, the 100 TB form: keep ~N rows per
    cluster via a MAP-ONLY filter against each cluster's approximate
    Nth-smallest rank key — no per-cluster window, no sort of the
    corpus (the exact-window form in pipeline_queries.q177
    concentrates the whole corpus onto k sort partitions; with k=4
    that is a skew hazard at scale, VERDICT r10 #1).

    Mechanics: the rank key is the same md5-deterministic device the
    split/cap staples use (``conv(substr(md5('cb:'||id),1,8),16,10)``
    — uniform, rerun-stable, no rand()). One tiny ``groupBy(cluster)``
    aggregation computes each cluster's size and a
    ``percentile_approx`` sketch of the key evaluated on a fixed
    ``grid`` of quantiles (the percentage argument must be foldable,
    so per-cluster p = N/|cluster| is realized by indexing the grid at
    ``round(p*grid)``); the k-row threshold table broadcast-joins back
    and ``key <= threshold`` filters in place. Survivor stability:
    for a FIXED threshold value the kept set is append-stable (a new
    row never displaces a survivor — it only lands above or below the
    threshold), unlike the exact window where a new row can push rank
    N out.

    Accuracy contract: |kept − min(N, n)| is bounded by the grid
    half-step (n/(2·grid) rows) plus the sketch's rank error
    (n/accuracy rows) plus key ties (negligible for md5 keys). With
    the defaults that is under ~n/1000 rows — the probe's tolerance.
    At corpus sizes where n/grid approaches N, size ``grid``/
    ``accuracy`` up (both are driver-side literals; the sketch cost
    is one mergeable aggregation either way) — the operator is a
    sketch-threshold device, not an exact top-N."""
    rkey = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    keyed = assigned.withColumn("_rkey", rkey)
    pgrid = [i / grid for i in range(grid + 1)]
    idx = F.round(F.col("n_target") / F.col("n_total") * grid).cast("int")
    thr = (
        keyed.groupBy(cluster_col)
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.percentile_approx("_rkey", pgrid, accuracy).alias("_percs"),
        )
        .select(
            cluster_col,
            "n_total",
            F.least(
                F.lit(n_per_cluster).cast("long"), F.col("n_total")
            ).alias("n_target"),
            "_percs",
        )
        .select(
            cluster_col,
            "n_total",
            "n_target",
            F.element_at(
                "_percs", F.greatest(F.lit(1), F.least(idx, F.lit(grid))) + 1
            ).alias("_thr"),
        )
    )
    return keyed.join(F.broadcast(thr), cluster_col).select(
        id_col,
        cluster_col,
        "n_total",
        "n_target",
        (F.col("_rkey") <= F.col("_thr")).alias("kept"),
    )
