"""Driver-contract queries for the LLM-pipeline operators (C1-C5).

Oracle-able probes get DuckDB SQL twins. Operators built on xxhash64
(MinHash, SimHash, hyperplane LSH, IVF, PQ) cannot be value-matched
in DuckDB (different hash function), so their probes emit a
TOLERANCE CONTRACT the driver CAN hash-match: the approximate and
exact paths run in ONE Spark plan and the output carries (a) rows
whose values ARE deterministic and DuckDB-computable (exact pair
sets, per-query exact-neighbor counts) and (b) boolean columns
asserting the approximate path met its recall/equality bound — the
oracle emits the same rows with TRUE. Candidate sets stay
collision-dependent; the contract is what the driver checks, and the
pytest pins (tests/test_pipeline.py) still assert the stronger
set-level properties at small SF. Bounds are set from measured
recall at sf0.01 AND sf0.1 with margin (see each probe). q84 — the
registry's last rows-only probe through r4 — now carries the same
contract shape (exact pair rows + batch-parity/recall booleans), so
every registered probe is driver-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biodwh2_arcadedb_server_spark.operators import dedup, multimodal, similarity, text
from biodwh2_arcadedb_server_spark.sources.registry import load_table

JACCARD_K = 3
JACCARD_THRESHOLD = 0.8
COSINE_THRESHOLD = 0.4

# --- per-session derived-table cache (VERDICT r5 #7) --------------------------
# The near-dup probe family (q26/q27/q84/q100/q104) shares two
# expensive derived tables: the 64-bit shingle table and the exact
# Jaccard pair set. Each was being recomputed per probe — q84 was
# double-paying q26's whole exact leg inside its parity contract.
# Cache them as lazily-materialized localCheckpoints keyed by
# (applicationId, sf_dir): the first probe in a session pays, the
# rest reuse the checkpointed partitions; a bench session restart
# changes the applicationId and naturally invalidates. Correctness is
# untouched — the checkpoint holds exactly the DataFrame the probe
# would have built.
_SESSION_CACHE: dict = {}


def _cached_ckpt(spark: SparkSession, key: tuple, builder) -> DataFrame:
    full = (spark.sparkContext.applicationId, *key)
    df = _SESSION_CACHE.get(full)
    if df is None:
        df = builder().localCheckpoint(eager=False)
        _SESSION_CACHE[full] = df
    return df


def _shingles64(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cached_ckpt(
        spark,
        ("sh64", sf_dir, JACCARD_K),
        lambda: dedup.shingle_table(
            load_table(spark, sf_dir, "documents"), "doc_id", "text", JACCARD_K, 64
        ),
    )


def _exact_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cached_ckpt(
        spark,
        ("exact_pairs", sf_dir, JACCARD_K, JACCARD_THRESHOLD),
        lambda: dedup.ngram_jaccard_pairs(
            load_table(spark, sf_dir, "documents"),
            "doc_id",
            "text",
            JACCARD_K,
            JACCARD_THRESHOLD,
            shingles=_shingles64(spark, sf_dir),
        ).select("id_a", "id_b", "jaccard"),
    )


def _cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked-matmul cosine pair set, cached like the lexical tables
    (q29 and q106 both consume it — one computation per session)."""
    return _cached_ckpt(
        spark,
        ("cosine_pairs", sf_dir, COSINE_THRESHOLD),
        lambda: similarity.cosine_near_dup_pairs(
            load_table(spark, sf_dir, "embeddings"), COSINE_THRESHOLD
        ),
    )


def _doc_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components closure over the exact lexical pair set,
    session-cached (optimization r14): q100 and q104 run the IDENTICAL
    closure — the iterative CC loop is the family's dominant
    driver-side cost (per-round checkpoint + convergence jobs), so it
    joins the shingle/pair tables in the shared derived-table cache.
    Deterministic, so sharing cannot change any consumer's rows."""
    return _cached_ckpt(
        spark,
        ("doc_clusters", sf_dir, JACCARD_K, JACCARD_THRESHOLD),
        lambda: dedup.near_dup_clusters(
            load_table(spark, sf_dir, "documents"),
            "doc_id", "text", JACCARD_K, JACCARD_THRESHOLD,
            pairs=_exact_pairs(spark, sf_dir),
        ),
    )


def _cosine_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CC closure over the exact cosine pair set, session-cached:
    q106 and q156's exact leg run the identical closure (same
    rationale as :func:`_doc_neardup_clusters`)."""
    return _cached_ckpt(
        spark,
        ("cosine_clusters", sf_dir, COSINE_THRESHOLD),
        lambda: dedup.near_dup_clusters(
            load_table(spark, sf_dir, "embeddings"),
            "vec_id", "embedding",
            pairs=_cosine_pairs(spark, sf_dir).select("id_a", "id_b"),
        ),
    )


# --- C2: exact n-gram Jaccard near-dup pairs (oracle-able) --------------------
def q26_neardup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _exact_pairs(spark, sf_dir)


# --- C2: MinHash+LSH near-dups (tolerance-contract oracle) ---------------------
def q27_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32 hashes / 8 bands × 4 rows: half the signature compute and
    banding fan-out of the classic 64/16/4 at near-identical recall in
    the verified regime — candidates are re-checked with true Jaccard,
    so banding only risks misses, P(miss) = (1-j^4)^8 ≈ 5e-12 at the
    planted j≈0.99 (pinned vs exact by tests/test_pipeline.py).
    32-bit gram hashes halve the verification join's shuffle width
    (the approximate path tolerates ~1e-5 collision noise; the exact
    q26 reference stays on 64-bit).

    Contract: the exact pair set (deterministic, DuckDB-computable)
    with two aggregate booleans — MinHash recall over those pairs
    >= 0.95 (measured 1.0 at sf0.01 and sf0.1; the weakest pair at
    sf0.1 is j=0.8 with a 1.5% per-pair banding miss chance, so the
    bound tolerates a couple of misses) and zero LSH pairs outside
    the exact set (a false positive needs a 32-bit collision landing
    exact-j within 1e-5 of the threshold)."""
    d = load_table(spark, sf_dir, "documents")
    # ONE shingle stage feeds both legs (VERDICT r4 #7), and BOTH
    # derived tables come from the session cache shared with
    # q26/q84/q100/q104 (VERDICT r5 #7): the exact leg reads the
    # checkpointed 64-bit table, the approximate leg its map-only
    # 32-bit narrowing — bit-identical to an independent hash_bits=32
    # build.
    sh64 = _shingles64(spark, sf_dir)
    exact = _exact_pairs(spark, sf_dir)
    approx = dedup.minhash_near_dups(
        d, "doc_id", "text", k=JACCARD_K, num_hashes=32, bands=8, rows=4,
        threshold=JACCARD_THRESHOLD, hash_bits=32,
        shingles=dedup.narrow_shingles(sh64),
    ).select("id_a", "id_b")
    hits = exact.join(approx, ["id_a", "id_b"], "left_semi")
    extras = approx.join(exact, ["id_a", "id_b"], "left_anti")
    flags = (
        hits.agg(F.count("*").alias("_nh"))
        .crossJoin(exact.agg(F.count("*").alias("_nt")))
        .crossJoin(extras.agg(F.count("*").alias("_nx")))
        .select(
            (F.col("_nh") / F.greatest("_nt", F.lit(1)) >= 0.95).alias("recall_ok"),
            (F.col("_nx") == 0).alias("no_false_pos"),
        )
    )
    return exact.crossJoin(F.broadcast(flags))


# --- C2: end-to-end fuzzy dedup — pair graph → clusters → canonical keep (oracle-able)
def q100_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup *decision*: exact Jaccard pairs grouped into
    clusters by connected components (near-dup is not transitive —
    chains merge), one canonical survivor (min doc_id) per cluster.
    Oracle: recursive-CTE transitive closure over the same pair set."""
    return _doc_neardup_clusters(spark, sf_dir)


# --- C2 + split composition: leakage-safe grouped split (oracle-able) ---------------
def q104_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/valid/test split assigned per NEAR-DUP CLUSTER, not per
    document: hashing doc_id (q70) puts two near-identical documents
    on opposite sides of the split — silent eval contamination. Here
    the md5 bucket hashes the cluster's canonical id, so every member
    of a near-dup cluster lands in the same fold. Same pure-function
    contract as q70 (no rand(), reproducible, append-stable)."""
    clusters = _doc_neardup_clusters(spark, sf_dir)
    bucket = (
        F.conv(F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    )
    return clusters.select(
        "doc_id",
        "cluster_id",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "valid")
        .otherwise("test")
        .alias("split"),
    )


# --- C2 × C7: streaming MinHash near-dup candidates (tolerance-contract oracle) ---
def q84_stream_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the documents stream through the stateful band-bucket
    store (streaming/neardup.py), then emit the driver-checkable
    CONTRACT (the r4 ANN pattern, closing the registry's last
    rows-only hole): rows are the exact n-gram-Jaccard pair set
    (deterministic, DuckDB-computable — q26's truth) and two
    aggregate booleans the oracle asserts TRUE —

    - ``batch_parity``: the streamed candidate set is EXACTLY the
      batch LSH join's candidate set at the same (k=3, 32 hashes,
      8×4 banding) parameters — the tests/test_streaming_neardup.py
      pin, now driver-visible (state carried across micro-batches
      loses and invents nothing);
    - ``recall_ok``: streamed candidates cover >= 0.95 of the exact
      pairs (measured 1.0 at sf0.01 and sf0.1 — candidates are the
      pre-verification superset, so recall here is >= q27's verified
      recall, same P(miss) ≈ (1-j^4)^8 analysis).
    """
    import tempfile

    from biodwh2_arcadedb_server_spark.streaming import state_partitions
    from biodwh2_arcadedb_server_spark.streaming.neardup import (
        read_documents_stream,
        streaming_minhash_candidates,
    )

    # Drain tuning, pair-identical at every setting (measured sf0.1:
    # 64 cells/16 parts 7.1s -> 16 cells/4 parts + spread 32 ~4.8s
    # -> 2.1s once the signature stage went Arrow-kernel +
    # filter-free, see dedup.minhash_signatures_from_shingles):
    # 16 coarse cells + 4 state partitions match THIS drain's state
    # volume (~200k ids) — the Python-call count per micro-batch is
    # min(occupied buckets, bands×cells) and each state partition
    # must carry meaningful volume (see streaming.__init__ sizing
    # note); spread=32 parallelizes the signature stage that a
    # one-file test stream would otherwise run on one core. Cell
    # count does not affect WHICH pairs are emitted — exact
    # bucket-hash matching lives in the in-state map — only the call
    # granularity; at production state volumes scale cells/partitions
    # back up (docstring sizing rule). State store: HDFS-backed wins
    # at THIS volume (RocksDB 6.7s vs 5.4s pre-kernel), but the 10x-
    # state re-measure (bench/q84_experiments.py at /tmp/sfconv_x10,
    # ROADMAP r6-b) shows the crossover: rocksdb_64c_8p 5.6s beats
    # every HDFS variant (best 6.4s) and the un-scaled sf0.1 winner
    # degrades to 10.4s — both halves of the sizing rule, measured
    # (bench/sf1.json q84_state_store_x10).
    with state_partitions(spark, 4):
        stream = read_documents_stream(spark, sf_dir)
        out = streaming_minhash_candidates(
            stream, k=JACCARD_K, num_hashes=32, bands=8, rows=4,
            coarse_buckets=16, spread=32,
        )
        import os as _os

        ckpt_base = "/dev/shm" if _os.path.isdir("/dev/shm") else None
        q = (
            out.writeStream.format("memory")
            .queryName("q84_pairs")
            .outputMode("append")
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix="q84_ckpt_", dir=ckpt_base),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    stream_pairs = (
        spark.table("q84_pairs").select("id_a", "id_b").dropDuplicates()
    )

    # The shingle table and exact pair set come from the session
    # cache shared with q26/q27 (VERDICT r5 #7) — the contract no
    # longer double-pays the exact leg q26 already computes; in a
    # fresh session the first caller builds them once.
    sh = _shingles64(spark, sf_dir)
    exact = _exact_pairs(spark, sf_dir)
    sigs = dedup.minhash_signatures_from_shingles(sh, 32)
    batch_pairs = dedup.lsh_candidate_pairs(sigs, bands=8, rows=4)
    only_stream = stream_pairs.join(batch_pairs, ["id_a", "id_b"], "left_anti")
    only_batch = batch_pairs.join(stream_pairs, ["id_a", "id_b"], "left_anti")
    hits = exact.join(stream_pairs, ["id_a", "id_b"], "left_semi")
    flags = (
        only_stream.agg(F.count("*").alias("_os"))
        .crossJoin(only_batch.agg(F.count("*").alias("_ob")))
        .crossJoin(hits.agg(F.count("*").alias("_nh")))
        .crossJoin(exact.agg(F.count("*").alias("_nt")))
        .select(
            ((F.col("_os") == 0) & (F.col("_ob") == 0)).alias("batch_parity"),
            (F.col("_nh") / F.greatest("_nt", F.lit(1)) >= 0.95).alias("recall_ok"),
        )
    )
    return exact.crossJoin(F.broadcast(flags))


# --- C7: custom stateful session windows, drained end-to-end (oracled) -----------
SESSION_GAP_MS = 4 * 3600 * 1000  # 4 hours


def q90_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the chunked events stream through the custom
    applyInPandasWithState sessionizer (streaming/stateful.py) to
    completion; the far-future sentinel advances the watermark past
    every real session so the emitted append-mode output equals the
    batch gaps-and-islands sessionization — the oracle certifies
    exactly-once final-session emission across micro-batch boundaries,
    not just plan shape."""
    from biodwh2_arcadedb_server_spark.streaming.stateful import run_finite_sessionize

    # 1 data chunk + per-cell punctuation file = exactly 2 triggers,
    # the minimum that still carries state across a micro-batch
    # boundary (the exactly-once contract under test: every session
    # opens in batch 0 and drains in batch 1). eos_flush removes the
    # watermark's one-batch lag and the trailing no-data batch —
    # both modes emit the identical session set (pinned by
    # tests/test_stateful_streaming.py). 16 cells / 4 state
    # partitions fit this drain's 1500-user state volume (the q84
    # sizing rule); measured sf0.1: r5's 2-chunk event-time drain
    # 4.1-5.2s -> 2.4-3.0s here, output byte-identical.
    out = run_finite_sessionize(
        spark, sf_dir, SESSION_GAP_MS, n_chunks=1, name="q90_sessions",
        state_parts=4, n_cells=16, eos_flush=True,
    )
    return out.select(
        "user_id",
        "session_start",
        "session_end",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
    )


# --- C2: SimHash near-dups (tolerance-contract oracle) ---------------------------
def q28_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pigeonhole block-LSH (production path: equi-join on fingerprint
    blocks, one shuffle) audited in-plan against the quadratic exact
    Hamming join. Pigeonhole recall is a GUARANTEE, not an estimate,
    so the contract is strict set equality — the only non-oracle-able
    part (xxhash64 fingerprints) cancels out because both sides hash
    identically. The quadratic reference is the audit harness, not
    the production path: at driver SFs it is 12.5M bit_count pairs;
    at 100 TB only the blocked path runs (pytest pins equality at
    small SF). Output: per-language document counts (deterministic,
    DuckDB-computable) + the equality boolean."""
    d = load_table(spark, sf_dir, "documents")
    fps = dedup.simhash(d, "doc_id", "text").localCheckpoint(eager=False)
    # One full-outer join replaces the two anti-joins: the quadratic
    # exact reference and the blocked path are each referenced (and
    # therefore computed and Catalyst-analyzed) ONCE instead of twice;
    # missed = exact rows with no blocked partner, extra = the reverse.
    # Both pair sets are unique on (id_a, id_b), so the join is 1:1 and
    # the null-partner counts equal the old anti-join counts exactly.
    exact = dedup.simhash_near_dups(fps, max_hamming=3).select(
        "id_a", "id_b", F.lit(1).alias("_e")
    )
    blocked = dedup.simhash_near_dups_blocked(fps, max_hamming=3).select(
        "id_a", "id_b", F.lit(1).alias("_b")
    )
    flag = (
        exact.join(blocked, ["id_a", "id_b"], "full_outer")
        .agg(
            F.coalesce(F.sum(F.when(F.col("_b").isNull(), 1).otherwise(0)), F.lit(0)).alias("_nm"),
            F.coalesce(F.sum(F.when(F.col("_e").isNull(), 1).otherwise(0)), F.lit(0)).alias("_nx"),
        )
        .select(((F.col("_nm") == 0) & (F.col("_nx") == 0)).alias("blocked_matches_exact"))
    )
    per_lang = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    return per_lang.crossJoin(F.broadcast(flag))


# --- C2/C3: embedding-cosine near-dup pairs (oracle-able) -------------------------
def q29_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cosine_pairs(spark, sf_dir)


# --- C2/C3: embedding-cosine clusters + canonical keep (oracle-able) ----------------
def q106_cosine_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup end-to-end: blocked-matmul cosine pairs closed
    under connected components, one canonical vector per cluster —
    the embedding-space twin of q100's lexical closure (SemDeDup
    shape). The closure reuses near_dup_clusters with the cosine pair
    set plugged in."""
    return _cosine_neardup_clusters(spark, sf_dir)


# --- C3 end-to-end: retrieval + metadata fetch (RAG shape, oracle-able) -------------
def q128_rag_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-augmentation join: top-5 cosine neighbors per query
    vector, then fetch the retrieved documents' metadata + token
    count. The scale contract is in the JOIN DIRECTION: the shortlist
    (queries × k rows) is broadcast into the corpus scan — the 100 TB
    documents table is probed in place, never shuffled, for a
    retrieval working set that is tiny by construction."""
    from biodwh2_arcadedb_server_spark.functions import tokens

    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents")
    queries = e.where(F.col("vec_id").isin(0, 1, 2))
    hits = similarity.knn_join(e, queries, k=5)
    docs = d.select(
        F.col("doc_id").alias("neighbor_id"),
        "source",
        "lang",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
    )
    return F.broadcast(hits).join(docs, "neighbor_id").select(
        "query_id", "rank", "neighbor_id", "sim", "source", "lang", "n_tokens"
    )


# --- C3: exact k-NN for a query set (oracle-able) ----------------------------------
def q30_knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id").isin(0, 1, 2))
    return similarity.knn_join(e, queries, k=3)


ANN_K = 3
ANN_N_QUERIES = 10  # vec_id < 10: 30 exact pairs — enough to damp
# single-query recall variance (per-query recall on near-random
# synthetic embeddings legitimately hits 0/3 for one query)


def _exact_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force k-NN contract twin, session-cached
    (optimization r14): q31/q77/q116 each score their ANN variant
    against the IDENTICAL deterministic knn_join over the same
    queries — one |queries|x|corpus| scan per session instead of
    three, same derived-table-cache posture as _cosine_pairs."""
    return _cached_ckpt(
        spark,
        ("exact_knn", sf_dir, ANN_N_QUERIES, ANN_K),
        lambda: similarity.knn_join(
            load_table(spark, sf_dir, "embeddings"),
            load_table(spark, sf_dir, "embeddings").where(
                F.col("vec_id") < ANN_N_QUERIES
            ),
            k=ANN_K,
        ),
    )


def _ann_recall_contract(
    exact: DataFrame, approx: DataFrame, bound: float
) -> DataFrame:
    """Tolerance contract for approximate k-NN: one row per query
    with its exact-neighbor count (deterministic, DuckDB-computable)
    and an aggregate boolean asserting recall over ALL queries >=
    bound. Exact and approximate run in the same plan; the 1-row
    flag broadcasts onto the per-query rows."""
    ex = exact.select("query_id", "neighbor_id").localCheckpoint(eager=False)
    ap = approx.select("query_id", "neighbor_id")
    hits = ex.join(ap, ["query_id", "neighbor_id"], "left_semi")
    flag = (
        hits.agg(F.count("*").alias("_nh"))
        .crossJoin(ex.agg(F.count("*").alias("_nt")))
        .select(
            (F.col("_nh") / F.greatest("_nt", F.lit(1)) >= bound).alias("recall_ok")
        )
    )
    per_query = ex.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    return per_query.crossJoin(F.broadcast(flag))


# --- C3: LSH-bucketed ANN (tolerance-contract oracle) --------------------------------
def q31_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN vs brute force, recall >= 0.4 over 10
    queries (measured 0.53 sf0.01 / 0.87 sf0.1 — near-random
    synthetic embeddings are LSH's worst case; pytest gates 0.5 at
    sf0.001 with 10 queries x k=5)."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < ANN_N_QUERIES)
    exact = _exact_knn(spark, sf_dir)
    approx = similarity.ann_topk(e, queries, k=ANN_K, dim=64, n_planes=4, n_tables=8)
    return _ann_recall_contract(exact, approx, bound=0.4)


# --- C3: IVF (KMeans inverted-file) ANN (tolerance-contract oracle) ------------------
def q77_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (spherical-KMeans cells, probe 4 of 8) vs brute force,
    recall >= 0.6 over 10 queries (measured 0.77 sf0.01 / 0.83
    sf0.1). The data-adaptive counterpart to q31's hyperplane LSH."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < ANN_N_QUERIES)
    exact = _exact_knn(spark, sf_dir)
    approx = similarity.ivf_topk(e, queries, k=ANN_K, n_clusters=8, n_probe=4)
    return _ann_recall_contract(exact, approx, bound=0.6)


# --- C3: product-quantization ANN (tolerance-contract oracle) ------------------------
def q116_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC ANN with exact re-rank (16×16 sub-quantizer codes, 16
    bytes/vector, asymmetric-distance shortlist, exact cosine on the
    refine·k survivors) vs brute force, recall >= 0.55 over 10
    queries (measured 0.77 sf0.01 / 0.70 sf0.1). m=16 because the
    synthetic embeddings are near-random (the PQ worst case — no
    cluster structure to absorb quantization error); real corpora run
    coarser m at equal recall."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < ANN_N_QUERIES)
    exact = _exact_knn(spark, sf_dir)
    approx = similarity.pq_topk(e, queries, k=ANN_K, m=16, n_codes=16, refine=8)
    return _ann_recall_contract(exact, approx, bound=0.55)


# --- C4: token stats (oracle-able) -----------------------------------------------------
def q32_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return text.token_stats(d).select("doc_id", "n_tokens", "avg_token_len")


# --- C4: quality scoring (oracle-able) ---------------------------------------------------
def q33_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return text.quality_score(d)


# --- C4: language ID (oracle-able: stopword-profile argmax) ----------------------------------
def q34_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return text.language_id(d)


# --- C4: document fingerprint (oracle-able via the md5_32 rolling hash) ----------------------
def q35_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5_32 here so DuckDB reproduces the fingerprint bit-for-bit;
    production default stays xxhash64 (text.fingerprint)."""
    d = load_table(spark, sf_dir, "documents")
    return text.fingerprint(d, hash_fn="md5_32")


# --- C5: multimodal metadata-only scan (oracle-able) -------------------------------------------
def q36_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return multimodal.metadata_only_scan(multimodal.to_media_table(d))


# --- C5: REAL image decode via mapInPandas (oracle-able) -----------------------------------------
def q37_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode_stub=False: the payload is a genuine P6 PPM and the
    operator PARSES it (magic + header + pixel extraction) before
    computing features over the decoded pixel bytes — the C5 decode
    seam closed for a self-describing format, with the oracle
    recomputing the expected pixel stats from the source text the
    encoder drew them from."""
    d = load_table(spark, sf_dir, "documents")
    return multimodal.extract_features(
        multimodal.to_media_table(d), decode_stub=False
    ).select(
        "doc_id", "n_bytes", F.round("byte_mean", 4).alias("byte_mean"),
        F.round("byte_entropy_proxy", 4).alias("byte_entropy_proxy"),
    )


def q172_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-codec decode through the C5 seam (VERDICT r8
    next #5): the corpus is re-encoded as genuine zlib-deflated PNGs
    (row filters cycle None/Sub/Up/Average/Paeth, so every unfilter
    path runs), then ``extract_features(decode_stub=False)`` walks the
    chunk stream (CRC-verified), inflates, unfilters, and computes the
    stats over the DECODED pixels. Pixels are byte-identical to q37's
    PPMs by construction, so the oracle recomputes them from the
    source text — byte-exact, no tolerance. Arrow-batched end to end;
    at 100 TB the decode parallelizes per batch with memory bounded by
    arrow.maxRecordsPerBatch, same as every media op here."""
    d = load_table(spark, sf_dir, "documents")
    return multimodal.extract_features(
        multimodal.to_png_table(d), decode_stub=False
    ).select(
        "doc_id", "n_bytes", F.round("byte_mean", 4).alias("byte_mean"),
        F.round("byte_entropy_proxy", 4).alias("byte_entropy_proxy"),
    )


def q173_png_palette_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Indexed-color (palette) PNG decode through the same C5 seam
    (VERDICT r9 next #6 — palette is the most common web PNG flavor):
    the corpus is re-encoded as color-type-3 PNGs (PLTE chunk, 1-byte
    index scanlines, filters cycling all five types over the 1-byte
    stride), then ``extract_features(decode_stub=False)`` CRC-walks,
    inflates, unfilters, and EXPANDS the indices through the palette.
    The expanded pixels are byte-identical to q172's truecolor PNGs
    and q37's PPMs by the shared codepoint %% 256 contract, so the
    oracle recomputes the stats from the source text — byte-exact."""
    d = load_table(spark, sf_dir, "documents")
    return multimodal.extract_features(
        multimodal.to_png_palette_table(d), decode_stub=False
    ).select(
        "doc_id", "n_bytes", F.round("byte_mean", 4).alias("byte_mean"),
        F.round("byte_entropy_proxy", 4).alias("byte_entropy_proxy"),
    )


def q174_png_adam7_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adam7-interlaced PNG decode through the C5 seam (round 10 —
    the last deterministic PNG variant): the corpus re-encodes as
    interlace-method-1 truecolor PNGs (seven independently-filtered
    sub-images, filters cycling within each pass), and
    ``extract_features(decode_stub=False)`` CRC-walks, inflates,
    unfilters each pass and SCATTERS the pixels back onto the raster.
    Deinterlaced pixels are byte-identical to q172/q173 by the shared
    codepoint %% 256 contract — same byte-exact oracle."""
    d = load_table(spark, sf_dir, "documents")
    return multimodal.extract_features(
        multimodal.to_png_adam7_table(d), decode_stub=False
    ).select(
        "doc_id", "n_bytes", F.round("byte_mean", 4).alias("byte_mean"),
        F.round("byte_entropy_proxy", 4).alias("byte_entropy_proxy"),
    )


def q194_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BASELINE JPEG decode through the C5 seam (round 14, VERDICT
    r13 #5 — the last lossy-codec hole, closed with the pure-python
    ``operators.jpeg`` T.81 codec): the corpus re-encodes as genuine
    baseline JPEGs (SOI/DQT/SOF0/DHT/SOS, Annex-K Huffman tables,
    byte stuffing), and ``extract_features(decode_stub=False)`` runs
    the full entropy-decode → dequant → IDCT chain. The fixture is
    the DC-EXACT construction (flat 8×8 blocks at codepoint % 256,
    all-8 quant table — see ``to_jpeg_table``), so the decode is
    bit-exact despite the lossy format and the oracle recomputes the
    stats from the source text directly. 16×16 gray = 4 blocks/doc,
    exercising the DC prediction chain across blocks."""
    d = load_table(spark, sf_dir, "documents")
    return multimodal.extract_features(
        multimodal.to_jpeg_table(d), decode_stub=False
    ).select(
        "doc_id", "n_bytes", F.round("byte_mean", 4).alias("byte_mean"),
        F.round("byte_entropy_proxy", 4).alias("byte_entropy_proxy"),
    )


def q198_jpeg_progressive_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROGRESSIVE (SOF2) JPEG decode through the C5 seam (round 14,
    ROADMAP: the one JPEG profile left behind the NotImplementedError
    after the baseline codec landed). Same DC-exact fixture contract
    as q194, but the corpus re-encodes as genuine T.81 Annex-G
    streams — interleaved DC-first scan at Al=1, banded AC scans
    (1–5 / 6–63 spectral selection), an AC successive-approximation
    refinement scan, and a DC refinement scan, each with its own
    two-pass DHT — so ``extract_features(decode_stub=False)`` runs
    the full multi-scan coefficient-accumulation path (EOB runs,
    correction bits, point-transform undo) and still reproduces the
    pixels bit-exactly. The oracle recomputes the stats from the
    source text directly, identical in form to q194's."""
    d = load_table(spark, sf_dir, "documents")
    return multimodal.extract_features(
        multimodal.to_jpeg_table(d, progressive=True), decode_stub=False
    ).select(
        "doc_id", "n_bytes", F.round("byte_mean", 4).alias("byte_mean"),
        F.round("byte_entropy_proxy", 4).alias("byte_entropy_proxy"),
    )


def q199_mp4_container_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP4 CONTAINER walk through the C5 seam (round 14 — the 'MP4
    container' hole in VERDICT r13's missing list): each document
    re-encodes as a genuine one-track ISO-BMFF file (ftyp + chunked
    mdat + full moov/stbl chain) and ``multimodal.mp4_frames`` walks
    it for real — box tree, mvhd/tkhd/mdhd/stsd metadata, the general
    stsc×stco×stsz sample resolution (5 frames in 2+2+1 chunks, so
    the short trailing stsc run is hit per payload), mdat slicing.
    Frames are a ``raw `` visual entry whose samples ARE the pixel
    bytes (codepoint % 256 contract), so the per-frame stats are
    exact and the oracle replays them from the text; the H.264-class
    sample decode stays behind ``isobmff.decode_samples``'s
    NotImplementedError."""
    d = load_table(spark, sf_dir, "documents")
    return multimodal.mp4_frames(multimodal.to_mp4_table(d)).select(
        "doc_id", "frame_idx", "frame_bytes",
        F.round("frame_mean", 4).alias("frame_mean"),
    )


def q200_opus_container_packets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ogg/Opus CONTAINER walk through the C5 seam (round 14 — the
    'Opus container' hole in VERDICT r13's missing list): each
    document re-encodes as a valid Opus-in-Ogg stream (OpusHead +
    OpusTags + 3 audio packets of 150/300/150 bytes) built with
    2-segment pages, so the 300-byte middle packet ALWAYS spans a
    page boundary — ``multimodal.opus_packet_stats`` re-walks it for
    real: Ogg CRC verification (the unreflected 0x04C11DB7 table, not
    zlib's), lacing reassembly across the continuation flag, OpusHead
    channel/pre-skip/rate parse, duration from the last granule.
    Packet bytes are codepoint % 256 slices of the text, so the
    per-packet stats are exact and the oracle replays them; the Opus
    SILK/CELT decode stays behind ``ogg.decode``'s
    NotImplementedError."""
    d = load_table(spark, sf_dir, "documents")
    return multimodal.opus_packet_stats(multimodal.to_opus_table(d)).select(
        "doc_id", "packet_idx", "n_bytes",
        F.round("byte_mean", 4).alias("byte_mean"),
        "channels", "duration_samples",
    )


def q202_jpeg_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOSSY-codec frame fan-out (round 14, ROADMAP follow-on: wire
    the JPEG codec into ``sample_frames``): the corpus re-encodes as
    PROGRESSIVE JPEGs (the q198 fixture) and the frame sampler's real
    path decodes them — one output row per pixel ROW of the decoded
    16×16 grayscale image, so the 1→N fan-out runs on an actual lossy
    decode chain, not byte offsets. Under the DC-exact contract row r
    is two flat 8-px halves from text chars 2·(r÷8) and 2·(r÷8)+1,
    which is exactly what the oracle recomputes."""
    d = load_table(spark, sf_dir, "documents")
    return multimodal.sample_frames(
        multimodal.to_jpeg_table(d, progressive=True), decode_stub=False
    ).select(
        "doc_id", "frame_idx", "frame_bytes",
        F.round("frame_mean", 4).alias("frame_mean"),
    )


# --- C5: REAL frame decode fan-out (oracle-able) -------------------------------------------------
def q38_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode_stub=False: one frame per decoded pixel ROW with its
    true pixel mean — actual decoded content through the 1→N
    mapInPandas fan-out, not byte offsets."""
    d = load_table(spark, sf_dir, "documents")
    return multimodal.sample_frames(
        multimodal.to_media_table(d), decode_stub=False
    ).select(
        "doc_id", "frame_idx", "frame_bytes",
        F.round("frame_mean", 4).alias("frame_mean"),
    )


# --- C5: REAL WAV audio decode (oracle-able) -----------------------------------------------------
def q152_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genuine 16-bit mono PCM WAV payloads (stdlib wave encoder)
    parsed back through the RIFF container: sample rate + frame count
    from the header, RMS/peak from the decoded samples. The audio leg
    of the C5 seam, closed for uncompressed PCM; compressed codecs
    remain behind the documented NotImplementedError plug point."""
    d = load_table(spark, sf_dir, "documents")
    return multimodal.audio_features(multimodal.to_audio_table(d)).select(
        "doc_id", "sample_rate", "n_samples",
        F.round("rms", 4).alias("rms"), F.round("peak", 4).alias("peak"),
    )


# --- C1+C4 composition: end-to-end curation pipeline ---------------------------------
QUALITY_KEEP = 0.95


def q73_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical pre-training curation chain in one plan: quality
    filter (C4) → exact content dedup keeping the smallest id (C1,
    md5 so the oracle can reproduce it) → deterministic split
    assignment. One narrow scan feeds everything; the only shuffle is
    the dedup groupBy on a 16-byte content hash."""
    d = load_table(spark, sf_dir, "documents")
    good = (
        text.quality_score(d)
        .where(F.col("quality_score") >= QUALITY_KEEP)
        .select("doc_id")
    )
    kept = d.join(good, "doc_id").select("doc_id", "text")
    rep = kept.groupBy(F.md5("text").alias("_h")).agg(F.min("doc_id").alias("doc_id"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    )
    return rep.select(
        "doc_id",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "valid")
        .otherwise("test")
        .alias("split"),
    )


QUERIES = {
    "q73_curation_pipeline": q73_curation_pipeline,
    "q26_neardup_jaccard": q26_neardup_jaccard,
    "q100_neardup_clusters": q100_neardup_clusters,
    "q104_leakage_safe_split": q104_leakage_safe_split,
    "q27_minhash_neardup": q27_minhash_neardup,
    "q28_simhash_neardup": q28_simhash_neardup,
    "q84_stream_neardup": q84_stream_neardup,
    "q90_stream_sessionize": q90_stream_sessionize,
    "q29_cosine_neardup": q29_cosine_neardup,
    "q106_cosine_neardup_clusters": q106_cosine_neardup_clusters,
    "q30_knn_topk": q30_knn_topk,
    "q128_rag_retrieval": q128_rag_retrieval,
    "q31_ann_topk": q31_ann_topk,
    "q77_ivf_topk": q77_ivf_topk,
    "q116_pq_topk": q116_pq_topk,
    "q32_token_stats": q32_token_stats,
    "q33_quality_score": q33_quality_score,
    "q34_lang_id": q34_lang_id,
    "q35_fingerprint": q35_fingerprint,
    "q36_multimodal_meta": q36_multimodal_meta,
    "q37_media_features": q37_media_features,
    "q172_png_decode": q172_png_decode,
    "q194_jpeg_decode": q194_jpeg_decode,
    "q198_jpeg_progressive_decode": q198_jpeg_progressive_decode,
    "q199_mp4_container_frames": q199_mp4_container_frames,
    "q200_opus_container_packets": q200_opus_container_packets,
    "q202_jpeg_frame_rows": q202_jpeg_frame_rows,
    "q173_png_palette_decode": q173_png_palette_decode,
    "q174_png_adam7_decode": q174_png_adam7_decode,
    "q38_frame_sample": q38_frame_sample,
    "q152_wav_decode": q152_wav_decode,
}

_SHINGLES = """
    SELECT doc_id,
           list_distinct(list_transform(generate_series(1, greatest(len(toks)-2, 0)),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
    FROM (SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
          FROM documents)
"""

_COSINE_PAIR = """
    list_sum(list_transform(list_zip(a.embedding, b.embedding),
          x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
    / (SQRT(list_sum(list_transform(a.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
       * SQRT(list_sum(list_transform(b.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))))
"""

ORACLE = {
    # strict `<` gap: a session spans [first_ts, last_ts + gap); an
    # event exactly gap after the last one opens a NEW session —
    # matching both F.session_window and the stateful sessionizer
    "q90_stream_sessionize": """
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS sum_value
        FROM (
            SELECT user_id, ts, value,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM (
                SELECT user_id, ts, value,
                       CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 < INTERVAL 4 HOUR
                            THEN 0 ELSE 1 END AS new_s
                FROM events)
        )
        GROUP BY user_id, sid
    """,
    "q26_neardup_jaccard": f"""
        WITH sh AS ({_SHINGLES}),
        inv AS (SELECT doc_id, len(g) AS sz, UNNEST(g) AS gram FROM sh),
        pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sa, b.sz AS sb,
                   COUNT(*) AS inter
            FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4)
        SELECT id_a, id_b,
               ROUND(inter * 1.0 / (sa + sb - inter), 4) AS jaccard
        FROM pairs WHERE inter * 1.0 / (sa + sb - inter) >= {JACCARD_THRESHOLD}
    """,
    # tolerance contract: exact pair set + booleans the Spark side
    # must have proven (streaming==batch candidate parity, recall)
    "q84_stream_neardup": f"""
        WITH sh AS ({_SHINGLES}),
        inv AS (SELECT doc_id, len(g) AS sz, UNNEST(g) AS gram FROM sh),
        pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sa, b.sz AS sb,
                   COUNT(*) AS inter
            FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4)
        SELECT id_a, id_b,
               ROUND(inter * 1.0 / (sa + sb - inter), 4) AS jaccard,
               TRUE AS batch_parity, TRUE AS recall_ok
        FROM pairs WHERE inter * 1.0 / (sa + sb - inter) >= {JACCARD_THRESHOLD}
    """,
    # tolerance contract: exact pair set + booleans the Spark side
    # must have proven (recall >= bound, no false positives)
    "q27_minhash_neardup": f"""
        WITH sh AS ({_SHINGLES}),
        inv AS (SELECT doc_id, len(g) AS sz, UNNEST(g) AS gram FROM sh),
        pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sa, b.sz AS sb,
                   COUNT(*) AS inter
            FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4)
        SELECT id_a, id_b,
               ROUND(inter * 1.0 / (sa + sb - inter), 4) AS jaccard,
               TRUE AS recall_ok, TRUE AS no_false_pos
        FROM pairs WHERE inter * 1.0 / (sa + sb - inter) >= {JACCARD_THRESHOLD}
    """,
    "q28_simhash_neardup": """
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               TRUE AS blocked_matches_exact
        FROM documents GROUP BY lang
    """,
    "q31_ann_topk": """
        SELECT vec_id AS query_id, CAST(3 AS BIGINT) AS n_exact,
               TRUE AS recall_ok
        FROM embeddings WHERE vec_id < 10
    """,
    "q77_ivf_topk": """
        SELECT vec_id AS query_id, CAST(3 AS BIGINT) AS n_exact,
               TRUE AS recall_ok
        FROM embeddings WHERE vec_id < 10
    """,
    "q116_pq_topk": """
        SELECT vec_id AS query_id, CAST(3 AS BIGINT) AS n_exact,
               TRUE AS recall_ok
        FROM embeddings WHERE vec_id < 10
    """,
    "q100_neardup_clusters": f"""
        WITH RECURSIVE sh AS ({_SHINGLES}),
        inv AS (SELECT doc_id, len(g) AS sz, UNNEST(g) AS gram FROM sh),
        cand AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sa, b.sz AS sb,
                   COUNT(*) AS inter
            FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4),
        pairs AS (
            SELECT id_a, id_b FROM cand
            WHERE inter * 1.0 / (sa + sb - inter) >= {JACCARD_THRESHOLD}),
        edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION ALL
            SELECT id_b, id_a FROM pairs),
        reach(node, comp) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.node),
        comp AS (SELECT node, MIN(comp) AS comp FROM reach GROUP BY node)
        SELECT d.doc_id,
               COALESCE(c.comp, d.doc_id) AS cluster_id,
               COALESCE(c.comp, d.doc_id) = d.doc_id AS is_canonical
        FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    """,
    "q104_leakage_safe_split": f"""
        WITH RECURSIVE sh AS ({_SHINGLES}),
        inv AS (SELECT doc_id, len(g) AS sz, UNNEST(g) AS gram FROM sh),
        cand AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sa, b.sz AS sb,
                   COUNT(*) AS inter
            FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4),
        pairs AS (
            SELECT id_a, id_b FROM cand
            WHERE inter * 1.0 / (sa + sb - inter) >= {JACCARD_THRESHOLD}),
        edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION ALL
            SELECT id_b, id_a FROM pairs),
        reach(node, comp) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.node),
        comp AS (SELECT node, MIN(comp) AS comp FROM reach GROUP BY node),
        assigned AS (
            SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN comp c ON c.node = d.doc_id)
        SELECT doc_id, cluster_id,
               CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id, cluster_id,
                     ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
              FROM assigned)
    """,
    "q29_cosine_neardup": f"""
        SELECT id_a, id_b, ROUND(sim_raw, 4) AS sim FROM (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COSINE_PAIR} AS sim_raw
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        WHERE sim_raw >= {COSINE_THRESHOLD}
    """,
    "q106_cosine_neardup_clusters": f"""
        WITH RECURSIVE pairs AS (
            SELECT id_a, id_b FROM (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COSINE_PAIR} AS sim_raw
                FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
            WHERE sim_raw >= {COSINE_THRESHOLD}),
        edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION ALL
            SELECT id_b, id_a FROM pairs),
        reach(node, comp) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.node),
        comp AS (SELECT node, MIN(comp) AS comp FROM reach GROUP BY node)
        SELECT v.vec_id,
               COALESCE(c.comp, v.vec_id) AS cluster_id,
               COALESCE(c.comp, v.vec_id) = v.vec_id AS is_canonical
        FROM embeddings v LEFT JOIN comp c ON c.node = v.vec_id
    """,
    "q30_knn_topk": f"""
        SELECT query_id, neighbor_id, ROUND(sim_raw, 4) AS sim, rank FROM (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   {_COSINE_PAIR} AS sim_raw,
                   CAST(ROW_NUMBER() OVER (PARTITION BY a.vec_id
                        ORDER BY {_COSINE_PAIR} DESC, b.vec_id) AS INTEGER) AS rank
            FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
            WHERE a.vec_id IN (0, 1, 2))
        WHERE rank <= 3
    """,
    "q128_rag_retrieval": f"""
        WITH hits AS (
            SELECT query_id, neighbor_id, ROUND(sim_raw, 4) AS sim, rank FROM (
                SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                       {_COSINE_PAIR} AS sim_raw,
                       CAST(ROW_NUMBER() OVER (PARTITION BY a.vec_id
                            ORDER BY {_COSINE_PAIR} DESC, b.vec_id) AS INTEGER) AS rank
                FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
                WHERE a.vec_id IN (0, 1, 2))
            WHERE rank <= 5
        ),
        docs AS (
            SELECT doc_id, source, lang,
                   CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                        x -> x <> '')) AS INTEGER) AS n_tokens
            FROM documents
        )
        SELECT h.query_id, h.rank, h.neighbor_id, h.sim,
               d.source, d.lang, d.n_tokens
        FROM hits h JOIN docs d ON d.doc_id = h.neighbor_id
    """,
    "q32_token_stats": """
        SELECT doc_id,
               CAST(len(toks) AS INTEGER) AS n_tokens,
               ROUND(list_sum(list_transform(toks, t -> CAST(length(t) AS BIGINT)))
                     * 1.0 / greatest(len(toks), 1), 4) AS avg_token_len
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
              FROM documents)
    """,
    "q33_quality_score": """
        WITH base AS (
            SELECT doc_id, text,
                   list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks,
                   greatest(length(text), 1) AS n_chars
            FROM documents),
        feat AS (
            SELECT doc_id,
                   CAST(len(toks) AS INTEGER) AS n_tokens,
                   length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / n_chars AS alpha_ratio,
                   length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 / n_chars AS punct_ratio,
                   len(list_intersect(list_distinct(toks),
                       ['the','a','of','and','to','in','is','it','that','for'])) / 10.0 AS stopword_ratio,
                   len(list_distinct(toks)) * 1.0 / greatest(len(toks), 1) AS distinct_ratio
            FROM base)
        SELECT doc_id, n_tokens,
               ROUND(alpha_ratio, 4) AS alpha_ratio,
               ROUND(punct_ratio, 4) AS punct_ratio,
               ROUND(stopword_ratio, 4) AS stopword_ratio,
               ROUND(distinct_ratio, 4) AS distinct_ratio,
               ROUND((CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 0.25 ELSE 0 END)
                     + (CASE WHEN alpha_ratio >= 0.6 THEN 0.25 ELSE 0 END)
                     + (CASE WHEN punct_ratio <= 0.1 THEN 0.25 ELSE 0 END)
                     + least(distinct_ratio * 2, 1.0) * 0.25, 4) AS quality_score
        FROM feat
    """,
    # argmax over stopword-profile scores; ties resolve to the
    # lexicographically LARGEST language code (Spark's array_max over
    # struct(score, lang)), hence the fr→en→de CASE order.
    "q34_lang_id": """
        WITH s AS (
            SELECT doc_id,
                   len(list_intersect(toks, ['the','a','of','and','to','in','is','it','that','for'])) / 10.0 AS s_en,
                   len(list_intersect(toks, ['der','die','das','und','ist','ein','nicht','mit','zu','den'])) / 10.0 AS s_de,
                   len(list_intersect(toks, ['le','la','les','et','est','un','une','pas','pour','que'])) / 10.0 AS s_fr
            FROM (SELECT doc_id,
                         list_distinct(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS toks
                  FROM documents)
        )
        SELECT doc_id,
               CASE WHEN greatest(s_en, s_de, s_fr) = 0 THEN 'und'
                    WHEN s_fr = greatest(s_en, s_de, s_fr) THEN 'fr'
                    WHEN s_en = greatest(s_en, s_de, s_fr) THEN 'en'
                    ELSE 'de' END AS pred_lang,
               ROUND(greatest(s_en, s_de, s_fr), 4) AS lang_score
        FROM s
    """,
    "q35_fingerprint": """
        WITH g AS (
            SELECT doc_id,
                   list_transform(generate_series(1, greatest(len(toks) - 7, 1)),
                       i -> ('0x' || substr(md5(array_to_string(toks[i:i+7], ' ')), 1, 8))::BIGINT) AS hs
            FROM (SELECT doc_id,
                         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
                  FROM documents)
        )
        SELECT doc_id, list_min(hs) AS min_fingerprint,
               CAST(len(hs) AS INTEGER) AS n_windows
        FROM g
    """,
    "q36_multimodal_meta": """
        SELECT doc_id, 'image/ppm' AS media_type,
               CAST(11 + 192 AS BIGINT) AS n_bytes
        FROM documents
    """,
    # the DECODED pixel statistics recomputed from the source text the
    # PPM encoder drew the pixels from (pixel contract: byte[i] =
    # codepoint % 256, exact for ANY corpus — ADVICE r9; pixels =
    # first 192 chars padded with 'x')
    "q37_media_features": """
        WITH codes AS (
            SELECT doc_id,
                   list_transform(range(1, 193),
                                  i -> ord(rpad(substr(text, 1, 192), 192, 'x')[i]) % 256) AS cs
            FROM documents
        )
        SELECT doc_id,
               CAST(192 AS BIGINT) AS n_bytes,
               ROUND(list_sum(cs) * 1.0 / 192, 4) AS byte_mean,
               ROUND(len(list_distinct(cs)) / 256.0, 4) AS byte_entropy_proxy
        FROM codes
    """,
    "q194_jpeg_decode": """
        WITH codes AS (
            SELECT doc_id,
                   list_transform(range(1, 5),
                                  i -> ord(rpad(substr(text, 1, 4), 4, 'x')[i]) % 256) AS cs
            FROM documents
        )
        SELECT doc_id,
               CAST(256 AS BIGINT) AS n_bytes,
               ROUND(list_sum(cs) * 1.0 / 4, 4) AS byte_mean,
               ROUND(len(list_distinct(cs)) / 256.0, 4) AS byte_entropy_proxy
        FROM codes
    """,
    # the progressive fixture decodes to the SAME pixels (DC-exact
    # contract survives the multi-scan path) — identical oracle fold
    "q198_jpeg_progressive_decode": """
        WITH codes AS (
            SELECT doc_id,
                   list_transform(range(1, 5),
                                  i -> ord(rpad(substr(text, 1, 4), 4, 'x')[i]) % 256) AS cs
            FROM documents
        )
        SELECT doc_id,
               CAST(256 AS BIGINT) AS n_bytes,
               ROUND(list_sum(cs) * 1.0 / 4, 4) AS byte_mean,
               ROUND(len(list_distinct(cs)) / 256.0, 4) AS byte_entropy_proxy
        FROM codes
    """,
    "q172_png_decode": """
        WITH codes AS (
            SELECT doc_id,
                   list_transform(range(1, 193),
                                  i -> ord(rpad(substr(text, 1, 192), 192, 'x')[i]) % 256) AS cs
            FROM documents
        )
        SELECT doc_id,
               CAST(192 AS BIGINT) AS n_bytes,
               ROUND(list_sum(cs) * 1.0 / 192, 4) AS byte_mean,
               ROUND(len(list_distinct(cs)) / 256.0, 4) AS byte_entropy_proxy
        FROM codes
    """,
    # palette and Adam7 PNGs decode back to the SAME pixel bytes
    # (shared codepoint % 256 contract) — identical oracle fold
    "q174_png_adam7_decode": """
        WITH codes AS (
            SELECT doc_id,
                   list_transform(range(1, 193),
                                  i -> ord(rpad(substr(text, 1, 192), 192, 'x')[i]) % 256) AS cs
            FROM documents
        )
        SELECT doc_id,
               CAST(192 AS BIGINT) AS n_bytes,
               ROUND(list_sum(cs) * 1.0 / 192, 4) AS byte_mean,
               ROUND(len(list_distinct(cs)) / 256.0, 4) AS byte_entropy_proxy
        FROM codes
    """,
    "q173_png_palette_decode": """
        WITH codes AS (
            SELECT doc_id,
                   list_transform(range(1, 193),
                                  i -> ord(rpad(substr(text, 1, 192), 192, 'x')[i]) % 256) AS cs
            FROM documents
        )
        SELECT doc_id,
               CAST(192 AS BIGINT) AS n_bytes,
               ROUND(list_sum(cs) * 1.0 / 192, 4) AS byte_mean,
               ROUND(len(list_distinct(cs)) / 256.0, 4) AS byte_entropy_proxy
        FROM codes
    """,
    "q152_wav_decode": """
        WITH s AS (
            SELECT doc_id,
                   list_transform(range(1, 65),
                                  i -> ((ord(rpad(substr(text, 1, 64), 64, 'x')[i]) % 256 - 97) * 256 + 32768) % 65536 - 32768) AS ss
            FROM documents
        )
        SELECT doc_id,
               CAST(8000 AS INTEGER) AS sample_rate,
               CAST(64 AS BIGINT) AS n_samples,
               ROUND(sqrt(list_sum(list_transform(ss, x -> x * x * 1.0)) / 64), 4) AS rms,
               ROUND(list_max(list_transform(ss, x -> CAST(abs(x) AS DOUBLE))), 4) AS peak
        FROM s
    """,
}

# q38 (real decode): one frame per 8-pixel row (24 bytes), mean of
# the row's decoded pixel bytes.
ORACLE["q38_frame_sample"] = """
    WITH codes AS (
        SELECT doc_id,
               list_transform(range(1, 193),
                              i -> ord(rpad(substr(text, 1, 192), 192, 'x')[i]) % 256) AS cs
        FROM documents),
    f AS (SELECT doc_id, cs, UNNEST(range(0, 8)) AS r FROM codes)
    SELECT doc_id, CAST(r AS INTEGER) AS frame_idx,
           CAST(24 AS BIGINT) AS frame_bytes,
           ROUND(list_sum(list_slice(cs, r * 24 + 1, (r + 1) * 24)) * 1.0 / 24, 4) AS frame_mean
    FROM f
"""

ORACLE["q202_jpeg_frame_rows"] = """
    WITH codes AS (
        SELECT doc_id,
               list_transform(range(1, 5),
                              i -> ord(rpad(substr(text, 1, 4), 4, 'x')[i]) % 256) AS cs
        FROM documents),
    f AS (SELECT doc_id, cs, UNNEST(range(0, 16)) AS r FROM codes)
    SELECT doc_id, CAST(r AS INTEGER) AS frame_idx,
           CAST(16 AS BIGINT) AS frame_bytes,
           ROUND((cs[(r // 8) * 2 + 1] + cs[(r // 8) * 2 + 2]) / 2.0, 4) AS frame_mean
    FROM f
"""

ORACLE["q199_mp4_container_frames"] = """
    WITH codes AS (
        SELECT doc_id,
               list_transform(range(1, 321),
                              i -> ord(rpad(substr(text, 1, 320), 320, 'x')[i]) % 256) AS cs
        FROM documents),
    f AS (SELECT doc_id, cs, UNNEST(range(0, 5)) AS r FROM codes)
    SELECT doc_id, CAST(r AS INTEGER) AS frame_idx,
           CAST(64 AS BIGINT) AS frame_bytes,
           ROUND(list_sum(list_slice(cs, r * 64 + 1, (r + 1) * 64)) * 1.0 / 64, 4) AS frame_mean
    FROM f
"""

ORACLE["q200_opus_container_packets"] = """
    WITH codes AS (
        SELECT doc_id,
               list_transform(range(1, 601),
                              i -> ord(rpad(substr(text, 1, 600), 600, 'x')[i]) % 256) AS cs
        FROM documents),
    pk AS (
        SELECT doc_id, cs, UNNEST([
            {'i': 0, 's': 1,   'n': 150},
            {'i': 1, 's': 151, 'n': 300},
            {'i': 2, 's': 451, 'n': 150}
        ], recursive := true) FROM codes)
    SELECT doc_id, CAST(i AS INTEGER) AS packet_idx,
           CAST(n AS BIGINT) AS n_bytes,
           ROUND(list_sum(list_slice(cs, s, s + n - 1)) * 1.0 / n, 4) AS byte_mean,
           CAST(1 AS INTEGER) AS channels,
           CAST(2880 AS BIGINT) AS duration_samples
    FROM pk
"""

ORACLE["q73_curation_pipeline"] = f"""
    WITH q AS ({ORACLE['q33_quality_score']}),
    kept AS (
        SELECT d.doc_id, d.text
        FROM documents d JOIN q ON d.doc_id = q.doc_id
        WHERE q.quality_score >= {QUALITY_KEEP}
    ),
    rep AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5(text))
    SELECT doc_id,
           CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' ELSE 'test' END AS split
    FROM (
        SELECT doc_id,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
        FROM rep
    )
"""


# --- C3/C4: distributed k-means clustering (oracle: unrolled Lloyd CTEs) -----
_KM_K, _KM_ITER, _KM_DIM = 4, 3, 64


def q176_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus fixed-iteration Lloyd k-means (similarity.
    kmeans_assign) — the cluster-then-balance step SemDeDup-style
    pipelines run before in-cluster dedup / per-cluster sampling.
    Map-only assignment against a broadcast centroid literal + one
    groupBy(k) per round; centroids round to 8 decimals each round so
    DuckDB's unrolled-CTE replay is bit-exact (see kmeans_assign)."""
    return _kmeans_assigned(spark, sf_dir).orderBy("vec_id")


def _kmeans_assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached k-means assignment (same VERDICT-r5 device as
    the shingle/pair caches above): q176 and q177 share one Lloyd run
    per session instead of each paying the 3 assignment+update
    rounds."""
    return _cached_ckpt(
        spark,
        ("kmeans", sf_dir, _KM_K, _KM_ITER, _KM_DIM),
        lambda: similarity.kmeans_assign(
            load_table(spark, sf_dir, "embeddings"),
            k=_KM_K, iterations=_KM_ITER, dim=_KM_DIM,
        ),
    )


def _kmeans_oracle(
    k: int,
    iters: int,
    dim: int,
    final_select: str | None = None,
    c0_parts: list[str] | None = None,
) -> str:
    """Generate the unrolled Lloyd SQL (same device as the PageRank
    oracle): c0 = the k smallest-id vectors rounded to 8dp; each round
    r assigns by argmin squared distance (ties to the lower cluster)
    and recomputes per-dimension rounded means, empty clusters keeping
    their previous centroid via LEFT JOIN + COALESCE; the answer is
    the assignment under the final centroids. ``c0_parts`` swaps in a
    different init: a CTE list whose last element defines
    ``c0(cluster, cent)`` (the kmeans++ selection below uses it)."""
    dist = (
        "list_sum(list_transform(range(1, {n}), i -> "
        "(CAST(e.embedding[i] AS DOUBLE) - c.cent[i]) * "
        "(CAST(e.embedding[i] AS DOUBLE) - c.cent[i])))"
    ).format(n=dim + 1)

    def assign(name: str, csrc: str) -> str:
        return f"""{name} AS (
        SELECT vec_id, embedding, cluster FROM (
            SELECT e.vec_id, e.embedding, c.cluster,
                   row_number() OVER (
                       PARTITION BY e.vec_id ORDER BY {dist}, c.cluster
                   ) AS rn
            FROM embeddings e CROSS JOIN {csrc} c
        ) WHERE rn = 1
    )"""

    avgs = ", ".join(
        f"round(avg(CAST(embedding[{i + 1}] AS DOUBLE)), 8)"
        for i in range(dim)
    )
    parts = c0_parts if c0_parts is not None else [
        f"""init AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
               embedding
        FROM (SELECT vec_id, embedding FROM embeddings
              ORDER BY vec_id LIMIT {k})
    )""",
        """c0 AS (
        SELECT cluster,
               list_transform(range(1, %d),
                              i -> round(CAST(embedding[i] AS DOUBLE), 8)) AS cent
        FROM init
    )""" % (dim + 1),
    ]
    parts = list(parts)
    for r in range(iters):
        parts.append(assign(f"a{r}", f"c{r}"))
        parts.append(
            f"""g{r + 1} AS (
        SELECT cluster, [{avgs}] AS cent FROM a{r} GROUP BY cluster
    )"""
        )
        parts.append(
            f"""c{r + 1} AS (
        SELECT c{r}.cluster, COALESCE(g{r + 1}.cent, c{r}.cent) AS cent
        FROM c{r} LEFT JOIN g{r + 1} USING (cluster)
    )"""
        )
    parts.append(assign("afinal", f"c{iters}"))
    if final_select is None:
        final_select = (
            "SELECT vec_id, CAST(cluster AS INTEGER) AS cluster "
            "FROM afinal ORDER BY vec_id"
        )
    return "WITH " + ",\n    ".join(parts) + "\n    " + final_select


QUERIES["q176_kmeans_embeddings"] = q176_kmeans_embeddings
ORACLE["q176_kmeans_embeddings"] = _kmeans_oracle(_KM_K, _KM_ITER, _KM_DIM)


_KM_SAMPLE_PER_CLUSTER = 50


def q177_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The balancing DECISION q176's clusters exist for: keep at most
    N embeddings per k-means cluster, ranked by the same
    md5-deterministic key the split/cap staples use (q70/q105) — a
    semantic-diversity subset instead of a source-frequency one
    (over-represented regions of embedding space are downsampled,
    sparse regions kept whole). Rank is a per-cluster window (k
    partitions — never a global sort) over a pure key function (no
    rand()): RERUNS on the same data reproduce identical decisions.
    Appends are NOT decision-stable in this exact-window form — a new
    row can displace rank N, and new data moves the centroids
    themselves (third review pass; the cap staples q105/q110 share
    this property). At 100 TB with small k the per-cluster sort also
    skews, so the PRODUCTION scale path is q178 /
    similarity.cluster_threshold_sample: a map-only filter against
    each cluster's approx Nth-smallest md5 key (percentile_approx —
    one tiny agg, then `key <= threshold` filters in place), which IS
    append-stable for surviving rows at a fixed threshold, with N
    within sketch error. This exact-window form stays as the
    small-k/exact-N twin and the cross-check reference."""
    from pyspark.sql.window import Window

    assigned = _kmeans_assigned(spark, sf_dir)
    rank_key = F.substring(
        F.md5(F.concat(F.lit("cb:"), F.col("vec_id").cast("string"))), 1, 8
    )
    w = Window.partitionBy("cluster").orderBy(rank_key, "vec_id")
    return (
        assigned.withColumn("rk", F.row_number().over(w))
        .select(
            "vec_id", "cluster",
            (F.col("rk") <= _KM_SAMPLE_PER_CLUSTER).alias("kept"),
        )
        .orderBy("vec_id")
    )


QUERIES["q177_cluster_balanced_sample"] = q177_cluster_balanced_sample
ORACLE["q177_cluster_balanced_sample"] = _kmeans_oracle(
    _KM_K, _KM_ITER, _KM_DIM,
    final_select=f"""SELECT vec_id, CAST(cluster AS INTEGER) AS cluster,
           row_number() OVER (
               PARTITION BY cluster
               ORDER BY substr(md5('cb:' || CAST(vec_id AS VARCHAR)), 1, 8),
                        vec_id
           ) <= {_KM_SAMPLE_PER_CLUSTER} AS kept
    FROM afinal ORDER BY vec_id""",
)


def q178_cluster_threshold_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q177's PRODUCTION scale form (VERDICT r10 #1): cluster-balanced
    sampling as a MAP-ONLY threshold filter —
    ``similarity.cluster_threshold_sample`` computes each cluster's
    approximate Nth-smallest md5 rank key with ONE tiny
    ``groupBy(cluster)`` percentile_approx aggregation and keeps
    ``key <= threshold`` in place. No per-cluster window, no sort of
    the corpus (the plan gate in tests/test_plans.py asserts the
    Window-free shape), and survivors are append-stable at a fixed
    threshold. Tolerance-contract probe (the q26/q144 device): the
    hashed output is the per-cluster exact sizes — DuckDB-computable
    from the unrolled-Lloyd oracle — plus ``kept_ok``, the measured
    |kept − min(N, n)| ≤ max(3, ceil(n/1000)) bound the operator's
    docstring derives from grid + sketch error; the oracle asserts
    TRUE. The exact kept SET is cross-checked against q177's window
    form in pytest (recall ≥ 0.9 at two SFs)."""
    assigned = _kmeans_assigned(spark, sf_dir)
    per_row = similarity.cluster_threshold_sample(
        assigned, _KM_SAMPLE_PER_CLUSTER
    )
    tol = F.greatest(
        F.lit(3).cast("long"), F.ceil(F.col("n_total") / 1000.0)
    )
    return (
        per_row.groupBy("cluster", "n_total", "n_target")
        .agg(F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("_n_kept"))
        .select(
            "cluster",
            "n_total",
            "n_target",
            (F.abs(F.col("_n_kept") - F.col("n_target")) <= tol).alias(
                "kept_ok"
            ),
        )
        .orderBy("cluster")
    )


QUERIES["q178_cluster_threshold_sample"] = q178_cluster_threshold_sample
ORACLE["q178_cluster_threshold_sample"] = _kmeans_oracle(
    _KM_K, _KM_ITER, _KM_DIM,
    final_select=f"""SELECT CAST(cluster AS INTEGER) AS cluster,
           count(*) AS n_total,
           least({_KM_SAMPLE_PER_CLUSTER}, count(*)) AS n_target,
           TRUE AS kept_ok
    FROM afinal GROUP BY cluster ORDER BY cluster""",
)


def q179_tws_session_close(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q90's session semantics through the Spark 4
    ``transformWithStateInPandas`` API with NAMED ListState + per-key
    EVENT-TIME TIMERS (streaming/stateful.py::_SessionCloseProcessor)
    — the first operator here only TWS expresses cleanly: every
    emission is timer-driven (fires when the watermark passes
    session_end + gap), the data path emits nothing, so sessions are
    final by the watermark's definition and intra-watermark disorder
    merges correctly instead of corrupting an early emission.
    Two data chunks + the sentinel = three triggers: sessions open in
    batch 0, extend across the batch-1 boundary, and drain in the
    trailing timer batch the sentinel's watermark forces — the
    exactly-once ListState/timer contract under test, on the RocksDB
    provider (the 100 TB posture: state off-heap/on-disk). Same
    gaps-and-islands oracle as q90; pytest additionally pins the
    shuffled-chunk drain byte-equal to the ordered one
    (tests/test_stateful_streaming.py)."""
    from biodwh2_arcadedb_server_spark.streaming.stateful import (
        run_finite_sessionize_tws,
    )

    out = run_finite_sessionize_tws(
        spark, sf_dir, SESSION_GAP_MS, n_chunks=2, name="q179_sessions",
        state_parts=8,
    )
    return out.select(
        "user_id",
        "session_start",
        "session_end",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
    )


QUERIES["q179_tws_session_close"] = q179_tws_session_close
ORACLE["q179_tws_session_close"] = ORACLE["q90_stream_sessionize"]


def _kmpp_c0_parts(k: int, dim: int, seed: int) -> list[str]:
    """CTE chain replaying the kmeans++ init EXACTLY as
    similarity.kmeans_assign(init="kmeans++") computes it: u_r(id) is
    a FRESH md5 uniform in (0,1] per selection round (keyed
    ``kmpp:{seed}:{round}:{id}`` — ADVICE r11: E–S sampling with
    round-varying D² weights requires fresh uniforms; a fixed u(id)
    favors high-u rows every round), the first centroid is argmax u₀,
    and each subsequent round j picks argmax ln(u_j)/D² over rows
    with D²>0 (Efraimidis–Spirakis weighted sampling without
    replacement), rounding the chosen vector HALF_UP to 8dp. D²
    values can differ from Spark's fold order by ulps — a key-order
    flip requires two candidates within one ulp of each other, the
    same probabilistic boundary the Lloyd rounding contract already
    documents."""
    n = dim + 1
    dist = (
        f"list_sum(list_transform(range(1, {n}), i -> "
        "(CAST(e.embedding[i] AS DOUBLE) - s.cent[i]) * "
        "(CAST(e.embedding[i] AS DOUBLE) - s.cent[i])))"
    )
    r8vec = (
        f"list_transform(range(1, {n}), "
        "i -> round(CAST(e.embedding[i] AS DOUBLE), 8))"
    )

    def u(rnd: int) -> str:
        return (
            f"((('0x' || substr(md5('kmpp:{seed}:{rnd}:' || "
            "CAST(e.vec_id AS VARCHAR)), 1, 8))::BIGINT + 1) "
            "/ 4294967296.0)"
        )

    parts = [
        "uu AS (SELECT vec_id, embedding FROM embeddings)",
        f"""sel0 AS (
        SELECT 0 AS cluster, {r8vec} AS cent
        FROM uu e ORDER BY {u(0)} DESC, e.vec_id ASC LIMIT 1
    )""",
    ]
    for j in range(1, k):
        parts.append(f"""dd{j} AS (
        SELECT e.vec_id, min({dist}) AS d2
        FROM uu e CROSS JOIN sel{j - 1} s GROUP BY e.vec_id
    )""")
        parts.append(f"""pp{j} AS (
        SELECT {j} AS cluster, {r8vec} AS cent
        FROM dd{j} d JOIN uu e USING (vec_id)
        WHERE d.d2 > 0
        ORDER BY ln({u(j)}) / d.d2 DESC, e.vec_id ASC LIMIT 1
    )""")
        parts.append(f"""sel{j} AS (
        SELECT * FROM sel{j - 1} UNION ALL SELECT * FROM pp{j}
    )""")
    parts.append(f"c0 AS (SELECT cluster, cent FROM sel{k - 1})")
    return parts


_KMPP_ITER, _KMPP_SEED = 2, 0


def q180_kmeanspp_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION k-means init, driver-oracled (stronger than the
    pytest numpy replay VERDICT r10 #3 asked for): kmeans++ seeding
    via deterministic Efraimidis–Spirakis D²-weighted sampling — each
    selection round is ONE map-only D² scan against the broadcast
    chosen-so-far literal plus a 1-row max_by aggregation; no corpus
    shuffle, no rand() — followed by 2 fixed Lloyd rounds. The DuckDB
    twin unrolls BOTH the selection chain and the Lloyd rounds
    (q176's CTE device with a kmeans++ c0), so the whole production
    path is hash-checked, not just pytest-pinned."""
    return (
        similarity.kmeans_assign(
            load_table(spark, sf_dir, "embeddings"),
            k=_KM_K, iterations=_KMPP_ITER, dim=_KM_DIM,
            init="kmeans++", seed=_KMPP_SEED,
        )
        .orderBy("vec_id")
    )


QUERIES["q180_kmeanspp_assign"] = q180_kmeanspp_assign
ORACLE["q180_kmeanspp_assign"] = _kmeans_oracle(
    _KM_K, _KMPP_ITER, _KM_DIM,
    c0_parts=_kmpp_c0_parts(_KM_K, _KM_DIM, _KMPP_SEED),
)


def q181_tws_stream_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact-dedup through TWS MapState (streaming/
    stateful.py::_FirstSeenProcessor) — with q175 (ValueState) and
    q179 (ListState + timers) this closes coverage of every named
    state kind the Spark 4 API offers. Three data chunks make ~28%
    of (user, fingerprint) observations arrive as LATER-batch
    duplicates of an earlier sighting; the map must suppress them
    across micro-batch boundaries, emitting each pair exactly once at
    its first timestamp. Oracle: the batch GROUP BY with MIN(ts)."""
    from biodwh2_arcadedb_server_spark.streaming.stateful import (
        run_finite_first_seen,
    )

    return run_finite_first_seen(
        spark, sf_dir, modulus=97, n_chunks=3, name="q181_first_seen",
        state_parts=8,
    ).select("user_id", "fp", "first_ts")


QUERIES["q181_tws_stream_first_seen"] = q181_tws_stream_first_seen
ORACLE["q181_tws_stream_first_seen"] = """
    SELECT user_id,
           CAST(FLOOR(value * 10) AS BIGINT) % 97 AS fp,
           MIN(ts) AS first_ts
    FROM events
    GROUP BY user_id, fp
"""


def q182_tws_warm_start_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch→stream dedup handoff via TWS INITIAL STATE (streaming/
    stateful.py::run_warm_start_first_seen): the pre-cutoff corpus is
    deduplicated in batch, its per-user seen-sets load through
    handleInitialState before the stream's first micro-batch, and the
    post-cutoff stream emits only fingerprints the batch era never
    saw — the restart/bootstrap pattern every production streaming
    dedup needs (and the last Spark 4 TWS API feature the q175/q179/
    q181 trio left uncovered). Oracle: pairs whose global first
    occurrence is at/after the midpoint-epoch cutoff, computed
    identically by both engines from MIN/MAX epoch-µs."""
    from biodwh2_arcadedb_server_spark.streaming.stateful import (
        run_warm_start_first_seen,
    )

    return run_warm_start_first_seen(
        spark, sf_dir, modulus=97, n_chunks=2,
        name="q182_warm_first_seen", state_parts=8,
    ).select("user_id", "fp", "first_ts")


QUERIES["q182_tws_warm_start_dedup"] = q182_tws_warm_start_dedup
ORACLE["q182_tws_warm_start_dedup"] = """
    SELECT user_id,
           CAST(FLOOR(value * 10) AS BIGINT) % 97 AS fp,
           MIN(ts) AS first_ts
    FROM events
    GROUP BY user_id, fp
    HAVING MIN(epoch_us(ts)) >=
           (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 FROM events)
"""


def _kmll_c0_parts(
    k: int, dim: int, seed: int, l: float, rounds: int
) -> list[str]:
    """CTE chain replaying the k-means|| init (Bahmani et al. 2012)
    EXACTLY as similarity.kmeans_assign(init="kmeans||") computes it:
    candidate 0 is argmax u₀; each oversampling round r selects every
    row with D²>0 and u_r < min(1, ℓ·D²/φ) (independent coin flips on
    the fresh per-round md5 uniform — a SET per round, not an
    argmax); candidates order by (round, vec_id); Voronoi weights
    come from the corpus assignment (ties to the lower candidate
    ord); and the weighted kmeans++ finishing chain picks k seeds by
    argmax ln(u'_j)/w (j=0) then ln(u'_j)/(w·D²) — the same
    Efraimidis–Spirakis device with weight w·D². Float boundaries
    carry the q180 probabilistic-ulp contract."""
    n = dim + 1

    def dist(vec: str, cent: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {n}), i -> "
            f"(CAST({vec}[i] AS DOUBLE) - {cent}[i]) * "
            f"(CAST({vec}[i] AS DOUBLE) - {cent}[i])))"
        )

    r8vec = (
        f"list_transform(range(1, {n}), "
        "i -> round(CAST(e.embedding[i] AS DOUBLE), 8))"
    )

    def u(rnd: int) -> str:
        return (
            f"((('0x' || substr(md5('kmll:{seed}:{rnd}:' || "
            "CAST(e.vec_id AS VARCHAR)), 1, 8))::BIGINT + 1) "
            "/ 4294967296.0)"
        )

    def uw(rnd: int, id_expr: str) -> str:
        return (
            f"((('0x' || substr(md5('kmllw:{seed}:{rnd}:' || "
            f"CAST({id_expr} AS VARCHAR)), 1, 8))::BIGINT + 1) "
            "/ 4294967296.0)"
        )

    parts = [
        "uu AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings)",
        f"""kc0 AS MATERIALIZED (
        SELECT 0 AS rnd, e.vec_id, {r8vec} AS cent
        FROM uu e ORDER BY {u(0)} DESC, e.vec_id ASC LIMIT 1
    )""",
    ]
    for r in range(1, rounds + 1):
        parts.append(f"""kd{r} AS MATERIALIZED (
        SELECT e.vec_id, min({dist('e.embedding', 's.cent')}) AS d2
        FROM uu e CROSS JOIN kc{r - 1} s GROUP BY e.vec_id
    )""")
        parts.append(
            f"kp{r} AS (SELECT sum(d2) AS phi FROM kd{r})"
        )
        parts.append(f"""kn{r} AS (
        SELECT {r} AS rnd, e.vec_id, {r8vec} AS cent
        FROM kd{r} d JOIN uu e USING (vec_id) CROSS JOIN kp{r}
        WHERE d.d2 > 0 AND {u(r)} < least(1.0, {l!r} * d.d2 / phi)
    )""")
        parts.append(f"""kc{r} AS MATERIALIZED (
        SELECT * FROM kc{r - 1} UNION ALL SELECT * FROM kn{r}
    )""")
    parts.append(f"""kcand AS MATERIALIZED (
        SELECT row_number() OVER (ORDER BY rnd, vec_id) - 1 AS ord,
               vec_id, cent
        FROM kc{rounds}
    )""")
    parts.append(f"""kassign AS (
        SELECT vec_id, ord FROM (
            SELECT e.vec_id, c.ord,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {dist('e.embedding', 'c.cent')}, c.ord
                   ) AS rn
            FROM uu e CROSS JOIN kcand c
        ) WHERE rn = 1
    )""")
    parts.append("""kw AS MATERIALIZED (
        SELECT c.ord, c.vec_id, c.cent, count(a.vec_id) AS w
        FROM kcand c LEFT JOIN kassign a USING (ord)
        GROUP BY c.ord, c.vec_id, c.cent
    )""")
    parts.append(f"""ss0 AS MATERIALIZED (
        SELECT 0 AS cluster, vec_id, cent FROM kw WHERE w > 0
        ORDER BY ln({uw(0, 'kw.vec_id')}) / w DESC, vec_id ASC LIMIT 1
    )""")
    cdist = (
        f"list_sum(list_transform(range(1, {n}), i -> "
        "(c.cent[i] - s.cent[i]) * (c.cent[i] - s.cent[i])))"
    )
    for j in range(1, k):
        parts.append(f"""sd{j} AS (
        SELECT c.ord, c.vec_id, c.cent, c.w, min({cdist}) AS d2
        FROM kw c CROSS JOIN ss{j - 1} s
        GROUP BY c.ord, c.vec_id, c.cent, c.w
    )""")
        parts.append(f"""sp{j} AS (
        SELECT {j} AS cluster, vec_id, cent FROM sd{j}
        WHERE w > 0 AND d2 > 0
        ORDER BY ln({uw(j, f'sd{j}.vec_id')}) / (w * d2) DESC,
                 vec_id ASC LIMIT 1
    )""")
        parts.append(f"""ss{j} AS MATERIALIZED (
        SELECT * FROM ss{j - 1} UNION ALL SELECT * FROM sp{j}
    )""")
    parts.append(f"c0 AS (SELECT cluster, cent FROM ss{k - 1})")
    return parts


_KMLL_ITER, _KMLL_SEED, _KMLL_ROUNDS, _KMLL_L = 2, 0, 2, 8.0


def q185_kmeans_parallel_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALABLE k-means init (VERDICT r11 #3 — Bahmani et al.
    2012 "Scalable k-means++"): q180's sequential kmeans++ is k full
    corpus scans; k-means|| oversamples ℓ candidates per round for
    O(log n) rounds (here 2 rounds × ℓ=8 — each round ONE map-only D²
    scan + a 1-row φ agg + a bounded candidate collect), weights the
    ~ℓ·R+1 candidates by Voronoi cell size (one groupBy agg), and
    finishes with driver-side weighted kmeans++ over that bounded
    list. The DuckDB twin unrolls ALL of it — oversampling coin
    flips, candidate ordering, weight assignment, weighted selection
    chain, and 2 Lloyd rounds — so the whole production path is
    hash-checked like q180, not just pytest-pinned."""
    return (
        similarity.kmeans_assign(
            load_table(spark, sf_dir, "embeddings"),
            k=_KM_K, iterations=_KMLL_ITER, dim=_KM_DIM,
            init="kmeans||", seed=_KMLL_SEED,
            init_rounds=_KMLL_ROUNDS, oversample=_KMLL_L,
        )
        .orderBy("vec_id")
    )


QUERIES["q185_kmeans_parallel_assign"] = q185_kmeans_parallel_assign
ORACLE["q185_kmeans_parallel_assign"] = _kmeans_oracle(
    _KM_K, _KMLL_ITER, _KM_DIM,
    c0_parts=_kmll_c0_parts(
        _KM_K, _KM_DIM, _KMLL_SEED, _KMLL_L, _KMLL_ROUNDS
    ),
)
