"""Driver-contract probe batch 8: lakehouse schema/CDC staples and
three more training-pipeline primitives.

Reference parity: the reference's ETL surface is a one-shot
create-then-serve (`ArcadeDBService.java` createDatabase/importGraph);
a living 100 TB lakehouse additionally needs schema evolution across
ingest generations, snapshot diffing (CDC without a transaction log),
and the curation-side selection/quantization ops below. All are
expressed as single declarative DataFrame plans — no driver loops, no
Python row paths.

- Schema-evolution union (q129): `unionByName(allowMissingColumns)`
  over two ingest generations — the mergeSchema read path as an
  explicit operator, null-filling the columns the old generation
  lacks. DuckDB twin: `UNION ALL BY NAME`.
- Snapshot diff / CDC (q130): full-outer join on the business key,
  rows classified inserted / deleted / updated by key presence and a
  value fingerprint. The MERGE-free change feed between two
  partition snapshots (q88's SCD2 consumes exactly this shape).
- Deterministic training order (q131): the "global shuffle" every
  training run needs, as a pure key function — md5(seed, doc_id)
  ranked by a window. Reproducible across engines, append-stable.
- Token-budget selection (q132): per-language data mixing under a
  token budget — quality-ranked cumulative token sums, keep while
  the budget lasts (the C4/RedPajama "take the best N tokens" step).
- Robust outliers (q133): median/MAD fences (Hampel, 3·1.4826·MAD)
  per customer segment — the quality-filter shape that survives the
  heavy-tailed score distributions where mean/stddev fences fail.
- Mergeable-sketch rollup (q134): Apache DataSketches HLL partials
  per (event_type, day) unioned across days — the pre-aggregated
  sketch-table pattern that makes 100 TB distinct-count rollups a
  metadata-sized merge instead of a re-scan. Tolerance-contract
  oracle like q60 (sketches can't hash-match; the bound can).
- Int8 embedding quantization (q135): per-vector symmetric scalar
  quantization (scale = 127/max|x|) with reconstruction-error audit
  — 4× memory cut for the ANN stack (q31/q77/q116 all consume it).

Scale notes (100 TB):
- q129 is a zero-shuffle concatenation: unionByName only aligns
  projections; Catalyst pushes downstream filters into BOTH scan
  branches (asserted for the union shape in test_plans.py).
- q130 shuffles both snapshots once on the join key. At 100 TB the
  snapshots are partition-pruned to the compared range first; the
  value fingerprint is computed map-side, so the join carries key +
  8-byte hash, not the full row width, until the final project.
- q131's window is a single global sort by an md5 key — uniformly
  distributed by construction, so range partitioning is skew-free.
  At 100 TB prefer zorder-style WRITE ordering (sources/layout.py);
  the probe emits the per-shard variant's contract: position is
  reproducible, not load-bearing on one reducer (AQE splits the
  range exchange).
- q132 shuffles once on lang; the running sum is a single-pass
  window with one scalar of state per partition. Budgets are
  enforced per language shard, never via a global sort.
- q133 is two hash aggregates and two broadcast joins back (group
  medians are tiny); exact percentile is fine per segment because
  the GROUP domain is small — at billions of rows per group, swap
  `percentile` for `percentile_approx` (q89's GK path) unchanged.
- q134's sketches are 8-16 KB fixed-size binaries: the per-day
  partials aggregate map-side, the cross-day union moves sketches,
  never ids. This is the only distinct-rollup that works when the
  id domain itself won't fit anywhere.
- q135 is map-only per-vector arithmetic (zip_with/aggregate HOFs,
  JVM codegen); the int8 codes shrink the shuffle/broadcast payloads
  of every downstream ANN op 4×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from biodwh2_arcadedb_server_spark.functions import tokens
from biodwh2_arcadedb_server_spark.sources.registry import load_table

TOKEN_BUDGET = 20_000  # per-language token budget for q132
SHUFFLE_SEED = "seed42:"  # q131 training-order seed

# q130 synthesizes two snapshots from the one orders table with
# deterministic key arithmetic: snapshot A drops keys ≡0 (mod 7)
# (later inserts), snapshot B drops keys ≡0 (mod 11) (deletes) and
# reprices keys ≡0 (mod 5) (updates).
_A_DROP, _B_DROP, _B_REPRICE = 7, 11, 5


# --- A4/A7 ext.: schema-evolution union across ingest generations -----------------
def q129_schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two ingest generations of the orders feed — v1 without the
    priority column, v2 with it — unioned by NAME with null fill.
    Positional UNION would silently misalign; the by-name form is the
    schema-evolution contract (`mergeSchema` as an operator)."""
    o = load_table(spark, sf_dir, "orders")
    v1 = o.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", F.round("o_totalprice", 4).alias("price")
    )
    v2 = o.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        F.round("o_totalprice", 4).alias("price"),
        F.col("o_orderpriority").alias("priority"),
    )
    return (
        v1.unionByName(v2, allowMissingColumns=True)
        .withColumn("generation", F.when(F.col("priority").isNull(), 1).otherwise(2))
    )


# --- B19 ext.: snapshot diff — the MERGE-free CDC change feed ----------------------
def q130_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change feed between two snapshots of orders: full-outer join on
    the key, classify by presence + value fingerprint. Emits only
    changed rows (inserted/deleted/updated), never the unchanged bulk
    — the input contract of the SCD2 probe (q88)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 4).alias("price")
    )
    snap_a = o.where(F.col("o_orderkey") % _A_DROP != 0)
    snap_b = o.where(F.col("o_orderkey") % _B_DROP != 0).withColumn(
        "price",
        F.when(
            F.col("o_orderkey") % _B_REPRICE == 0, F.round(F.col("price") * 1.1, 4)
        ).otherwise(F.col("price")),
    )
    # map-side value fingerprint: the join carries key + hash, not row width
    fp = lambda df: df.withColumn(  # noqa: E731
        "_fp", F.xxhash64(F.col("o_orderstatus"), F.col("price").cast("string"))
    )
    a = fp(snap_a).select(
        F.col("o_orderkey").alias("key"),
        F.col("_fp").alias("fp_a"),
        F.col("o_orderstatus").alias("status_a"),
        F.col("price").alias("price_a"),
    )
    b = fp(snap_b).select(
        F.col("o_orderkey").alias("key"),
        F.col("_fp").alias("fp_b"),
        F.col("o_orderstatus").alias("status_b"),
        F.col("price").alias("price_b"),
    )
    j = a.join(b, "key", "full_outer")
    change = (
        F.when(F.col("fp_a").isNull(), "inserted")
        .when(F.col("fp_b").isNull(), "deleted")
        .when(F.col("fp_a") != F.col("fp_b"), "updated")
    )
    return (
        j.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(
            "key",
            "change",
            F.coalesce("status_b", "status_a").alias("o_orderstatus"),
            F.col("price_a").alias("old_price"),
            F.col("price_b").alias("new_price"),
        )
    )


# --- training staple: deterministic global shuffle order ---------------------------
def q131_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible corpus shuffle: position = rank of md5(seed ∥
    doc_id). A pure key function — identical across engines, runs,
    and appends (new docs interleave without reshuffling old ones).
    The md5 key is uniform, so the range sort has no skew."""
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit(SHUFFLE_SEED), F.col("doc_id").cast("string")))
    w = Window.orderBy(key.asc(), F.col("doc_id").asc())
    return d.select(
        "doc_id", F.row_number().over(w).alias("position"), key.alias("shuffle_key")
    )


# --- training staple: per-language token-budget selection --------------------------
def q132_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing under a token budget: rank each language's docs by
    a quality proxy (longer docs first here; any score plugs in),
    admit docs while the running token total stays inside the budget.
    One lang-key shuffle; the running sum is single-pass window state."""
    d = load_table(spark, sf_dir, "documents")
    toked = d.select(
        "doc_id", "lang", F.size(tokens(F.col("text"))).alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("n_tokens").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = toked.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return running.where(F.col("cum_tokens") <= TOKEN_BUDGET).select(
        "doc_id", "lang", "n_tokens", "cum_tokens"
    )


# --- quality staple: robust outlier fences (median/MAD) ----------------------------
def q133_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel fences per market segment: robust z = |x − median| /
    (1.4826·MAD). Emits the per-segment fence summary (median, MAD,
    outlier count at z>3, max z, most-deviant customer) rather than a
    filtered row set — on symmetric bounded data the 3-MAD fence is
    legitimately empty, and a summary keeps the oracle non-vacuous.
    Median/MAD survive the heavy tails that wreck mean/stddev fences
    — the robust version of the z-score quality filter (q47)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", F.col("c_acctbal").cast("double").alias("bal")
    )
    med = c.groupBy("c_mktsegment").agg(
        F.expr("percentile(bal, 0.5)").alias("seg_median")
    )
    dev = c.join(F.broadcast(med), "c_mktsegment").withColumn(
        "abs_dev", F.abs(F.col("bal") - F.col("seg_median"))
    )
    mad = dev.groupBy("c_mktsegment").agg(
        F.expr("percentile(abs_dev, 0.5)").alias("seg_mad"),
        F.first("seg_median").alias("seg_median"),
    )
    fenced = (
        dev.drop("seg_median")
        .join(F.broadcast(mad), "c_mktsegment")
        .withColumn("robust_z", F.col("abs_dev") / (1.4826 * F.col("seg_mad")))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("abs_dev").desc(), F.col("c_custkey").asc()
    )
    return (
        fenced.withColumn("_rk", F.row_number().over(w))
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.first("seg_median"), 4).alias("seg_median"),
            F.round(F.first("seg_mad"), 4).alias("seg_mad"),
            F.sum((F.col("robust_z") > 3.0).cast("long")).alias("n_outliers"),
            F.round(F.max("robust_z"), 4).alias("max_robust_z"),
            F.max(F.when(F.col("_rk") == 1, F.col("c_custkey"))).alias("top_custkey"),
        )
    )


# --- B10 ext.: mergeable HLL sketch rollup (DataSketches) --------------------------
def q134_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via MERGED daily sketches:
    `hll_sketch_agg` per (event_type, day) then `hll_union_agg`
    across days — the incremental sketch-table pattern (daily partials
    persist; month/alltime rollups merge 8 KB binaries, not ids).
    Tolerance contract like q60: emit the exact count (DuckDB
    reproduces it) plus the sketch's relative-error bound check."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg(F.col("user_id"), F.lit(14)).alias("day_sketch")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("day_sketch")).alias("_approx")
    )
    # exact side via pre-distinct pairs (q60's no-expand pattern) —
    # the probe itself must stay scale-sane, not just the sketch half
    exact = (
        e.groupBy("event_type", "user_id")
        .agg(F.lit(1).alias("_one"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("exact_users"))
    )
    joined = merged.join(exact, "event_type")
    rel_err = F.abs(F.col("_approx") - F.col("exact_users")) / F.greatest(
        F.col("exact_users"), F.lit(1)
    )
    return joined.select(
        "event_type", "exact_users", (rel_err <= 0.05).alias("within_tol")
    )


# --- C3 scale path: symmetric int8 scalar quantization ----------------------------
def q135_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector symmetric int8 quantization of the embedding column:
    scale = 127 / max|x|, code = floor(x·scale + 0.5) — and the
    reconstruction-error audit every compressed ANN index ships with.
    floor(x+0.5) not round(): both engines define floor identically,
    while round() half-way semantics differ. Map-only JVM HOFs."""
    e = load_table(spark, sf_dir, "embeddings")
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    max_abs = F.greatest(
        F.array_max(F.transform(vec, lambda x: F.abs(x))), F.lit(1e-12)
    )
    scale = F.lit(127.0) / max_abs
    codes = F.transform(vec, lambda x: F.floor(x * F.col("_scale") + F.lit(0.5)))
    recon_err = F.array_max(
        F.zip_with(
            vec,
            F.col("_codes"),
            lambda x, q: F.abs(x - q.cast("double") / F.col("_scale")),
        )
    )
    return (
        e.withColumn("_scale", scale)
        .withColumn("_codes", codes)
        .select(
            "vec_id",
            F.round("_scale", 4).alias("scale"),
            F.concat_ws(
                ",",
                F.transform(F.slice("_codes", 1, 4), lambda c: c.cast("string")),
            ).alias("head_codes"),
            F.round(recon_err, 6).alias("max_err"),
        )
    )


QUERIES = {
    "q129_schema_evolution_union": q129_schema_evolution_union,
    "q130_snapshot_diff": q130_snapshot_diff,
    "q131_training_order": q131_training_order,
    "q132_token_budget_select": q132_token_budget_select,
    "q133_robust_outliers": q133_robust_outliers,
    "q134_sketch_rollup": q134_sketch_rollup,
    "q135_int8_quantization": q135_int8_quantization,
}

ORACLE = {
    "q129_schema_evolution_union": """
        WITH v1 AS (
            SELECT o_orderkey, ROUND(o_totalprice, 4) AS price
            FROM orders WHERE o_orderkey % 2 = 0
        ), v2 AS (
            SELECT o_orderkey, ROUND(o_totalprice, 4) AS price,
                   o_orderpriority AS priority
            FROM orders WHERE o_orderkey % 2 = 1
        )
        SELECT *, CASE WHEN priority IS NULL THEN 1 ELSE 2 END AS generation
        FROM (
            SELECT o_orderkey, price, NULL AS priority FROM v1
            UNION ALL BY NAME
            SELECT o_orderkey, price, priority FROM v2
        )
    """,
    "q130_snapshot_diff": """
        WITH base AS (
            SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 4) AS price
            FROM orders
        ), snap_a AS (
            SELECT * FROM base WHERE o_orderkey % 7 <> 0
        ), snap_b AS (
            SELECT o_orderkey, o_orderstatus,
                   CASE WHEN o_orderkey % 5 = 0 THEN ROUND(price * 1.1, 4)
                        ELSE price END AS price
            FROM base WHERE o_orderkey % 11 <> 0
        )
        SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS key,
               CASE WHEN a.o_orderkey IS NULL THEN 'inserted'
                    WHEN b.o_orderkey IS NULL THEN 'deleted'
                    ELSE 'updated' END AS change,
               COALESCE(b.o_orderstatus, a.o_orderstatus) AS o_orderstatus,
               a.price AS old_price,
               b.price AS new_price
        FROM snap_a a
        FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey
        WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
              OR a.o_orderstatus <> b.o_orderstatus OR a.price <> b.price
    """,
    "q131_training_order": """
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY md5('seed42:' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS INTEGER) AS position,
               md5('seed42:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        FROM documents
    """,
    "q132_token_budget_select": """
        WITH toked AS (
            SELECT doc_id, lang,
                   CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '')) AS INTEGER) AS n_tokens
            FROM documents
        ), running AS (
            SELECT doc_id, lang, n_tokens,
                   SUM(n_tokens) OVER (
                       PARTITION BY lang
                       ORDER BY n_tokens DESC, doc_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum_tokens
            FROM toked
        )
        SELECT doc_id, lang, CAST(n_tokens AS INTEGER) AS n_tokens,
               CAST(cum_tokens AS BIGINT) AS cum_tokens
        FROM running WHERE cum_tokens <= 20000
    """,
    "q133_robust_outliers": """
        WITH c AS (
            SELECT c_custkey, c_mktsegment, CAST(c_acctbal AS DOUBLE) AS bal
            FROM customer
        ), med AS (
            SELECT c_mktsegment, quantile_cont(bal, 0.5) AS seg_median
            FROM c GROUP BY c_mktsegment
        ), dev AS (
            SELECT c.*, med.seg_median, ABS(bal - seg_median) AS abs_dev
            FROM c JOIN med USING (c_mktsegment)
        ), mad AS (
            SELECT c_mktsegment, quantile_cont(abs_dev, 0.5) AS seg_mad,
                   ANY_VALUE(seg_median) AS seg_median
            FROM dev GROUP BY c_mktsegment
        ), fenced AS (
            SELECT d.c_custkey, d.c_mktsegment, d.abs_dev,
                   m.seg_median, m.seg_mad,
                   d.abs_dev / (1.4826 * m.seg_mad) AS robust_z,
                   ROW_NUMBER() OVER (
                       PARTITION BY d.c_mktsegment
                       ORDER BY d.abs_dev DESC, d.c_custkey ASC
                   ) AS _rk
            FROM dev d JOIN mad m USING (c_mktsegment)
        )
        SELECT c_mktsegment,
               ROUND(ANY_VALUE(seg_median), 4) AS seg_median,
               ROUND(ANY_VALUE(seg_mad), 4) AS seg_mad,
               CAST(SUM(CASE WHEN robust_z > 3.0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_outliers,
               ROUND(MAX(robust_z), 4) AS max_robust_z,
               MAX(CASE WHEN _rk = 1 THEN c_custkey END) AS top_custkey
        FROM fenced
        GROUP BY c_mktsegment
    """,
    "q134_sketch_rollup": """
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
               TRUE AS within_tol
        FROM events
        GROUP BY event_type
    """,
    "q135_int8_quantization": """
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
            FROM embeddings
        ), scaled AS (
            SELECT vec_id, vec,
                   127.0 / GREATEST(list_max(list_transform(vec, x -> ABS(x))),
                                    1e-12) AS scale
            FROM v
        ), coded AS (
            SELECT vec_id, vec, scale,
                   list_transform(vec, x -> CAST(FLOOR(x * scale + 0.5) AS BIGINT))
                       AS codes
            FROM scaled
        )
        SELECT vec_id,
               ROUND(scale, 4) AS scale,
               array_to_string(codes[1:4], ',') AS head_codes,
               ROUND(list_max(list_transform(
                   list_zip(vec, codes),
                   p -> ABS(p[1] - CAST(p[2] AS DOUBLE) / scale))), 6) AS max_err
        FROM coded
    """,
}
