"""Driver-contract probe batch 5: multiset set-ops, LET-style scalar
variables, and a regexp battery over document text.

Reference parity: ArcadeDB SQL's set operators keep duplicates unless
DISTINCT is requested, its `LET` clause binds per-query scalar
variables reused in projections and predicates, and its string
function set includes full regexp matching (pom.xml:104-108 [B],
SURVEY.md B12/B13/B14).

Scale notes (100 TB):
- INTERSECT ALL / EXCEPT ALL (q66) plan as a single shuffle on the
  compared columns with per-key multiplicity counters — no pairwise
  row matching. Same key-partitioning reused by both branches.
- LET scalars (q67) must NOT round-trip through the driver
  (`collect()` then re-literal) — that serializes the DAG into two
  jobs and blocks pipelining. A one-row aggregate cross-joined with
  `broadcast()` keeps the scalar inside the plan; Spark folds it into
  a BroadcastNestedLoopJoin with a 1-row build side (cost ~zero) and
  the whole query stays one job.
- The regexp battery (q68) is all JVM-side codegen (no Python);
  regexes compile once per task, not per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biodwh2_arcadedb_server_spark.sources.registry import load_table


# --- B12 ext.: multiset semantics (INTERSECT ALL / EXCEPT ALL) ----------------------
def q66_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation-key multisets of a customer slice vs suppliers, with
    duplicates preserved: rows in both (min multiplicity) and rows
    left over on the customer side (multiset difference)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") <= 500)
        .select(F.col("c_nationkey").alias("nk"))
    )
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    both = c.intersectAll(s).withColumn("tag", F.lit("both"))
    cust_only = c.exceptAll(s).withColumn("tag", F.lit("cust_only"))
    return both.unionAll(cust_only)


# --- B13 ext.: LET-style scalar variables (ArcadeDB `LET $avg = ...`) ----------------
def q67_let_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders priced above 1.5x the global average, with the bound
    scalar echoed in the projection — the `LET` pattern. The scalar
    stays inside the plan as a broadcast 1-row aggregate (single job;
    no driver collect-then-literal round trip)."""
    o = load_table(spark, sf_dir, "orders")
    avg_price = o.agg(F.avg("o_totalprice").alias("_avg"))
    return (
        o.crossJoin(F.broadcast(avg_price))
        .where(F.col("o_totalprice") > F.col("_avg") * 1.5)
        .select(
            "o_orderkey",
            F.round("o_totalprice", 4).alias("price"),
            F.round("_avg", 4).alias("avg_price"),
        )
    )


# --- B14 ext.: regexp battery on free text ------------------------------------------
def q68_regex_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count / extract-all / boolean-match / strip over document text —
    the regexp surface ArcadeDB's string functions serve, all
    JVM-codegen (regex compiled once per task)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(r"\btable\b")).alias("n_table"),
        F.array_join(
            F.regexp_extract_all("text", F.lit(r"\b(s\w+)\b"), F.lit(1)), "|"
        ).alias("s_words"),
        F.col("text").rlike("spark.*window|window.*spark").alias("has_both"),
        F.length(F.regexp_replace("text", r"\s+", "")).alias("n_nonspace"),
    )


# --- C7: end-to-end streaming ingest through the parquet sink ------------------------
def q69_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the events stream through the idempotent foreachBatch
    workspace sink (streaming/sinks.py), re-read the ingested parquet
    table, and aggregate — the oracle is the same aggregate over the
    batch events table, so the driver gate certifies exactly-once
    end-to-end delivery, not just plan shape."""
    import tempfile

    from biodwh2_arcadedb_server_spark.streaming.events import read_events_stream
    from biodwh2_arcadedb_server_spark.streaming.sinks import (
        read_workspace_events,
        stream_events_into_workspace,
    )

    base = tempfile.mkdtemp(prefix="q69_ingest_")
    stream = read_events_stream(spark, sf_dir, max_files_per_trigger=1)
    stream_events_into_workspace(stream, f"{base}/events", f"{base}/ckpt")
    got = read_workspace_events(spark, f"{base}/events")
    return got.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


# --- training-pipeline staple: deterministic hash split ------------------------------
def q70_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable 80/10/10 train/valid/test assignment from an md5 bucket
    of the key — a pure function of the row (no rand()), so the split
    is reproducible across engines and runs, and adding documents
    never reassigns existing ones. At 100 TB this is a narrow
    projection + scalar hash: no shuffle, no state."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    )
    return d.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "valid")
        .otherwise("test")
        .alias("split"),
    )


# --- training-pipeline staple: sharded greedy sequence packing -----------------------
PACK_SHARDS = 16
PACK_BUDGET = 4000  # chars per bin


def q71_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into ~budget-sized bins for LLM batch assembly:
    docs are sharded by key hash, each shard packs greedily in doc_id
    order (bin = floor(exclusive-prefix-sum / budget); a bin overflows
    by at most one doc). Sharding is the scale design — a single
    global ORDER BY window would serialize 100 TB through one
    partition, while P shards pack independently (window partition =
    shuffle partition) and bin ids stay globally unique via the shard
    prefix."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    shard = (F.col("doc_id") % PACK_SHARDS).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum("n_chars").over(w), F.lit(0))
    return (
        d.select("doc_id", "n_chars", shard)
        .withColumn(
            "bin_id",
            F.col("shard") * 1_000_000 + F.floor(prefix / PACK_BUDGET),
        )
        .select("doc_id", "n_chars", "bin_id")
    )


# --- training-pipeline staple: per-stratum deterministic sampling --------------------
SAMPLE_RATES = {"en": 0.5, "zh": 0.2, "es": 0.2, "de": 0.2, "fr": 0.2}


def q72_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-stratified Bernoulli sample at per-stratum rates,
    driven by the same md5 key bucket as q70 — deterministic, so the
    sample is stable across runs/engines and composes with the
    train/test split (disjoint hash prefixes would decorrelate them).
    Shuffle-free: a scalar hash + CASE per row."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("s:"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 1000
    )
    rate = F.coalesce(
        *[F.when(F.col("lang") == l, F.lit(int(r * 1000))) for l, r in SAMPLE_RATES.items()],
        F.lit(0),
    )
    return (
        d.select("doc_id", "lang", bucket.alias("bucket"), rate.alias("cut"))
        .where(F.col("bucket") < F.col("cut"))
        .select("doc_id", "lang", "bucket")
    )


# --- B18 ext.: JSON construct / parse round-trip -------------------------------------
def q78_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a JSON document from columns (to_json), parse it back
    with an explicit schema (from_json) and a path accessor
    (get_json_object) — the full B18 construct+parse surface. The
    oracle computes the same scalars directly: a correct round-trip
    is the identity, so any serialization/parsing defect breaks the
    hash match. All JVM-side (Jackson under codegen), no UDFs."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    doc = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("id"),
            F.col("o_orderstatus").alias("st"),
            F.array("o_totalprice").alias("vals"),
        )
    )
    parsed = F.from_json(doc, "id long, st string, vals array<double>")
    return o.select(
        "o_orderkey",
        parsed["st"].alias("st"),
        F.round(F.element_at(parsed["vals"], 1), 4).alias("v1"),
        F.get_json_object(doc, "$.st").alias("st_by_path"),
    )


# --- B11 ext.: rank-family window battery --------------------------------------------
def q79_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile / percent_rank / cume_dist /
    first_value per market segment, ordered by account balance —
    the rank-family half of the window surface (q48 covers
    lag/lead/frames)."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 300)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
        F.first("c_custkey").over(w).alias("top_cust"),
    )


# --- warehouse staple: column profiling ----------------------------------------------
def q82_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass profiling of the orders fact: row count, null count,
    min/max/avg/stddev per numeric column, distinct count of a
    low-cardinality column — the stats a catalog/optimizer collects.
    Single scan, partial aggregation map-side, one 1-row result."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0)).alias("null_dates"),
        F.round(F.min("o_totalprice"), 4).alias("min_price"),
        F.round(F.max("o_totalprice"), 4).alias("max_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
        F.countDistinct("o_orderstatus").alias("n_status"),
    )


# --- B17/B9 ext.: unpivot (wide → long) ----------------------------------------------
def q87_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt two customer measures into (metric, value) rows — the
    inverse of q51's pivot. Spark's native `unpivot` expands rows
    map-side (an Expand node, no shuffle, no UDF)."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 300)
    return c.select(
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    ).unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "value")


# --- warehouse staple: SCD2 dimension history ----------------------------------------
def q88_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing history from each customer's order
    stream: one validity interval per order, closed by the next
    order's date (lead window), open-ended for the latest. The MERGE
    INTO-free SCD2 emulation: per-key window, no self-join.

    The open-interval sentinel is 2261-12-31 (not the conventional
    9999-12-31): it must survive a round-trip through
    ``datetime64[ns]`` (max 2262-04-11) in pandas/Arrow comparison
    harnesses."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") <= 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        F.col("o_orderkey").alias("version_key"),
        F.col("o_orderdate").alias("valid_from"),
        F.coalesce(nxt, F.lit("2261-12-31").cast("date")).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


# --- B10/B15 at scale: quantile sketch (tolerance-contract oracle) -------------------
def q89_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna sketch quantiles of order prices per status —
    the only viable percentile at 100 TB (mergeable fixed-size
    partials; exact percentile_cont needs a per-group sort).

    Oracle strategy (tolerance contract): both the GK sketch and the
    exact interpolated percentile run in one aggregate; the probe
    emits the group key, row count, and per-quantile bound checks
    (|approx−exact|/exact ≤ 1% — generous vs GK's 1e-4 rank
    guarantee). DuckDB reproduces the count and asserts ``true``.
    tests/test_relational5.py keeps the tighter absolute pin."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", [0.5, 0.95], 10000).alias("_approx"),
        F.percentile("o_totalprice", F.lit([0.5, 0.95])).alias("_exact"),
        F.count(F.lit(1)).alias("n"),
    )
    def _tol(i: int) -> F.Column:
        a, x = F.element_at("_approx", i), F.element_at("_exact", i)
        return (F.abs(a - x) / F.greatest(x, F.lit(1.0))) <= 0.01
    return agg.select(
        "o_orderstatus",
        "n",
        _tol(1).alias("within_p50"),
        _tol(2).alias("within_p95"),
    )


QUERIES = {
    "q66_setops_all": q66_setops_all,
    "q67_let_scalars": q67_let_scalars,
    "q68_regex_battery": q68_regex_battery,
    "q69_stream_ingest": q69_stream_ingest,
    "q70_train_test_split": q70_train_test_split,
    "q71_sequence_packing": q71_sequence_packing,
    "q72_stratified_sample": q72_stratified_sample,
    "q78_json_roundtrip": q78_json_roundtrip,
    "q79_window_ranks": q79_window_ranks,
    "q82_profile_stats": q82_profile_stats,
    "q87_unpivot": q87_unpivot,
    "q88_scd2_history": q88_scd2_history,
    "q89_approx_percentiles": q89_approx_percentiles,
}

ORACLE = {
    "q66_setops_all": """
        SELECT nk, 'both' AS tag FROM (
            SELECT c_nationkey AS nk FROM customer WHERE c_custkey <= 500
            INTERSECT ALL
            SELECT s_nationkey FROM supplier
        )
        UNION ALL
        SELECT nk, 'cust_only' AS tag FROM (
            SELECT c_nationkey AS nk FROM customer WHERE c_custkey <= 500
            EXCEPT ALL
            SELECT s_nationkey FROM supplier
        )
    """,
    "q67_let_scalars": """
        SELECT o_orderkey,
               ROUND(o_totalprice, 4) AS price,
               ROUND((SELECT AVG(o_totalprice) FROM orders), 4) AS avg_price
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders) * 1.5
    """,
    "q68_regex_battery": r"""
        SELECT doc_id,
               len(regexp_extract_all(text, '\btable\b')) AS n_table,
               COALESCE(array_to_string(regexp_extract_all(text, '\b(s\w+)\b', 1), '|'), '') AS s_words,
               regexp_matches(text, 'spark.*window|window.*spark') AS has_both,
               length(regexp_replace(text, '\s+', '', 'g')) AS n_nonspace
        FROM documents WHERE doc_id < 300
    """,
    "q69_stream_ingest": """
        SELECT event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS sum_value
        FROM events
        GROUP BY event_type
    """,
    "q70_train_test_split": """
        SELECT doc_id,
               b AS bucket,
               CASE WHEN b < 80 THEN 'train'
                    WHEN b < 90 THEN 'valid'
                    ELSE 'test' END AS split
        FROM (
            SELECT doc_id,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
            FROM documents
        )
    """,
    "q71_sequence_packing": f"""
        SELECT doc_id, n_chars,
               (doc_id % {PACK_SHARDS!r}) * 1000000
                 + CAST(FLOOR(COALESCE(SUM(n_chars) OVER (
                       PARTITION BY doc_id % {PACK_SHARDS!r} ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     / {PACK_BUDGET!r}) AS BIGINT) AS bin_id
        FROM documents
    """,
    "q72_stratified_sample": f"""
        SELECT doc_id, lang, bucket FROM (
            SELECT doc_id, lang,
                   ('0x' || substr(md5('s:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 AS bucket,
                   CASE lang
                       WHEN 'en' THEN 500 WHEN 'zh' THEN 200 WHEN 'es' THEN 200
                       WHEN 'de' THEN 200 WHEN 'fr' THEN 200 ELSE 0 END AS cut
            FROM documents
        ) WHERE bucket < cut
    """,
}

ORACLE["q78_json_roundtrip"] = """
    SELECT o_orderkey,
           o_orderstatus AS st,
           ROUND(o_totalprice, 4) AS v1,
           o_orderstatus AS st_by_path
    FROM orders WHERE o_orderkey <= 2000
"""

ORACLE["q79_window_ranks"] = """
    SELECT c_custkey, c_mktsegment,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 4) AS cume,
           FIRST_VALUE(c_custkey) OVER w AS top_cust
    FROM customer WHERE c_custkey <= 300
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
"""

ORACLE["q82_profile_stats"] = """
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_dates,
           ROUND(MIN(o_totalprice), 4) AS min_price,
           ROUND(MAX(o_totalprice), 4) AS max_price,
           ROUND(AVG(o_totalprice), 4) AS avg_price,
           ROUND(STDDEV_SAMP(o_totalprice), 4) AS sd_price,
           COUNT(DISTINCT o_orderstatus) AS n_status
    FROM orders
"""

ORACLE["q87_unpivot"] = """
    SELECT c_custkey, 'acctbal' AS metric, CAST(c_acctbal AS DOUBLE) AS value
    FROM customer WHERE c_custkey <= 300
    UNION ALL
    SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value
    FROM customer WHERE c_custkey <= 300
"""

ORACLE["q88_scd2_history"] = """
    SELECT o_custkey,
           o_orderkey AS version_key,
           o_orderdate AS valid_from,
           COALESCE(LEAD(o_orderdate) OVER w, DATE '2261-12-31') AS valid_to,
           (LEAD(o_orderdate) OVER w) IS NULL AS is_current
    FROM orders WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

ORACLE["q89_approx_percentiles"] = """
    SELECT o_orderstatus,
           COUNT(*) AS n,
           TRUE AS within_p50,
           TRUE AS within_p95
    FROM orders GROUP BY o_orderstatus
"""
