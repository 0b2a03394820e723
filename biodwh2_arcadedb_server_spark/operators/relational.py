"""Relational query surface (SURVEY.md §2.2 B1-B18, §2.4 probes 1-18).

The reference system's shipped query surface is the ArcadeDB SQL
dialect served over the loaded graph (`/root/reference/src/pom.xml:104-113`);
each probe here re-expresses one operator class as a declarative
DataFrame plan so Catalyst owns pushdown, pruning, join selection and
AQE re-planning. Every query carries a matching ANSI-SQL oracle
(``ORACLE``) that DuckDB executes over the same Parquet files; column
aliases are identical on both sides (driver hash-compares by column
name).

Scale notes are inline per query: the headline decisions are
broadcast-join for dimension tables, map-side partial aggregation
(automatic), and array math via JVM-side higher-order functions
(``aggregate``/``zip_with``) instead of Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from biodwh2_arcadedb_server_spark.operators.skew import broadcast_if_small
from biodwh2_arcadedb_server_spark.sources.registry import load_table


# --- probe 1: scan + project + filter (A3, A5, B1-B3) ---------------------
def q01_scan_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + projection; both reach the Parquet scan (PushedFilters,
    2-column ReadSchema) — verified in plans/audit."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.where((F.col("c_acctbal") > 0) & F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select("c_custkey", "c_name")
    )


# --- probe 2: id-remap equi-join (A11, B5 building block) ------------------
def q02_join_remap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's nodeId→RID hash-join (`ArcadeDBService.java:241-243`)
    as an equi-join. `customer` grows with scale factor, so the
    broadcast hint is SIZE-GATED (broadcast_if_small): under the
    session threshold it broadcasts and the fact side never shuffles;
    over it (the 100 TB posture — customer is ~10¹⁰ rows there) the
    join plans as a shuffle and AQE picks the runtime strategy. A hard
    hint would bypass the size check and OOM executors at scale
    (VERDICT r9)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(broadcast_if_small(c), o.o_custkey == c.c_custkey, "inner")
        .select("o_orderkey", "c_name")
    )


# --- probe 3: 2-hop expansion as join chain (B5) ---------------------------
def q03_two_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer→orders→lineitem expansion; the graph 2-hop is two
    equi-joins + hash agg. Join keys are the natural shuffle keys; the
    lineitem→orders join is the big one and shuffles once on
    l_orderkey/o_orderkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast_if_small(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- probe 4: TPC-H Q1-shape hash aggregate (B9) ---------------------------
def q04_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-agg groupBy; Spark does partial (map-side) + final agg
    automatically — the canonical scale-out aggregation."""
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- probe 5: distinct aggregate (B10) -------------------------------------
def q05_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.agg(F.countDistinct("o_custkey").alias("n_cust"))


# --- probe 6: top-k (B11) ---------------------------------------------------
def q06_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit compiles to TakeOrderedAndProject — per-partition
    heap + driver merge; no global sort even at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 4).alias("o_totalprice_r"))
    )


# --- probe 7: set operations (B12) ------------------------------------------
def q07_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").cast("long").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").cast("long").alias("nk"))
    u = c.union(s).distinct().select(F.lit("union").alias("op"), "nk")
    i = c.intersect(s).select(F.lit("intersect").alias("op"), "nk")
    e = c.subtract(s).select(F.lit("except").alias("op"), "nk")
    return u.unionAll(i).unionAll(e)


# --- probe 8: window / ranking (B11 analytic) --------------------------------
def q08_first_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


# --- probe 9: scalar functions — string/date/math (B14-B16) ------------------
def q09_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("pri_upper"),
        F.col("o_orderdate").cast("date").alias("odate"),
        F.round(F.col("o_totalprice") * 0.1, 4).alias("tithe"),
        F.round(F.sqrt("o_totalprice"), 4).alias("sq"),
        (F.col("o_orderkey") % 7).alias("k7"),
        F.length("o_orderstatus").alias("st_len"),
        F.substring("o_orderpriority", 1, 1).alias("pri1"),
    )


# --- probe 10: array math via higher-order functions (A7, B17) ---------------
def q10_array_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Squared L2 norm of each embedding with `aggregate` — stays in
    whole-stage codegen; no explode (explode would shuffle 64× rows)."""
    e = load_table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return e.select("vec_id", F.round(sq_sum, 4).alias("norm_sq"))


# --- probe 11: JSON extraction (B18) -----------------------------------------
def q11_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


# --- probe 12: exact dedup (C1) -----------------------------------------------
def q12_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").dropDuplicates()


# --- probe 13: cosine similarity top-k (C3) ------------------------------------
def q13_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine of query vector (vec_id=0) vs all, top-5.
    The query vector is a 1-row broadcast; dot/norms via zip_with +
    aggregate (JVM-side). At scale this is one pass over the table —
    the ANN variants live in operators/similarity.py."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    joined = e.crossJoin(F.broadcast(q))

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def norm(a):
        return F.sqrt(
            F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
        )

    sim = dot(F.col("embedding"), F.col("qe")) / (norm(F.col("embedding")) * norm(F.col("qe")))
    return (
        joined.select("vec_id", sim.alias("sim_raw"))
        .orderBy(F.col("sim_raw").desc(), "vec_id")
        .limit(5)
        .select("vec_id", F.round("sim_raw", 4).alias("sim"))
    )


# --- probe 14: text token counts (C4) --------------------------------------------
def q14_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("token")).where(
        F.col("token") != ""
    )
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(20)
    )


# --- probe 15: graph out-degree (C6) ----------------------------------------------
def q15_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-degree of customer nodes over the PLACED edge list (orders).
    Degree = groupBy(src).count — a single shuffle on the edge key."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_custkey").alias("node_id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )


# --- probe 16: tumbling time window, batch-checkable (C7) ---------------------------
def q16_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch shape of the streaming tumbling-window agg (the streaming
    twin lives in streaming/events.py and shares this exact plan)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


# --- probe 17: unique-index validation (A13) -----------------------------------------
def q17_unique_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference builds unique LSM indices (`ArcadeDBService.java:258-283`);
    Spark-side uniqueness is a validation query (expected empty)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .select("c_custkey", "n")
    )


# --- probe 18: rollup + grouping sets (B9 ext.) ----------------------------------------
def q18_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").alias("g_flag"),
            F.grouping("l_linestatus").alias("g_status"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "sum_qty", "n")
    )


QUERIES = {
    "q01_scan_filter": q01_scan_filter,
    "q02_join_remap": q02_join_remap,
    "q03_two_hop": q03_two_hop,
    "q04_tpch_q1": q04_tpch_q1,
    "q05_distinct_count": q05_distinct_count,
    "q06_topk": q06_topk,
    "q07_setops": q07_setops,
    "q08_first_order": q08_first_order,
    "q09_scalars": q09_scalars,
    "q10_array_norm": q10_array_norm,
    "q11_json": q11_json,
    "q12_dedup_exact": q12_dedup_exact,
    "q13_cosine_topk": q13_cosine_topk,
    "q14_token_counts": q14_token_counts,
    "q15_degree": q15_degree,
    "q16_tumbling_window": q16_tumbling_window,
    "q17_unique_validation": q17_unique_validation,
    "q18_rollup": q18_rollup,
}

ORACLE = {
    "q01_scan_filter": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_acctbal > 0 AND c_mktsegment IN ('BUILDING','AUTOMOBILE')
    """,
    "q02_join_remap": """
        SELECT o.o_orderkey, c.c_name
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    "q03_two_hop": """
        SELECT c.c_custkey, COUNT(*) AS n
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY c.c_custkey
    """,
    "q04_tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 4) AS sum_qty,
               ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               ROUND(AVG(l_extendedprice), 4) AS avg_price,
               ROUND(AVG(l_discount), 4) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q05_distinct_count": "SELECT COUNT(DISTINCT o_custkey) AS n_cust FROM orders",
    "q06_topk": """
        SELECT o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice_r
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "q07_setops": """
        SELECT 'union' AS op, nk FROM (
            SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer
            UNION SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
        UNION ALL
        SELECT 'intersect' AS op, nk FROM (
            SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer
            INTERSECT SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
        UNION ALL
        SELECT 'except' AS op, nk FROM (
            SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer
            EXCEPT SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
    """,
    "q08_first_order": """
        SELECT o_custkey, o_orderkey, o_orderdate FROM (
            SELECT o_custkey, o_orderkey, o_orderdate,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS rn
            FROM orders) WHERE rn = 1
    """,
    "q09_scalars": """
        SELECT o_orderkey,
               UPPER(o_orderpriority) AS pri_upper,
               CAST(o_orderdate AS DATE) AS odate,
               ROUND(o_totalprice * 0.1, 4) AS tithe,
               ROUND(SQRT(o_totalprice), 4) AS sq,
               o_orderkey % 7 AS k7,
               LENGTH(o_orderstatus) AS st_len,
               SUBSTRING(o_orderpriority, 1, 1) AS pri1
        FROM orders
    """,
    "q10_array_norm": """
        SELECT vec_id,
               ROUND(list_sum(list_transform(embedding,
                     v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), 4) AS norm_sq
        FROM embeddings
    """,
    "q11_json": """
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
    """,
    "q12_dedup_exact": "SELECT DISTINCT user_id, event_type FROM events",
    "q13_cosine_topk": """
        WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, ROUND(sim_raw, 4) AS sim FROM (
            SELECT vec_id,
                   list_sum(list_transform(list_zip(embedding, qe),
                         x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
                   / (SQRT(list_sum(list_transform(embedding,
                           v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
                      * SQRT(list_sum(list_transform(qe,
                           v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS sim_raw
            FROM embeddings, q)
        ORDER BY sim_raw DESC, vec_id LIMIT 5
    """,
    "q14_token_counts": """
        SELECT token, COUNT(*) AS cnt FROM (
            SELECT UNNEST(string_split_regex(LOWER(text), '\\s+')) AS token
            FROM documents)
        WHERE token <> ''
        GROUP BY token ORDER BY cnt DESC, token LIMIT 20
    """,
    "q15_degree": """
        SELECT o_custkey AS node_id, COUNT(*) AS out_degree
        FROM orders GROUP BY o_custkey
    """,
    "q16_tumbling_window": """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
               COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "q17_unique_validation": """
        SELECT c_custkey, COUNT(*) AS n FROM customer
        GROUP BY c_custkey HAVING COUNT(*) > 1
    """,
    "q18_rollup": """
        SELECT l_returnflag, l_linestatus,
               CAST(CASE WHEN GROUPING(l_returnflag) THEN 1 ELSE 0 END AS TINYINT) AS g_flag,
               CAST(CASE WHEN GROUPING(l_linestatus) THEN 1 ELSE 0 END AS TINYINT) AS g_status,
               ROUND(SUM(l_quantity), 4) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
}
