"""Probe batch 15 (round 7) — two more canonical join-agg shapes.

The reference's users run ad-hoc analytical SQL over the loaded graph
through the embedded server (`pom.xml:104-108` [B]); q162/q163 pin
two more standard snowflake shapes beside q04/q43/q44 (TPC-H Q1/Q3/Q5
analogs): the returned-items customer report (Q10 shape) and the
bi-nation shipping-volume report (Q7 shape). Both follow the SCALE.md
join contract: fixed dims (nation: 25 rows at every SF) broadcast
hard; SF-GROWING sides (customer, supplier) go through the size-gated
broadcast_if_small (VERDICT r9 — a hard hint bypasses the planner's
size check and OOMs at the 100 TB north star), ONE big-big shuffle
(lineitem⋈orders), selective filters pushed to the parquet scan,
top-k as TakeOrderedAndProject, and the big-big exchange hinted
shuffle_hash (no sort on either side; the engine default stays SMJ —
see session.py note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biodwh2_arcadedb_server_spark.operators.skew import broadcast_if_small
from biodwh2_arcadedb_server_spark.sources.registry import load_table


def q162_tpch_q10_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-items report: top-20 customers by revenue on RETURNED
    line items. l_returnflag = 'R' reaches the lineitem scan
    (PushedFilters), customer/nation broadcast, the single shuffle is
    the lineitem⋈orders key exchange, and the top-20 never global-
    sorts (per-partition heaps + driver merge)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        l.where(F.col("l_returnflag") == "R")
        .join(o.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast_if_small(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(revenue, 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


def q163_tpch_q7_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bi-nation shipping volume: revenue between DIFFERENT supplier
    and customer nations per ship year. Two broadcast dims resolve
    both nation sides; lineitem⋈orders stays the one key shuffle; the
    inequality filter runs post-broadcast (no extra exchange)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        l.join(o.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast_if_small(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast_if_small(c), F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("supp_nation"),
            F.col("c_nationkey").alias("cust_nation"),
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(
            F.round(revenue, 4).alias("volume"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


QUERIES = {
    "q162_tpch_q10_shape": q162_tpch_q10_shape,
    "q163_tpch_q7_shape": q163_tpch_q7_shape,
}

ORACLE = {
    "q162_tpch_q10_shape": """
        SELECT c.c_custkey, c.c_name, n.n_name,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
    "q163_tpch_q7_shape": """
        SELECT s.s_nationkey AS supp_nation,
               c.c_nationkey AS cust_nation,
               CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS ship_year,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS volume,
               COUNT(*) AS n_lines
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE s.s_nationkey <> c.c_nationkey
        GROUP BY 1, 2, 3
    """,
}
