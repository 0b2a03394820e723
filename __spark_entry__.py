"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2, one
callable (spark, sf_dir) -> DataFrame per entry.
``oracle_sql()`` — DuckDB-runnable ANSI SQL twin per entry (omitted
for genuinely non-SQL-expressible operators → rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from biodwh2_arcadedb_server_spark.operators import (
    graph_queries,
    pipeline_queries,
    pipeline_queries2,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 2-hop graph expansion (customer→orders→lineitem) with
    aggregation — exercises scan, broadcast join, shuffle join, and
    hash agg in one plan."""
    return relational.q03_two_hop(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(relational.QUERIES)
    out.update(relational2.QUERIES)
    out.update(relational3.QUERIES)
    out.update(relational4.QUERIES)
    out.update(relational5.QUERIES)
    out.update(graph_queries.QUERIES)
    out.update(pipeline_queries.QUERIES)
    out.update(pipeline_queries2.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(relational.ORACLE)
    out.update(relational2.ORACLE)
    out.update(relational3.ORACLE)
    out.update(relational4.ORACLE)
    out.update(relational5.ORACLE)
    out.update(graph_queries.ORACLE)
    out.update(pipeline_queries.ORACLE)
    out.update(pipeline_queries2.ORACLE)
    return out
