"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2, one
callable (spark, sf_dir) -> DataFrame per entry.
``oracle_sql()`` — DuckDB-runnable ANSI SQL twin per entry (omitted
for genuinely non-SQL-expressible operators → rows-only check).
"""

from __future__ import annotations

import json
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from biodwh2_arcadedb_server_spark.operators import (
    dialect_queries,
    graph_queries,
    pipeline_queries,
    pipeline_queries2,
    pipeline_queries3,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    relational6,
    relational7,
    relational8,
)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 2-hop graph expansion (customer→orders→lineitem) with
    aggregation — exercises scan, broadcast join, shuffle join, and
    hash agg in one plan."""
    return relational.q03_two_hop(spark, SF0001)


# The driver verifies the first ~50 registry entries in insertion
# order. With 124 registered probes, PRIORITY is COMPUTED from the
# CORRECTNESS_r*.json history (VERDICT r2 "next" #8) so no probe goes
# stale: (1) previously-red oracled probes (regressions to re-verify
# after their fixes), (2) never-driver-checked probes with an oracle,
# (3) never-checked rows-only probes, (4) everything else, stalest
# last-checked round first. Ties keep registry insertion order.
def _compute_priority(
    pooled_names: list[str], oracled: set[str], history_dir: Path | None = None
) -> list[str]:
    here = history_dir or Path(__file__).resolve().parent
    history: dict[str, tuple[int, bool]] = {}  # probe -> (last round, green)
    for path in sorted(here.glob("CORRECTNESS_r*.json")):
        try:
            rnd = int(path.stem.split("_r")[-1])
            data = json.loads(path.read_text())
        except (ValueError, json.JSONDecodeError):
            continue
        for name, row in data.items():
            green = bool(row.get("hash_match")) or (
                row.get("err") == "no_oracle" and bool(row.get("rows_match"))
            )
            hash_checked = row.get("hash_match") is not None
            history[name] = (rnd, green, hash_checked)
    order = {n: i for i, n in enumerate(pooled_names)}

    def tier(name: str) -> tuple:
        rec = history.get(name)
        if rec is not None and not rec[1] and name in oracled:
            return (0, order[name])  # red with oracle: regression fix first
        if rec is None and name in oracled:
            return (1, order[name])  # never checked, oracled
        if rec is not None and name in oracled and not rec[2]:
            # oracled NOW but only ever rows-only-checked (a converted
            # tolerance-contract probe): hash-verify it like new
            return (1, order[name])
        if rec is None:
            return (2, order[name])  # never checked, rows-only
        return (3, rec[0], order[name])  # stalest green first

    return sorted(pooled_names, key=tier)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    pooled: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    pooled.update(relational.QUERIES)
    pooled.update(relational2.QUERIES)
    pooled.update(relational3.QUERIES)
    pooled.update(relational4.QUERIES)
    pooled.update(relational5.QUERIES)
    pooled.update(relational6.QUERIES)
    pooled.update(relational7.QUERIES)
    pooled.update(relational8.QUERIES)
    pooled.update(graph_queries.QUERIES)
    pooled.update(pipeline_queries.QUERIES)
    pooled.update(pipeline_queries2.QUERIES)
    pooled.update(pipeline_queries3.QUERIES)
    pooled.update(dialect_queries.QUERIES)
    oracled = set(oracle_sql())
    priority = _compute_priority(list(pooled), oracled)
    return {name: pooled[name] for name in priority}


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(relational.ORACLE)
    out.update(relational2.ORACLE)
    out.update(relational3.ORACLE)
    out.update(relational4.ORACLE)
    out.update(relational5.ORACLE)
    out.update(relational6.ORACLE)
    out.update(relational7.ORACLE)
    out.update(relational8.ORACLE)
    out.update(graph_queries.ORACLE)
    out.update(pipeline_queries.ORACLE)
    out.update(pipeline_queries2.ORACLE)
    out.update(pipeline_queries3.ORACLE)
    out.update(dialect_queries.ORACLE)
    return out
