"""Physical-plan audits (SURVEY.md §4): verify that the declarative
plans actually compile to the physical strategies the 100 TB design
assumes — predicate pushdown into Parquet, column pruning, broadcast
joins for dimensions, whole-stage codegen coverage.

Used by tests/test_plans.py so a regression that silently de-optimizes
a plan (e.g. a cast blocking pushdown) fails CI, not the cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries across all scans in the plan."""
    plan = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of each scan's ReadSchema — the column-pruning audit."""
    plan = explain_str(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (more fused = fewer pipeline
    breaks; widening these is the JVM-side optimization loop).

    AQE wraps the plan in AdaptiveSparkPlan and hides codegen ids
    until runtime, so the audit plans with AQE disabled (physical
    planning happens lazily at first access) and counts the ``*(id)``
    markers.
    """
    spark = df.sparkSession
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    return len(set(re.findall(r"\*\((\d+)\)", plan)))
