"""Read-only gate for raw Spark SQL reaching ``spark.sql()``.

The reference serves its database **read-only** over HTTP
(`/root/reference/src/.../ArcadeDBService.java:81-105` grants the
``biodwh2`` user on an embedded database whose mutations happen only
through the ETL lifecycle, never the query endpoint). The Spark analog
routes dialect statements through ``arcadesql`` (which enforces the
``allow_writes`` gate itself), but plain Spark SQL text falls through
to ``spark.sql(...)`` — and Spark eagerly EXECUTES DDL/DML commands
there (``CREATE TABLE AS SELECT``, ``INSERT INTO … SELECT``,
``INSERT OVERWRITE DIRECTORY``, ``DROP TABLE`` …). A head-keyword
allowlist is not enough: ``WITH cte AS (…) INSERT INTO …`` hides a
write behind the read-shaped ``WITH`` head (round-7 ADVICE, high +
medium findings).

So the gate PARSES the statement (parse only — nothing executes) and
walks the logical-plan tree: any ``Command`` / ``ParsedStatement`` /
``InsertIntoDir`` node anywhere in the tree marks the statement as
write-shaped. Pure queries (Project/Filter/Aggregate/UnresolvedWith
over relations) contain none. ``SHOW``/``DESCRIBE``/``EXPLAIN`` parse
to Commands but cannot mutate anything, so those heads are allowed
outright.

Unparseable text passes the gate: ``spark.sql`` will raise the real
parse error, which is both the correct user message and safe — a
statement that does not parse cannot execute.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Heads that parse to Catalyst Commands but are harmless reads of
# catalog/plan metadata. EXPLAIN only *plans* its body statement.
_READ_COMMAND_HEADS = frozenset({"show", "describe", "desc", "explain"})

# Write-shaped plan nodes that are neither Command nor ParsedStatement
# subclasses (verified against Spark 4.x: InsertIntoDir is a bare
# UnaryNode).
_WRITE_NODE_NAMES = frozenset({"InsertIntoDir"})

_JCLASS_CACHE: dict[int, tuple] = {}


def _marker_classes(spark: SparkSession) -> tuple:
    """The JVM marker classes, resolved once per JVM."""
    key = id(spark._jvm)
    cached = _JCLASS_CACHE.get(key)
    if cached is None:
        forname = spark._jvm.java.lang.Class.forName
        cached = (
            forname("org.apache.spark.sql.catalyst.plans.logical.Command"),
            forname(
                "org.apache.spark.sql.catalyst.plans.logical.ParsedStatement"
            ),
        )
        _JCLASS_CACHE.clear()  # one JVM at a time; don't leak gateways
        _JCLASS_CACHE[key] = cached
    return cached


def _tree_has_write(plan, markers) -> bool:
    if any(cls.isInstance(plan) for cls in markers):
        return True
    if plan.getClass().getSimpleName() in _WRITE_NODE_NAMES:
        return True
    it = plan.children().iterator()
    while it.hasNext():
        if _tree_has_write(it.next(), markers):
            return True
    return False


def statement_is_read_only(spark: SparkSession, sql: str) -> bool:
    """True when running ``sql`` through ``spark.sql`` cannot mutate
    catalog, session, or storage state. Conservative: any Command
    node (CACHE, SET, CREATE VIEW, …) counts as a write unless the
    head is a known metadata read."""
    head = sql.lstrip().split(None, 1)
    head_kw = head[0].lower() if head else ""
    if head_kw in _READ_COMMAND_HEADS:
        return True
    try:
        plan = spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)
    except Exception:
        # does not parse → cannot execute; let spark.sql surface the
        # real parse error
        return True
    return not _tree_has_write(plan, _marker_classes(spark))
