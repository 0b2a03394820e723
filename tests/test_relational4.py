"""Probe batch 4 locals: the HLL sketch's error bound (no SQL oracle)
and the UDTF extension surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from biodwh2_arcadedb_server_spark.operators.relational4 import (
    q60_approx_distinct,
    q61_udtf_sentences,
)
from biodwh2_arcadedb_server_spark.sources.registry import load_table


def test_approx_distinct_within_error_bound(spark, sf_medium):
    ev = load_table(spark, sf_medium, "events")
    approx = {
        r.event_type: r.a
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("a"))
        .collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        assert abs(approx[et] - n) / n <= 0.03, (et, approx[et], n)  # 3×rsd
    # the probe's tolerance contract: exact counts + a true flag
    rows = q60_approx_distinct(spark, sf_medium).collect()
    assert {r.event_type: r.exact_users for r in rows} == exact
    assert all(r.within_tol for r in rows)


def test_udtf_runs_as_python_table_function(spark, sf_medium):
    df = q61_udtf_sentences(spark, sf_medium)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "UDTF" in plan or "PythonUDTF" in plan  # the extension point, not an explode rewrite
    # every doc contributes a contiguous 0..k pos range
    rows = df.groupBy("doc_id").agg(F.min("pos").alias("lo"), F.max("pos").alias("hi"), F.count("*").alias("n")).collect()
    for r in rows:
        assert r.lo == 0 and r.n == r.hi + 1
