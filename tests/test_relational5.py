"""Pins for batch-5 probes without SQL oracles."""

from __future__ import annotations

from biodwh2_arcadedb_server_spark.operators import relational5
from biodwh2_arcadedb_server_spark.sources.registry import load_table


def test_approx_percentiles_error_bound(spark, sf_medium):
    """GK sketch with accuracy 10000 on a ~15k-row table: each
    reported quantile must sit within 1% rank error of exact."""
    import pyspark.sql.functions as F

    got = {
        r.o_orderstatus: r.approx_p50_p95
        for r in relational5.q89_approx_percentiles(spark, sf_medium).collect()
    }
    o = load_table(spark, sf_medium, "orders")
    for status, (p50, p95) in got.items():
        vals = sorted(
            r.o_totalprice
            for r in o.where(F.col("o_orderstatus") == status).select("o_totalprice").collect()
        )
        n = len(vals)
        for q, v in ((0.5, p50), (0.95, p95)):
            rank = sum(1 for x in vals if x <= v) / n
            assert abs(rank - q) <= 0.01 + 2 / n, (status, q, rank)
