"""Pins for batch-5 probes without SQL oracles."""

from __future__ import annotations

from biodwh2_arcadedb_server_spark.operators import relational5
from biodwh2_arcadedb_server_spark.sources.registry import load_table


def test_approx_percentiles_error_bound(spark, sf_medium):
    """GK sketch with accuracy 10000 on a ~15k-row table: each
    reported quantile must sit within 1% rank error of exact."""
    import pyspark.sql.functions as F

    o = load_table(spark, sf_medium, "orders")
    got = {
        r.o_orderstatus: r.a
        for r in o.groupBy("o_orderstatus")
        .agg(F.percentile_approx("o_totalprice", [0.5, 0.95], 10000).alias("a"))
        .collect()
    }
    for status, (p50, p95) in got.items():
        vals = sorted(
            r.o_totalprice
            for r in o.where(F.col("o_orderstatus") == status).select("o_totalprice").collect()
        )
        n = len(vals)
        for q, v in ((0.5, p50), (0.95, p95)):
            rank = sum(1 for x in vals if x <= v) / n
            assert abs(rank - q) <= 0.01 + 2 / n, (status, q, rank)
    # the probe's tolerance contract: group counts + true flags
    rows = relational5.q89_approx_percentiles(spark, sf_medium).collect()
    assert all(r.within_p50 and r.within_p95 for r in rows)
