"""Temporal operators: the binned interval join must produce exactly
the pairs of the naive band join, and asof_join must agree with a
driver-side reference over deterministic random data."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from biodwh2_arcadedb_server_spark.operators.temporal import asof_join, interval_point_join


def _mk_intervals(spark, rng, n=50, max_len_days=30):
    rows = []
    base = dt.date(2020, 1, 1)
    for i in range(n):
        start = base + dt.timedelta(days=rng.randrange(0, 365))
        # includes zero-length and max-length intervals
        end = start + dt.timedelta(days=rng.choice([0, 1, 7, 29, 30]))
        rows.append((i, start, end))
    return spark.createDataFrame(rows, "ivl_id long, s date, e date")


def _mk_points(spark, rng, n=400):
    base = dt.date(2020, 1, 1)
    rows = [(i, base + dt.timedelta(days=rng.randrange(-10, 400))) for i in range(n)]
    return spark.createDataFrame(rows, "pt_id long, p date")


def test_interval_point_join_equals_naive_band_join(spark):
    rng = random.Random(7)
    ivl = _mk_intervals(spark, rng)
    pts = _mk_points(spark, rng)
    binned = {
        (r.ivl_id, r.pt_id)
        for r in interval_point_join(ivl, pts, "s", "e", "p", bin_days=30).collect()
    }
    naive = {
        (r.ivl_id, r.pt_id)
        for r in ivl.join(pts, (pts.p >= ivl.s) & (pts.p < ivl.e)).collect()
    }
    assert binned == naive
    assert naive  # non-degenerate fixture


def test_interval_point_join_no_duplicate_pairs(spark):
    rng = random.Random(11)
    ivl = _mk_intervals(spark, rng)
    pts = _mk_points(spark, rng)
    out = interval_point_join(ivl, pts, "s", "e", "p", bin_days=30)
    assert out.count() == out.dropDuplicates(["ivl_id", "pt_id"]).count()


def test_asof_join_matches_reference(spark):
    rng = random.Random(13)
    probes = [(i, i % 5, rng.randrange(0, 1000)) for i in range(60)]
    hist = [(j, j % 5, rng.randrange(0, 1000)) for j in range(300)]
    p_df = spark.createDataFrame(probes, "probe_id long, k long, pts long")
    h_df = spark.createDataFrame(hist, "hid long, k long, hts long")
    got = {
        r.probe_id: r.hid
        for r in asof_join(
            p_df, h_df, on="k", probe_key="probe_id", probe_ts="pts",
            hist_ts="hts", tie_break="hid",
        ).collect()
    }
    for pid, k, pts in probes:
        cands = [(hts, hid) for hid, hk, hts in hist if hk == k and hts < pts]
        want = max(cands)[1] if cands else None
        assert got[pid] == want, pid


def test_asof_join_unmatched_probe_kept_with_nulls(spark):
    p_df = spark.createDataFrame([(1, 9, 100)], "probe_id long, k long, pts long")
    h_df = spark.createDataFrame([(1, 9, 100)], "hid long, k long, hts long")  # not strictly before
    rows = asof_join(
        p_df, h_df, on="k", probe_key="probe_id", probe_ts="pts",
        hist_ts="hts", tie_break="hid",
    ).collect()
    assert len(rows) == 1 and rows[0].hid is None
