"""Z-order layout: file-footer stats must let a 2-D box predicate
skip more files than a single-column sort — measured from the real
parquet footers, not assumed."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from biodwh2_arcadedb_server_spark.sources.layout import write_zordered, zorder_key
from biodwh2_arcadedb_server_spark.sources.registry import load_table

N_FILES = 8


def _file_ranges(path: str, col_a: str, col_b: str):
    """Per-file (min, max) of both columns from the parquet footers."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        mins, maxs = {}, {}
        for col in (col_a, col_b):
            ci = names[col]
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            mins[col], maxs[col] = lo, hi
        out.append((mins, maxs))
    return out


def _overlapping(ranges, col_a, lo_a, hi_a, col_b, lo_b, hi_b) -> int:
    n = 0
    for mins, maxs in ranges:
        if maxs[col_a] >= lo_a and mins[col_a] <= hi_a and maxs[col_b] >= lo_b and mins[col_b] <= hi_b:
            n += 1
    return n


def test_zorder_key_is_deterministic_and_monotone_on_axes(spark):
    df = spark.createDataFrame(
        [(0, 0), (0, 3), (3, 0), (3, 3)], ["x", "y"]
    )
    keyed = {(r.x, r.y): r._zkey for r in zorder_key(df, "x", "y", bits=2).collect()}
    # corners of the 2-bit grid: (0,0) lowest, (3,3) highest
    assert keyed[(0, 0)] == 0
    assert keyed[(3, 3)] == max(keyed.values())
    assert len(set(keyed.values())) == 4


def test_zorder_layout_skips_2d_box_better_than_single_sort(spark, sf_small, tmp_path):
    e = load_table(spark, sf_small, "events").select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("ts_s"), "value"
    )
    z_dir, s_dir = str(tmp_path / "zorder"), str(tmp_path / "bysort")
    write_zordered(e, z_dir, "user_id", "ts_s", n_files=N_FILES)
    (
        e.repartitionByRange(N_FILES, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(s_dir)
    )
    # both layouts hold identical rows
    assert (
        spark.read.parquet(z_dir).count() == spark.read.parquet(s_dir).count() == e.count()
    )

    stats = e.agg(
        F.min("user_id"), F.max("user_id"), F.min("ts_s"), F.max("ts_s")
    ).collect()[0]
    ulo, uhi, tlo, thi = stats
    # off-center 20% box on both dimensions (a dead-center box
    # straddles the curve's top-level split and overlaps every
    # segment when a dimension has few distinct values)
    box = lambda lo, hi: (lo + 0.1 * (hi - lo), lo + 0.3 * (hi - lo))
    bu, bt = box(ulo, uhi), box(tlo, thi)

    zr = _file_ranges(z_dir, "user_id", "ts_s")
    sr = _file_ranges(s_dir, "user_id", "ts_s")
    assert len(zr) == len(sr) == N_FILES
    # single-dimension predicates: the user-sorted layout prunes its
    # sort column perfectly but cannot skip AT ALL on ts; Z-order
    # prunes BOTH dimensions. That balanced guarantee — worst-case
    # over query dimensions — is the whole point of the curve.
    z_u = _overlapping(zr, "user_id", *bu, "ts_s", tlo, thi)
    s_u = _overlapping(sr, "user_id", *bu, "ts_s", tlo, thi)
    z_t = _overlapping(zr, "user_id", ulo, uhi, "ts_s", *bt)
    s_t = _overlapping(sr, "user_id", ulo, uhi, "ts_s", *bt)
    assert s_t == N_FILES  # single-column layout cannot skip on ts
    assert z_t < s_t  # z-order can
    assert z_u < N_FILES  # ... while still skipping on user too
    assert max(z_u, z_t) < max(s_u, s_t)
    # and the 2-D box still prunes under z-order
    assert _overlapping(zr, "user_id", *bu, "ts_s", *bt) < N_FILES


def test_zorder_3d_skips_on_every_dimension(spark, sf_small, tmp_path):
    """The N-dim Morton layout must let a single-dimension box skip
    files on ANY of the three clustered columns — the guarantee no
    single- or even two-column sort can give for the third column.
    `value` is skewed, so this runs the quantile (equal-mass)
    normalization; min/max normalization demonstrably fails on it
    (every file overlapped the value box when this test was first
    written)."""
    from biodwh2_arcadedb_server_spark.sources.layout import write_zordered_nd

    e = load_table(spark, sf_small, "events").select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("ts_s"), "value"
    )
    z_dir = str(tmp_path / "z3")
    cols = ["user_id", "ts_s", "value"]
    write_zordered_nd(e, z_dir, cols, n_files=N_FILES, bits=8, normalize="quantile")
    assert spark.read.parquet(z_dir).count() == e.count()

    # equal-MASS boxes (10th-30th percentile), matching the equal-mass
    # layout: a raw-span box can straddle the curve's median split on
    # a skewed column and touch every file through no fault of the key
    lo_hi = {}
    row = e.agg(
        *[
            F.expr(f"percentile({c}, array(0.1, 0.3))").alias(f"box_{c}")
            for c in cols
        ]
    ).collect()[0]
    for c in cols:
        lo_hi[c] = tuple(row[f"box_{c}"])

    files = sorted(glob.glob(os.path.join(z_dir, "part-*.parquet")))
    assert len(files) == N_FILES
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        mins, maxs = {}, {}
        for c in cols:
            ci = names[c]
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            mins[c], maxs[c] = lo, hi
        ranges.append((mins, maxs))

    for c in cols:
        blo, bhi = lo_hi[c]
        n_overlap = sum(
            1 for mins, maxs in ranges if maxs[c] >= blo and mins[c] <= bhi
        )
        assert n_overlap < N_FILES, f"no skipping on {c}"


def test_zorder_nd_key_bit_budget_guard(spark):
    df = spark.createDataFrame([(1, 2, 3, 4)], ["a", "b", "c", "d"])
    from biodwh2_arcadedb_server_spark.sources.layout import zorder_key_nd

    import pytest as _pytest

    with _pytest.raises(ValueError, match="overflows"):
        zorder_key_nd(df, ["a", "b", "c", "d"], bits=16)
    # 4 dims fit at 15 bits
    assert zorder_key_nd(df, ["a", "b", "c", "d"], bits=15).collect()[0]._zkey is not None


def _py_hilbert(order, x, y):
    d = 0
    for i in range(order - 1, -1, -1):
        s = 1 << i
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
    return d


def test_hilbert_key_matches_reference_and_is_a_curve(spark):
    """Spark Hilbert key == the reference walk on the full 8x8 grid;
    the reference itself is bijective with unit steps (verified
    inline), so transitively the Spark key inherits both."""
    from biodwh2_arcadedb_server_spark.sources.layout import _hilbert_d

    order = 3
    cells = {}
    for x in range(8):
        for y in range(8):
            cells[_py_hilbert(order, x, y)] = (x, y)
    assert len(cells) == 64
    for d in range(63):
        (x1, y1), (x2, y2) = cells[d], cells[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1

    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.h
        for r in df.select("x", "y", _hilbert_d(F.col("x"), F.col("y"), order).alias("h")).collect()
    }
    assert got == {(x, y): _py_hilbert(order, x, y) for x, y in rows}


def test_hilbert_layout_also_skips_on_both_dimensions(spark, sf_small, tmp_path):
    e = load_table(spark, sf_small, "events").select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("ts_s"), "value"
    )
    h_dir = str(tmp_path / "hilbert")
    write_zordered(e, h_dir, "user_id", "ts_s", n_files=N_FILES, curve="hilbert")
    assert spark.read.parquet(h_dir).count() == e.count()
    stats = e.agg(F.min("user_id"), F.max("user_id"), F.min("ts_s"), F.max("ts_s")).collect()[0]
    ulo, uhi, tlo, thi = stats
    box = lambda lo, hi: (lo + 0.1 * (hi - lo), lo + 0.3 * (hi - lo))
    bu, bt = box(ulo, uhi), box(tlo, thi)
    hr = _file_ranges(h_dir, "user_id", "ts_s")
    assert _overlapping(hr, "user_id", ulo, uhi, "ts_s", *bt) < N_FILES
    assert _overlapping(hr, "user_id", *bu, "ts_s", tlo, thi) < N_FILES
