"""Temporal join operators: as-of and interval(range) joins.

Neither exists in the reference's ArcadeDB SQL surface; they are the
standard temporal primitives a warehouse user expects (C-layer, north
star) and both are expressed as compositions of built-in DataFrame
ops so Catalyst/AQE keep choosing the physical strategy.

Scale design (100 TB):
- A naive point-in-interval join is a BroadcastNestedLoopJoin — every
  probe row evaluates the band predicate against every build row
  (O(n·m); measured 50s vs DuckDB's 1s IEJoin at sf0.1). The fix is
  **binning**: quantize time into buckets of >= the maximum interval
  width, explode each interval into the (few) buckets it overlaps,
  tag each point with its single bucket, and equi-join on the bucket
  before applying the exact band filter. The join becomes a hash join
  whose per-key fan-out is (interval density per bucket), independent
  of total table sizes — and it shuffles/broadcasts exactly like any
  other equi-join, so AQE skew handling still applies.
- As-of join: the equi key (entity id) is extracted so the plan is a
  hash/sort-merge join on the key; the band condition rides along as
  a join filter, and a per-probe window rank picks the latest match.
  For sorted bucketed history tables the known faster path is
  per-partition ``merge_asof`` via applyInPandas; the join+rank form
  stays whole-stage-codegen'd and needs no layout contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EPOCH = "1970-01-01"


def _day_number(col: Column) -> Column:
    return F.datediff(F.to_date(col), F.lit(EPOCH))


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    start: str,
    end: str,
    point: str,
    bin_days: int,
    how: str = "inner",
) -> DataFrame:
    """Join interval rows [start, end) to point rows on containment.

    ``bin_days`` must be >= the maximum interval length in days; each
    interval explodes into ceil(len/bin)+1 <= 2 bins, each point maps
    to exactly one bin, so a (interval, point) pair meets in exactly
    one bin — no post-join dedup needed. Returns all columns of both
    inputs.
    """
    s_day = _day_number(F.col(start))
    e_day = _day_number(F.col(end))
    bins = F.sequence(
        F.floor(s_day / bin_days),
        # end is exclusive: the last covered day is end-1
        F.floor((e_day - 1) / bin_days),
    )
    binned_intervals = intervals.withColumn("_bin", F.explode(bins))
    binned_points = points.withColumn("_bin", F.floor(_day_number(F.col(point)) / bin_days))
    cond = (
        (binned_intervals["_bin"] == binned_points["_bin"])
        & (binned_points[point] >= binned_intervals[start])
        & (binned_points[point] < binned_intervals[end])
    )
    return binned_intervals.join(binned_points, cond, how).drop("_bin")


def asof_join(
    probes: DataFrame,
    history: DataFrame,
    on: str,
    probe_key: str,
    probe_ts: str,
    hist_ts: str,
    tie_break: str,
    strict: bool = True,
) -> DataFrame:
    """For each probe row (uniquely keyed by ``probe_key``), the single
    latest history row of the same ``on`` key with ``hist_ts``
    (strictly) before ``probe_ts``; probes with no match keep NULL
    history columns. ``tie_break`` must be a unique history column —
    it makes equal-timestamp picks deterministic."""
    h = history
    for c in probes.columns:
        if c in h.columns and c != on:
            h = h.withColumnRenamed(c, f"_h_{c}")
    band = h[hist_ts] < probes[probe_ts] if strict else h[hist_ts] <= probes[probe_ts]
    joined = probes.join(h, (probes[on] == h[on]) & band, "left").drop(h[on])
    rn = F.row_number().over(
        Window.partitionBy(probe_key).orderBy(
            F.col(hist_ts).desc_nulls_last(), F.col(tie_break).desc_nulls_last()
        )
    )
    return joined.withColumn("_rn", rn).where(F.col("_rn") == 1).drop("_rn")
