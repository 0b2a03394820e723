"""Z-order (Morton) clustering for multi-column data skipping.

Parquet scans skip files/row-groups whose min/max stats exclude the
predicate. A single-column sort gives tight stats on that column only;
interleaving the bits of several columns' normalized ranks (the
Z-order space-filling curve) gives *jointly* tight boxes, so a
predicate on ANY clustered column — or a box on several — prunes.
This is the layout move behind Delta/Iceberg `OPTIMIZE ZORDER BY`,
expressed here as plain DataFrame ops over vanilla parquet.

Scale notes:
- The z-key is pure per-row arithmetic after one tiny min/max
  aggregate (broadcast 1-row, the LET pattern) — no shuffle beyond
  the final range-partitioning sort Spark already does for a sorted
  write.
- ``repartitionByRange`` on the key + in-partition sort means each
  output file covers one compact Z-curve segment; file count scales
  with data volume, stats stay tight at any size.
- Skipping effectiveness is verified from real parquet footers in
  tests/test_layout.py (files whose stats overlap a box predicate),
  not assumed.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # bits per dimension; 2 dims -> 32-bit key


def _normalize_to_bits(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Scale a numeric column to an integer rank in [0, 2^bits)."""
    span = F.when(cmax > cmin, cmax - cmin).otherwise(F.lit(1))
    frac = (col.cast("double") - cmin) / span
    return F.least(
        F.greatest(F.floor(frac * ((1 << bits) - 1)).cast("long"), F.lit(0)),
        F.lit((1 << bits) - 1),
    )


def _interleave2(a: Column, b: Column, bits: int) -> Column:
    """Morton-interleave two ``bits``-wide integers: bit i of ``a``
    lands at 2i, of ``b`` at 2i+1. Unrolled shifts — whole-stage
    codegen folds this into straight-line long arithmetic."""
    def bit_at(c: Column, i: int, pos: int) -> Column:
        return F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), pos)

    terms = [bit_at(a, i, 2 * i) for i in range(bits)] + [
        bit_at(b, i, 2 * i + 1) for i in range(bits)
    ]
    return reduce(lambda x, y: x.bitwiseOR(y), terms)


def _hilbert_d(a: Column, b: Column, bits: int) -> Column:
    """Hilbert-curve index of (a, b) on the 2^bits grid — the classic
    xy→d bit walk (quadrant accumulate + rotate). Hilbert never jumps
    diagonally (adjacent indices are adjacent cells), so file boxes
    are tighter than Morton's at a few more ops per row.

    Expressed as an ``F.aggregate`` fold over the bit sequence, NOT a
    Python-side unroll: each rotation reads both prior x and y, so an
    unrolled tree doubles per round (2^bits expression nodes — a
    16-bit key froze the analyzer); the fold keeps the plan O(1) and
    loops at runtime."""
    seq = F.sequence(F.lit(bits - 1), F.lit(0), F.lit(-1))
    init = F.struct(
        a.cast("long").alias("x"), b.cast("long").alias("y"), F.lit(0).cast("long").alias("d")
    )

    def step(acc: Column, i: Column) -> Column:
        s = F.pow(F.lit(2.0), i.cast("double")).cast("long")
        rx = F.when(acc["x"].bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        ry = F.when(acc["y"].bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        d2 = acc["d"] + s * s * ((F.lit(3) * rx).bitwiseXOR(ry))
        flip = rx == 1
        nx = F.when(ry == 0, F.when(flip, s - 1 - acc["y"]).otherwise(acc["y"])).otherwise(acc["x"])
        ny = F.when(ry == 0, F.when(flip, s - 1 - acc["x"]).otherwise(acc["x"])).otherwise(acc["y"])
        return F.struct(nx.alias("x"), ny.alias("y"), d2.alias("d"))

    return F.aggregate(seq, init, step)["d"]


def zorder_key(
    df: DataFrame, col_a: str, col_b: str, bits: int = ZBITS, curve: str = "morton"
) -> DataFrame:
    """Append a ``_zkey`` column: the space-filling-curve index
    (``morton`` interleave or ``hilbert`` walk) of the two columns'
    normalized ranks. Column min/max ride as a broadcast 1-row
    aggregate — single job, no driver round-trip."""
    stats = df.agg(
        F.min(F.col(col_a).cast("double")).alias("_amin"),
        F.max(F.col(col_a).cast("double")).alias("_amax"),
        F.min(F.col(col_b).cast("double")).alias("_bmin"),
        F.max(F.col(col_b).cast("double")).alias("_bmax"),
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    ra = _normalize_to_bits(F.col(col_a), F.col("_amin"), F.col("_amax"), bits)
    rb = _normalize_to_bits(F.col(col_b), F.col("_bmin"), F.col("_bmax"), bits)
    if curve == "hilbert":
        key = _hilbert_d(ra, rb, bits)
    elif curve == "morton":
        key = _interleave2(ra, rb, bits)
    else:
        raise ValueError(f"unknown curve {curve!r} (morton|hilbert)")
    return with_stats.withColumn("_zkey", key).drop("_amin", "_amax", "_bmin", "_bmax")


def write_zordered(
    df: DataFrame,
    out_dir: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = ZBITS,
    curve: str = "morton",
) -> None:
    """Write ``df`` as parquet clustered along the space-filling
    curve of (col_a, col_b): range-partition by the curve key into
    ``n_files`` compact segments, sort within each, drop the key.
    Each output file then owns a tight (col_a, col_b) box in the
    footers, which is what scan-time skipping consumes."""
    keyed = zorder_key(df, col_a, col_b, bits, curve)
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
