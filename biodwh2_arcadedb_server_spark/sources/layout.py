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


def _interleave_nd(cols: list[Column], bits: int) -> Column:
    """Morton-interleave N ``bits``-wide integers: bit i of column j
    lands at position i·N + j. Unrolled shifts — whole-stage codegen
    folds this into straight-line long arithmetic (N·bits OR terms).
    The key must fit a signed long: N·bits ≤ 62."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError(
            f"{n} dims x {bits} bits = {n * bits}-bit key overflows a signed long; "
            f"lower bits to <= {62 // n}"
        )

    def bit_at(c: Column, i: int, pos: int) -> Column:
        return F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), pos)

    terms = [
        bit_at(c, i, i * n + j) for j, c in enumerate(cols) for i in range(bits)
    ]
    return reduce(lambda x, y: x.bitwiseOR(y), terms)


def _interleave2(a: Column, b: Column, bits: int) -> Column:
    """Morton-interleave two ``bits``-wide integers (N=2 special case
    kept for call-site clarity)."""
    return _interleave_nd([a, b], bits)


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


def zorder_key_nd(
    df: DataFrame,
    cols: list[str],
    bits: int = ZBITS,
    curve: str = "morton",
    normalize: str = "minmax",
) -> DataFrame:
    """Append a ``_zkey`` column: the space-filling-curve index of the
    N columns' normalized ranks (``morton`` for any N; ``hilbert`` is
    the 2-dim walk only). Per-column stats ride as ONE broadcast 1-row
    aggregate regardless of N — single job, no driver round-trip.

    ``normalize``:
    - ``"minmax"`` — linear scaling between the column's min and max.
      Cheap, but a skewed column (one large outlier, log-normal mass)
      crams most rows into a few ranks and that dimension stops
      skipping.
    - ``"quantile"`` — equal-MASS bins from a one-pass
      ``approx_percentile`` sketch: rank = #bin-edges ≤ value, so
      every rank holds ~the same row count no matter the shape of the
      distribution (what production OPTIMIZE ZORDER BY does). The
      per-row cost is an O(2^bits) filter over the broadcast edge
      array — use modest ``bits`` (≤ 8; 256 bins ≫ any file count)
      in this mode.

    Practical N: skipping power per dimension decays as each column
    gets bits/N of the key's selectivity — 2-4 columns is the sweet
    spot (the same guidance Delta/Iceberg give for ZORDER BY)."""
    if len(cols) < 2:
        raise ValueError("zorder needs at least 2 columns")
    if normalize == "quantile" and bits > 10:
        raise ValueError("quantile normalization: use bits <= 10 (per-row cost is O(2^bits))")
    aggs = []
    for j, c in enumerate(cols):
        if normalize == "minmax":
            aggs.append(F.min(F.col(c).cast("double")).alias(f"_min{j}"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"_max{j}"))
        elif normalize == "quantile":
            n_bins = 1 << bits
            qs = F.array(*[F.lit(k / n_bins) for k in range(1, n_bins)])
            aggs.append(
                F.percentile_approx(F.col(c).cast("double"), qs, 10_000).alias(f"_edges{j}")
            )
        else:
            raise ValueError(f"unknown normalize {normalize!r} (minmax|quantile)")
    with_stats = df.crossJoin(F.broadcast(df.agg(*aggs)))
    if normalize == "minmax":
        ranks = [
            _normalize_to_bits(F.col(c), F.col(f"_min{j}"), F.col(f"_max{j}"), bits)
            for j, c in enumerate(cols)
        ]
    else:
        def _qrank(j: int, c: str) -> Column:
            x = F.col(c).cast("double")
            return F.size(F.filter(F.col(f"_edges{j}"), lambda e: e <= x)).cast("long")

        ranks = [_qrank(j, c) for j, c in enumerate(cols)]
    if curve == "hilbert":
        if len(cols) != 2:
            raise ValueError("hilbert curve is 2-dim; use morton for N > 2")
        key = _hilbert_d(ranks[0], ranks[1], bits)
    elif curve == "morton":
        key = _interleave_nd(ranks, bits)
    else:
        raise ValueError(f"unknown curve {curve!r} (morton|hilbert)")
    if normalize == "minmax":
        drop = [f"_min{j}" for j in range(len(cols))] + [f"_max{j}" for j in range(len(cols))]
    else:
        drop = [f"_edges{j}" for j in range(len(cols))]
    return with_stats.withColumn("_zkey", key).drop(*drop)


def zorder_key(
    df: DataFrame, col_a: str, col_b: str, bits: int = ZBITS, curve: str = "morton"
) -> DataFrame:
    """2-column form of :func:`zorder_key_nd` (original surface)."""
    return zorder_key_nd(df, [col_a, col_b], bits, curve)


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
    write_zordered_nd(df, out_dir, [col_a, col_b], n_files, bits, curve)


def write_zordered_nd(
    df: DataFrame,
    out_dir: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = ZBITS,
    curve: str = "morton",
    normalize: str = "minmax",
) -> None:
    """N-column :func:`write_zordered`: each output file owns a tight
    N-dim box in the footers. With the default 16 bits, up to 3
    columns fit the signed-long key; pass ``bits=15`` for 4. Use
    ``normalize="quantile"`` (with small bits, e.g. 8) when any
    clustered column is skewed."""
    keyed = zorder_key_nd(df, cols, bits, curve, normalize)
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
