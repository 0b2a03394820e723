"""Skew- and layout-aware join/aggregation utilities — the 100 TB
toolkit the north star mandates for every shuffle-bearing operator.

AQE (enabled in session.py) already splits skewed sort-merge
partitions at runtime; these utilities cover the cases AQE can't:

- ``salted_join``: a *hash-partition* hot key that overflows one task
  even after AQE splitting (e.g. one user with 10^9 events joined to
  a dimension). The fact side gets a deterministic salt derived from
  a high-cardinality disambiguator column; the dim side is exploded
  ×``salts``. Each (key, salt) shard shuffles independently, so the
  hot key spreads over ``salts`` tasks. Cost: dim side replicated
  ``salts``× (cheap — dims are the small side by construction).
- ``salted_agg``: two-phase aggregation for aggregates whose partial
  state is *large* (collect_list/collect_set — plain hash aggs
  already combine map-side and don't need this). Phase 1 aggregates
  (key, salt) shards; phase 2 merges shards per key. The hot key's
  state is built in ``salts`` parallel tasks instead of one.

Determinism: salts derive from ``xxhash64`` of a disambiguator
column, never ``rand()`` — reruns and retried tasks produce identical
shards (a rand() salt breaks task-retry idempotence AND oracle
replay).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(disambiguator: Column, salts: int) -> Column:
    return F.pmod(F.xxhash64(disambiguator), F.lit(salts)).cast("int")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    disambiguator: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``key`` with the fact side salted by
    ``xxhash64(disambiguator) % salts``. Result equals the plain join
    (tests pin set equality); the shuffle spreads each key over
    ``salts`` partitions."""
    f = fact.withColumn("_salt", _salt(F.col(disambiguator), salts))
    d = dim.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)).cast("array<int>")))
    out = f.join(d, [key, "_salt"], how)
    return out.drop("_salt")


def salted_agg(
    df: DataFrame,
    key: str,
    value: str,
    disambiguator: str,
    salts: int = 8,
) -> DataFrame:
    """collect_list per key via two-phase salted aggregation; returns
    (key, values: array, n: long) with ``values`` sorted for
    determinism. Equivalent to a direct groupBy().collect_list but the
    hot key's list is assembled in ``salts`` tasks."""
    phase1 = (
        df.withColumn("_salt", _salt(F.col(disambiguator), salts))
        .groupBy(key, "_salt")
        .agg(F.collect_list(value).alias("_part"), F.count(F.lit(1)).alias("_n"))
    )
    return (
        phase1.groupBy(key)
        .agg(
            F.array_sort(F.flatten(F.collect_list("_part"))).alias("values"),
            F.sum("_n").alias("n"),
        )
    )
