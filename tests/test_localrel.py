"""Focused pins for the optimization-r14 internals that changed:

- ``localrel.local_df`` — the JVM json-literal replacement for
  ``spark.createDataFrame`` on small driver-local row lists. Parity
  is bit-exact for the JSON-safe lattice, and everything outside it
  must FALL BACK to ``createDataFrame`` (not silently coerce).
- ``similarity._bucketed`` — the one-pass LSH signature used by the
  rewritten ``ann_topk`` must produce bucket values identical to the
  reference ``random_hyperplane_signature`` it replaced (same
  candidate sets → same probe output).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from biodwh2_arcadedb_server_spark.localrel import local_df
from biodwh2_arcadedb_server_spark.operators import similarity
from biodwh2_arcadedb_server_spark.sources.registry import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scalar_parity(spark):
    rows = [
        (1, "a", 1.5, True, None),
        (None, None, None, None, 2),
        (-(2**62), "", -0.0, False, None),
    ]
    ddl = "i long, s string, d double, b boolean, j int"
    got = local_df(spark, rows, ddl)
    want = spark.createDataFrame(rows, ddl)
    assert got.schema == want.schema
    assert sorted(map(tuple, got.collect()), key=str) == sorted(
        map(tuple, want.collect()), key=str
    )


def test_nested_parity(spark):
    ddl = (
        "name string, fields array<struct<name string, type string>>, "
        "m map<string, long>"
    )
    rows = [
        ("x", [("f1", "string"), ("f2", None)], {"a": 1, "b": 2}),
        ("y", [], {}),
        ("z", None, None),
    ]
    got = local_df(spark, rows, ddl)
    want = spark.createDataFrame(rows, ddl)
    assert got.schema == want.schema
    assert sorted(got.collect(), key=str) == sorted(want.collect(), key=str)


def test_empty_rows(spark):
    got = local_df(spark, [], "a long, b string")
    assert got.schema == spark.createDataFrame([], "a long, b string").schema
    assert got.count() == 0


def test_single_row_no_python_rdd(spark):
    """The point of local_df: no pickled-Python-RDD scan in the plan."""
    df = local_df(spark, [("op", "lbl", 3)], "operation string, label string, count long")
    assert df.collect() == [("op", "lbl", 3)]
    assert "ExistingRDD" not in _plan(df)


def test_unsupported_type_falls_back(spark):
    import datetime

    rows = [(datetime.date(2024, 1, 2), 1)]
    ddl = "d date, i long"
    got = local_df(spark, rows, ddl)
    want = spark.createDataFrame(rows, ddl)
    assert got.collect() == want.collect()
    # the date fell outside the json lattice → createDataFrame path
    assert "ExistingRDD" in _plan(got)


def test_non_finite_float_falls_back(spark):
    rows = [(float("nan"),), (1.0,)]
    got = local_df(spark, rows, "x double")
    vals = [r.x for r in got.collect()]
    assert vals[1] == 1.0 or vals[0] == 1.0
    assert any(v != v for v in vals)  # NaN survived
    assert "ExistingRDD" in _plan(got)


def test_row_cap_falls_back(spark):
    rows = [(i,) for i in range(200)]
    got = local_df(spark, rows, "i long")
    assert got.count() == 200
    assert "ExistingRDD" in _plan(got)


def test_float_roundtrip_bit_exact(spark):
    import struct

    vals = [1e-300, 1.7976931348623157e308, 0.1 + 0.2, -2.5e-10]
    got = local_df(spark, [(v,) for v in vals], "x double").collect()
    for want, row in zip(vals, got):
        assert struct.pack("<d", row.x) == struct.pack("<d", want)


def test_bucketed_signature_parity(spark, sf_small):
    """One-pass LSH buckets == the per-table reference signature."""
    dim, n_planes, n_tables = 64, 4, 8
    e = load_table(spark, sf_small, "embeddings").limit(20)
    hps = similarity._hyperplane_lits(spark, dim, n_planes, n_tables)
    planes_lit = F.from_json(
        F.lit(json.dumps([h for tbl in hps for h in tbl])),
        "array<array<double>>",
    )
    got = {
        (r.qid, r.t): r.bucket
        for r in similarity._bucketed(
            e, "qid", "qe", "embedding", "vec_id", planes_lit, n_planes, n_tables
        ).collect()
    }
    for t in range(n_tables):
        want = {
            r.vec_id: r.sig
            for r in e.select(
                "vec_id",
                similarity.random_hyperplane_signature(
                    F.col("embedding"), dim, n_planes, table=t
                ).alias("sig"),
            ).collect()
        }
        for vid, sig in want.items():
            assert got[(vid, t)] == sig, (vid, t)


def test_hyperplane_lits_match_hyperplane_exprs(spark):
    """The memoized literal values are the _hyperplane expressions."""
    dim, n_planes, n_tables = 8, 3, 2
    similarity._HP_CACHE.clear()
    hps = similarity._hyperplane_lits(spark, dim, n_planes, n_tables)
    row = (
        spark.range(0, 1, 1, 1)
        .select(
            *[
                similarity._hyperplane(t, p, dim).alias(f"h_{t}_{p}")
                for t in range(n_tables)
                for p in range(n_planes)
            ]
        )
        .collect()[0]
    )
    for t in range(n_tables):
        for p in range(n_planes):
            assert hps[t][p] == list(row[f"h_{t}_{p}"])


def test_ann_topk_broadcast_gate_paths_identical(spark, sf_small):
    """VERDICT r14 #4: the ann_topk query-side broadcast is gated on
    the optimizer's size estimate; above the cap (or with the cap
    disabled) the hint is omitted and the planner joins however it
    likes. Both paths must return byte-identical rows."""
    e = load_table(spark, sf_small, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    key = "spark.graft.ann.broadcastQueryBytesCap"
    prev = spark.conf.get(key, None)
    try:
        spark.conf.set(key, str(64 << 20))
        hinted = sorted(
            map(tuple, similarity.ann_topk(e, q, k=3, dim=64, n_planes=4,
                                           n_tables=4).collect())
        )
        spark.conf.set(key, "0")  # disable the hint: planner's choice
        unhinted = sorted(
            map(tuple, similarity.ann_topk(e, q, k=3, dim=64, n_planes=4,
                                           n_tables=4).collect())
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert hinted == unhinted
    assert hinted  # non-trivial
