"""Scale toolkit: salted join/agg must equal their unsalted forms, and
bucketed joins must eliminate the shuffle (no Exchange in the plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biodwh2_arcadedb_server_spark.operators.skew import salted_agg, salted_join
from biodwh2_arcadedb_server_spark.plans.audit import explain_str
from biodwh2_arcadedb_server_spark.sources.bucketing import bucketed_join, write_bucketed
from biodwh2_arcadedb_server_spark.sources.registry import load_table


def test_salted_join_equals_plain_join(spark, sf_small):
    # events.user_id is the (synthetic) hot key; orders keyed by o_custkey
    fact = load_table(spark, sf_small, "events").select("event_id", "user_id")
    dim = (
        load_table(spark, sf_small, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    salted = salted_join(fact, dim, key="user_id", disambiguator="event_id", salts=8)
    plain = fact.join(dim, "user_id")
    got = {(r.event_id, r.n_orders) for r in salted.collect()}
    want = {(r.event_id, r.n_orders) for r in plain.collect()}
    assert got == want and got


def test_salted_join_spreads_hot_key(spark):
    # one key carries 90% of rows; the salted fact side must land in >1
    # distinct (key, salt) shard
    rows = [(1, i) for i in range(900)] + [(k, 900 + k) for k in range(2, 102)]
    fact = spark.createDataFrame(rows, "k long, row_id long")
    from biodwh2_arcadedb_server_spark.operators.skew import _salt

    shards = (
        fact.withColumn("_salt", _salt(F.col("row_id"), 8))
        .where(F.col("k") == 1)
        .select("_salt")
        .distinct()
        .count()
    )
    assert shards == 8


def test_salted_agg_equals_plain_collect_list(spark, sf_small):
    e = load_table(spark, sf_small, "events").select("user_id", "event_id")
    got = {
        r.user_id: (r.values, r.n)
        for r in salted_agg(e, key="user_id", value="event_id", disambiguator="event_id").collect()
    }
    want = {
        r.user_id: (sorted(r.vals), r.n)
        for r in e.groupBy("user_id")
        .agg(F.collect_list("event_id").alias("vals"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {k: (list(v[0]), v[1]) for k, v in got.items()} == {
        k: (list(v[0]), v[1]) for k, v in want.items()
    }


def test_bucketed_join_has_no_exchange(spark, sf_small):
    # uses the session's default warehouse; tables dropped in finally
    try:
        c = load_table(spark, sf_small, "customer").select("c_custkey", "c_name")
        o = load_table(spark, sf_small, "orders").select(
            F.col("o_custkey").alias("c_custkey"), "o_orderkey"
        )
        write_bucketed(c, "b_customer", "c_custkey", 8)
        write_bucketed(o, "b_orders", "c_custkey", 8)
        joined = bucketed_join(spark, "b_customer", "b_orders", "c_custkey")
        # disable auto-broadcast so the join would otherwise shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = explain_str(joined)
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        assert "Exchange" not in plan, plan[:800]
        # and the result is the plain join
        assert joined.count() == c.join(o, "c_custkey").count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_customer")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bloom_prefilter_no_false_negatives_and_prunes(spark, sf_small):
    """Every true build-side key passes the sketch (no false
    negatives — guaranteed by construction, pinned here against the
    implementation), and the prefilter actually prunes the probe
    side (the sketch is doing work, not passing everything)."""
    from biodwh2_arcadedb_server_spark.operators.skew import (
        bloom_bits,
        bloom_might_contain,
    )

    o = load_table(spark, sf_small, "orders").where(F.col("o_totalprice") > 350000)
    keys = o.select("o_orderkey")
    bits = bloom_bits(keys, "o_orderkey")
    # no false negatives: every build key satisfies the predicate
    missed = keys.where(~bloom_might_contain(F.col("o_orderkey"), bits)).count()
    assert missed == 0
    # prunes: the probe side shrinks (rare build keys, 1024-bit sketch)
    li = load_table(spark, sf_small, "lineitem")
    total = li.count()
    kept = li.where(bloom_might_contain(F.col("l_orderkey"), bits)).count()
    true_hits = li.join(keys, li.l_orderkey == keys.o_orderkey, "left_semi").count()
    assert true_hits <= kept < total
