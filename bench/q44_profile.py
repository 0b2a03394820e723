"""Stage-level attribution of the q44 (TPC-H Q5 shape) sf3 constant
factor (VERDICT r8 "next" #2).

Round 8 proved the big-big exchange is NOT the gap (bucketing deleted
it, wall time didn't move). This script names where the ~3s goes, two
ways:

1. **Leg decomposition** — run successively larger prefixes of the q44
   plan at sf3 (pruned scans → shuffle join → +broadcast probes →
   full agg), min-of-N each, fresh warmed session. The deltas bound
   each plan region's contribution. (Caveat noted in the JSON: the
   intermediate legs pay a noop-sink row-consume the full query's agg
   collapses away, so legs overstate slightly — they bound, not
   measure exactly.)

2. **Stage metrics** — run the full q44 with the Spark UI enabled and
   pull /api/v1/applications/{app}/stages: per-stage executorRunTime,
   input bytes, shuffle read/write. The scan/exchange/agg stages are
   distinguishable by their shuffle-write vs shuffle-read signatures.

Writes bench/q44_profile.json. Run: python bench/q44_profile.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_LOCAL_TUNING", "1")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from biodwh2_arcadedb_server_spark.sources.registry import load_table  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
SF3 = "/tmp/sfconv_x30"
UI_PORT = 4057
RUNS = 3


def get_profiling_spark() -> SparkSession:
    """Same tuning surface as session.get_spark but with the UI on so
    the REST stage metrics are scrapeable."""
    from biodwh2_arcadedb_server_spark import session as sess_mod

    os.environ["SPARK_GRAFT_UI"] = "1"  # no-op if unknown; explicit below
    n = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{n}]")
        .appName("q44_profile")
        .config("spark.sql.shuffle.partitions", n)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .getOrCreate()
    )


def legs(spark: SparkSession, sf_dir: str) -> dict:
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    join2 = l.join(o.hint("shuffle_hash"), l.l_orderkey == o.o_orderkey)
    join_all = (
        join2
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    full = join_all.groupBy("n_name").agg(F.round(revenue, 4).alias("revenue"))
    # agg directly on the 2-way join: isolates whether the broadcast
    # probes or the hash agg carry the cost
    agg_on_join2 = join2.groupBy("l_orderkey").agg(revenue.alias("rev"))
    return {
        "scan_lineitem_pruned": l,
        "scan_orders_pruned": o,
        "shuffle_join_l_o": join2,
        "agg_on_shuffle_join": agg_on_join2,
        "plus_broadcast_probes": join_all,
        "full_q44": full,
    }


def time_df(df) -> float:
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def stage_metrics() -> list[dict]:
    base = f"http://127.0.0.1:{UI_PORT}/api/v1"
    with urllib.request.urlopen(f"{base}/applications") as resp:
        apps = json.loads(resp.read())
    app_id = apps[0]["id"]
    with urllib.request.urlopen(
        f"{base}/applications/{app_id}/stages?status=complete"
    ) as resp:
        stages = json.loads(resp.read())
    out = []
    for st in stages:
        out.append({
            "stageId": st["stageId"],
            "name": st["name"].split("\n")[0][:90],
            "executorRunTime_ms": st["executorRunTime"],
            "executorCpuTime_ms": round(st["executorCpuTime"] / 1e6, 1),
            "inputBytes": st["inputBytes"],
            "inputRecords": st["inputRecords"],
            "shuffleWriteBytes": st["shuffleWriteBytes"],
            "shuffleReadBytes": st["shuffleReadBytes"],
            "numTasks": st["numTasks"],
        })
    return out


def main() -> None:
    if not os.path.isdir(SF3):
        from bench.convergence import build_scaled  # noqa: F401

        build_scaled(30)
    spark = get_profiling_spark()
    # warmup at sf0.001: pay JIT/codegen outside the timed region
    for df in legs(spark, "/root/testdata/sf0.001").values():
        df.write.format("noop").mode("overwrite").save()

    timings = {}
    for name, df in legs(spark, SF3).items():
        timings[name] = time_df(df)
        print(f"{name}: {timings[name]}s", flush=True)

    # fresh stage history for the metric scrape: one more full run in
    # the same session; keep only the stages that run created
    seen = {st["stageId"] for st in stage_metrics()}
    legs(spark, SF3)["full_q44"].write.format("noop").mode("overwrite").save()
    stages = [st for st in stage_metrics() if st["stageId"] not in seen]

    payload = {
        "sf3_rows": {"lineitem": 18_000_000, "orders": 6_000_000},
        "runs_min_of": RUNS,
        "leg_wall_sec": timings,
        "deltas_sec": {
            "scan_both": round(
                timings["scan_lineitem_pruned"] + timings["scan_orders_pruned"], 3
            ),
            "join_over_scans": round(
                timings["shuffle_join_l_o"]
                - timings["scan_lineitem_pruned"]
                - timings["scan_orders_pruned"],
                3,
            ),
            "broadcast_probes_over_join": round(
                timings["plus_broadcast_probes"] - timings["shuffle_join_l_o"], 3
            ),
            "agg_over_probes": round(
                timings["full_q44"] - timings["plus_broadcast_probes"], 3
            ),
        },
        "caveat": (
            "intermediate legs pay a noop-sink consume of the full row "
            "stream that the final agg collapses; deltas are upper bounds "
            "on each region's share"
        ),
        "full_q44_stages": stages,
    }
    out = os.path.join(HERE, "q44_profile.json")
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(f"-> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
