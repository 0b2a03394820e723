"""Per-probe core-scaling at sf1 (optimization r15, VERDICT r14 next
#6): at sf0.1 the whole batch suite is driver-/overhead-bound (8-core
total ≈ 32-core total), so executor-parallelism headroom can only be
tested at a larger SF. This runs the heavy probes whose inputs
genuinely scale (orders/lineitem/events/documents replicated 10x by
convergence.build_scaled, embeddings by sf1_probe.build_sf1_embeddings)
at the CURRENT core count and records wall + executor task/CPU time;
run it twice (SPARK_GRAFT_CPUS=32 and =8) and compare the JSONs.

Excluded by design: the quadratic exact contract legs (q26/q27/q28 —
their reference twins are O(n²) audit harnesses; the 10x corpus makes
them 100x, which measures the contract, not the operator), the
fixed-dim DML/DDL sequences (scale-independent by construction,
floor-documented), and the source-file/media probes (their fixtures
are not part of the scaled table set).

Usage:  SPARK_GRAFT_CPUS=32 python bench/sf1_scaling.py
        SPARK_GRAFT_CPUS=8  python bench/sf1_scaling.py
Writes bench/r15/sf1_scaling_c<cpus>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
os.environ.setdefault("SPARK_GRAFT_LOCAL_TUNING", "1")
os.environ.setdefault("SPARK_GRAFT_RETAINED_STAGES", "20000")

from biodwh2_arcadedb_server_spark.session import get_spark  # noqa: E402

import bench as bench_mod  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402
from convergence import build_scaled  # noqa: E402
from sf1_probe import build_sf1_embeddings  # noqa: E402

PROBES = [
    # relational join/agg heavyweights (lineitem/orders scale 10x)
    "q03_two_hop",
    "q44_tpch_q5_shape",
    "q163_tpch_q7_shape",
    "q98_bigram_lm_score",
    # graph (customer/order-derived edges scale with facts)
    "q22_connected_components",
    "q24_pagerank",
    "q83_personalized_pagerank",
    "q108_hits",
    "q97_shortest_path",
    "q126_sampled_closeness",
    # vectors (embeddings replicated 10x, perturbed)
    "q29_cosine_neardup",
    "q31_ann_topk",
    "q176_kmeans_embeddings",
    "q185_kmeans_parallel_assign",
    "q116_pq_topk",
    # text pipeline (documents replicated 10x, near-dup perturbed)
    "q32_token_stats",
    "q91_decontamination",
    "q109_boilerplate_removal",
    "q183_exact_substring_spans",
    "q197_bpe_span_char_removal",
]


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = build_scaled(10)
    build_sf1_embeddings(sf_dir)
    queries = entry_mod.queries()
    spark = get_spark(f"sf1_scaling_c{cpus}")
    meter = bench_mod.StageMeter(spark)

    # warmup at sf0.001: JIT/codegen out of the timed region
    for name in PROBES:
        try:
            queries[name](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:  # noqa: BLE001
            pass

    out: dict[str, dict] = {}
    for name in PROBES:
        walls, tasks, cpus_s = [], [], []
        for _rep in range(2):
            meter.mark()
            t0 = time.perf_counter()
            try:
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:  # noqa: BLE001
                out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
                break
            walls.append(round(time.perf_counter() - t0, 3))
            d = meter.delta() or (None, None)
            tasks.append(d[0])
            cpus_s.append(d[1])
        if walls:
            out[name] = {
                "wall_min": min(walls),
                "walls": walls,
                "task_min": min(t for t in tasks if t is not None)
                if any(t is not None for t in tasks) else None,
                "cpu_min": min(c for c in cpus_s if c is not None)
                if any(c is not None for c in cpus_s) else None,
            }
        print(f"c{cpus} {name:36s} {out[name]}", flush=True)

    path = os.path.join(HERE, "r15", f"sf1_scaling_c{cpus}.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump({"cpus": int(cpus), "sf_dir": sf_dir, "mult": 10,
                   "probes": out}, fh, indent=1)
    print(f"-> {path}")


if __name__ == "__main__":
    main()
