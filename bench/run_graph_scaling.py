"""Run the graph-scaling section of the convergence study with
incremental persistence (each probe's result lands in
bench/convergence.json as soon as it is measured).

Usage: python bench/run_graph_scaling.py [mult ...]
Defaults to 1 100 10000. Pagerank-only at mults >= 100000.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import os as _os
_os.environ.setdefault("SPARK_GRAFT_LOCAL_TUNING", "1")
from biodwh2_arcadedb_server_spark.session import get_spark  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "convergence.json")


def persist(name: str, key: str, rec: dict) -> None:
    with open(OUT) as f:
        data = json.load(f)
    gs = data.setdefault("graph_scaling", {})
    gs.setdefault(name, {})[key] = rec
    data["graph_scaling_note"] = (
        "graph replicated m-x (25m nodes, ~360m+m-1 edges, bridged into one "
        "weak component); both engines read the same edge parquet and run "
        "identical unrolled per-round arithmetic"
    )
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)


def main() -> None:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "conv", os.path.join(HERE, "convergence.py")
    )
    conv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(conv)

    from biodwh2_arcadedb_server_spark.operators.graph import hits, pagerank
    from biodwh2_arcadedb_server_spark.operators.graph_queries import (
        _hits_oracle,
        _pagerank_oracle,
    )

    mults = [int(a) for a in sys.argv[1:]] or [1, 100, 10_000]
    spark = get_spark("graphscale")
    reset = spark.createDataFrame([(0, 0.5), (1, 0.5)], "node_id long, reset double")
    for mult in mults:
        path = conv.build_scaled_graph(spark, mult)
        gsql = f"SELECT src, dst FROM read_parquet('{path}')"
        edges = spark.read.parquet(path)
        probes = {
            "graph_pagerank": (
                lambda e=edges: pagerank(e, iterations=10, damping=0.85),
                _pagerank_oracle(10, 0.85, None, graph_sql=gsql),
            ),
        }
        if mult >= 100_000 and os.environ.get("GS_INCLUDE_HITS"):
            # HITS-only pass at the top scale (pagerank already has
            # its gx100000 point; one probe fits the run budget)
            probes = {
                "graph_hits": (
                    lambda e=edges: hits(e, iterations=10),
                    _hits_oracle(10, graph_sql=gsql),
                )
            }
        if mult < 100_000:
            probes["graph_hits"] = (
                lambda e=edges: hits(e, iterations=10),
                _hits_oracle(10, graph_sql=gsql),
            )
            probes["graph_ppr"] = (
                lambda e=edges, r=reset: pagerank(
                    e, iterations=10, damping=0.85, reset=r
                ),
                _pagerank_oracle(10, 0.85, {0: 0.5, 1: 0.5}, graph_sql=gsql),
            )
        for name, (fn, sql) in probes.items():
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            s = round(best, 3)
            d = conv.time_duckdb(sql, conv.BASE_SF)
            rec = {
                "nodes": 25 * mult,
                "edges_approx": 360 * mult,
                "spark_sec": s,
                "duckdb_sec": d,
                "ratio": round(s / d, 2) if d > 0 else None,
            }
            persist(name, f"gx{mult}", rec)
            print(f"gx{mult} {name}: spark={s}s duckdb={d}s ratio={s/max(d,1e-9):.2f}", flush=True)


if __name__ == "__main__":
    main()
