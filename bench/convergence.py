"""Floor-convergence experiment (VERDICT r2 #5): demonstrate, not
just argue, that the iterative graph / sketch probes' Spark-vs-DuckDB
gap is a fixed job-scheduling floor that amortizes as data grows.

The per-query bench audit annotates q108/q83/q24/q20/q60 as
"rounds × scheduling floor, converges at sf >= 1"; this script scales
the fact tables (orders, lineitem, events) 1x/3x/10x from sf0.1 —
key-offset replication, dims untouched, the same generator contract
the probes assume — and times BOTH engines at each scale. Expected
shape: DuckDB grows roughly linearly with the scan, Spark stays
near-flat (the 25-node iteration dominates, and its cost is rounds ×
floor, not rows), so the ratio falls toward/below the 2x gate.

Writes bench/convergence.json. Run:  python bench/convergence.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

import os as _os
_os.environ.setdefault("SPARK_GRAFT_LOCAL_TUNING", "1")
from biodwh2_arcadedb_server_spark.session import get_spark  # noqa: E402
from biodwh2_arcadedb_server_spark.sources.registry import TABLES, table_path  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
PROBES = ["q20_motif_2hop", "q24_pagerank", "q60_approx_distinct",
          "q83_personalized_pagerank", "q108_hits"]
# Text-pipeline probes whose audit claims "constant factor holds with
# scale" (q26/q91 are the two gap-annotated entries): verified by
# replicating documents with per-replica doc_id offsets AND a
# per-replica token appended to the text (so replicas are near- but
# not exact duplicates — pair structure stays realistic instead of
# exploding into clone cliques).
DOC_PROBES = ["q26_neardup_jaccard", "q91_decontamination", "q32_token_stats"]
# Fact tables replicated with key offsets; dims are shared as-is.
REPLICATED = {"orders": "o_orderkey", "lineitem": "l_orderkey", "events": None,
              "documents": "doc_id"}
KEY_OFFSET = 10_000_000  # > max orderkey at sf0.1; NOT a multiple of
# the nation-graph mod 97, so each replica contributes different edges


def build_scaled(mult: int, base: str = BASE_SF) -> str:
    """Materialize a mult-x copy of the sf0.1 tables under /tmp:
    orders/lineitem replicated with per-replica orderkey offsets
    (join validity preserved — both sides shift together), events
    replicated verbatim (distinct-user set unchanged: the q60 sketch
    answer is scale-invariant while the scan is mult-x), dims
    hardlinked untouched."""
    out = os.path.join(tempfile.gettempdir(), f"sfconv_x{mult}")
    if os.path.isdir(out):
        return out
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        src = table_path(base, t)
        dst = table_path(out, t)
        if t not in REPLICATED or mult == 1:
            shutil.copyfile(src, dst)
            continue
        import pyarrow.compute as pc

        tbl = pq.read_table(src)
        key = REPLICATED[t]
        writer = pq.ParquetWriter(dst, tbl.schema)
        try:
            for r in range(mult):
                if key is None or r == 0:
                    writer.write_table(tbl)
                    continue
                idx = tbl.schema.get_field_index(key)
                shifted = tbl.set_column(idx, key, pc.add(tbl.column(key), r * KEY_OFFSET))
                if t == "documents":
                    # near-dup, not exact-dup, replicas: one extra
                    # token shifts a couple of shingles per doc
                    tidx = shifted.schema.get_field_index("text")
                    perturbed = pc.binary_join_element_wise(
                        shifted.column("text").cast("string"),
                        pa.array([f"zz{r}"] * len(shifted), type=pa.string()),
                        " ",
                    )
                    shifted = shifted.set_column(
                        tidx, "text", perturbed.cast(shifted.schema.field("text").type)
                    )
                writer.write_table(shifted)
        finally:
            writer.close()
    return out


def time_spark(spark, fn, sf_dir: str, runs: int = 2) -> float:
    """min over runs: the first execution at a fresh dir pays page
    cache + footer reads; steady state is the honest per-plan cost."""
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def time_duckdb(sql: str, sf_dir: str, runs: int = 2) -> float:
    con = duckdb.connect()
    try:
        con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
        for t in TABLES:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{table_path(sf_dir, t)}')"
            )
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)
    finally:
        con.close()


# --- graph scaling (VERDICT r3 #6): scale the GRAPH, not the facts ------------
# The fact-scaling runs above hold the 25-node nation graph constant,
# so the iterative probes' ratio can only fall as far as DuckDB's scan
# growth pushes it. Here the graph itself is replicated (disjoint
# copies with id offsets + one bridge edge per replica so it stays one
# weak component): nodes 25*m, edges ~360*m. Both engines read the
# same edge parquet; DuckDB runs the SAME generated unrolled-CTE
# oracles (graph_sql override), so per-round arithmetic is identical.
GRAPH_MULTS = (1, 100, 10_000)
GRAPH_MULTS_PR_ONLY = (100_000,)  # ~36M edges / 2.5M nodes: pagerank only
_NODE_STRIDE = 32  # > 25 nation nodes, keeps replica ids disjoint


def build_scaled_graph(spark, mult: int) -> str:
    out = os.path.join(tempfile.gettempdir(), f"sfconv_graph_x{mult}.parquet")
    if os.path.exists(out):
        return out
    import numpy as np

    from biodwh2_arcadedb_server_spark.operators.graph_queries import nation_graph

    base = nation_graph(spark, BASE_SF, 97).toPandas()
    src = np.tile(base["src"].to_numpy(np.int64), mult)
    dst = np.tile(base["dst"].to_numpy(np.int64), mult)
    offs = np.repeat(np.arange(mult, dtype=np.int64) * _NODE_STRIDE, len(base))
    src = src + offs
    dst = dst + offs
    if mult > 1:
        bridge_dst = np.arange(1, mult, dtype=np.int64) * _NODE_STRIDE
        src = np.concatenate([src, bridge_dst - _NODE_STRIDE])
        dst = np.concatenate([dst, bridge_dst])
    pq.write_table(pa.table({"src": src, "dst": dst}), out)
    return out


def run_graph_scaling(spark, results: dict) -> None:
    from biodwh2_arcadedb_server_spark.operators.graph import hits, pagerank
    from biodwh2_arcadedb_server_spark.operators.graph_queries import (
        _hits_oracle,
        _pagerank_oracle,
    )

    reset = spark.createDataFrame([(0, 0.5), (1, 0.5)], "node_id long, reset double")
    for mult in GRAPH_MULTS + GRAPH_MULTS_PR_ONLY:
        path = build_scaled_graph(spark, mult)
        gsql = f"SELECT src, dst FROM read_parquet('{path}')"
        edges = spark.read.parquet(path)
        probes = {
            "graph_pagerank": (
                lambda e=edges: pagerank(e, iterations=10, damping=0.85),
                _pagerank_oracle(10, 0.85, None, graph_sql=gsql),
            ),
        }
        if mult not in GRAPH_MULTS_PR_ONLY:
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
            d = time_duckdb(sql, BASE_SF)
            entry = results.setdefault(name, {})
            entry[f"gx{mult}"] = {
                "nodes": 25 * mult,
                "edges_approx": 360 * mult,
                "spark_sec": s,
                "duckdb_sec": d,
                "ratio": round(s / d, 2) if d > 0 else None,
            }
            print(
                f"gx{mult} {name}: spark={s}s duckdb={d}s ratio={s/max(d,1e-9):.2f}",
                flush=True,
            )


def main() -> None:
    spark = get_spark("convergence")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    # warmup: pay JIT/codegen once outside the timed region
    for name in PROBES:
        queries[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    results: dict[str, dict] = {}
    for mult in (1, 10, 100):
        sf_dir = build_scaled(mult)
        # doc probes stop at 10x: at 100x the q26 verification join's
        # true-pair set itself is the workload (both engines), not the
        # constant factor under test
        for name in PROBES + (DOC_PROBES if mult <= 10 else []):
            s = time_spark(spark, queries[name], sf_dir)
            d = time_duckdb(oracles[name], sf_dir)
            entry = results.setdefault(name, {})
            entry[f"x{mult}"] = {
                "spark_sec": s,
                "duckdb_sec": d,
                "ratio": round(s / d, 2) if d > 0 else None,
            }
            print(f"x{mult} {name}: spark={s}s duckdb={d}s ratio={s/max(d,1e-9):.2f}",
                  flush=True)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "convergence.json")
    with open(out_path, "w") as f:
        json.dump({"base": BASE_SF, "multipliers": [1, 10, 100], "probes": results}, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
