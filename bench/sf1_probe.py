"""One real sf1 data point (VERDICT r3 stretch #10): time headline
probes end-to-end at 10x the sf0.1 fact volume so the scale argument
stops extrapolating. Reuses convergence.py's build_scaled(10)
(orders/lineitem/events/documents replicated with key offsets, dims
shared) and additionally replicates embeddings 10x with a
deterministic per-replica perturbation (pure scaling would leave
cosine invariant and every replica an exact dup — perturbation keeps
the near-dup pair structure realistic).

Probes: q03 (join-agg), q29 (blocked-matmul cosine pairs), q104
(leakage-safe split over the near-dup closure; Spark side only — the
DuckDB recursive-CTE closure at this pair volume is the known q106
pathology and would measure DuckDB's CTE executor, not our plan).

Writes bench/sf1.json. Run: python bench/sf1_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from biodwh2_arcadedb_server_spark.session import get_spark  # noqa: E402
from biodwh2_arcadedb_server_spark.sources.registry import table_path  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "sf1.json")
MULT = 10
VEC_OFFSET = 10_000_000


def build_sf1_embeddings(sf_dir: str) -> None:
    """Replicate embeddings MULT-x with id offsets + deterministic
    per-replica perturbation (~1% of one dimension per replica)."""
    dst = table_path(sf_dir, "embeddings")
    src = table_path("/root/testdata/sf0.1", "embeddings")
    base = pq.read_table(src)
    if pq.read_metadata(dst).num_rows > base.num_rows:
        return  # already built
    ids = base.column("vec_id").to_numpy()
    vecs = np.array(base.column("embedding").to_pylist(), dtype=np.float32)
    parts = []
    for r in range(MULT):
        v = vecs.copy()
        if r:
            # nudge dimension (r mod dim) by 1% — breaks exact-dup
            # cosine=1.0 ties while keeping replicas near-duplicates
            v[:, r % v.shape[1]] += 0.01 * r
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(ids + r * VEC_OFFSET, type=base.schema.field("vec_id").type),
                    "embedding": pa.array(list(v), type=base.schema.field("embedding").type),
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), dst)


def main() -> None:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "conv", os.path.join(HERE, "convergence.py")
    )
    conv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(conv)

    sf_dir = conv.build_scaled(MULT)
    build_sf1_embeddings(sf_dir)

    spark = get_spark("sf1probe")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    results: dict[str, dict] = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f).get("probes", {})

    def record(name: str, spark_sec, duck_sec=None, duck_note=None):
        results[name] = {
            "spark_sec": spark_sec,
            "duckdb_sec": duck_sec,
            "ratio": round(spark_sec / duck_sec, 2) if duck_sec else None,
        }
        if duck_note:
            results[name]["duckdb_note"] = duck_note
        with open(OUT, "w") as f:
            json.dump(
                {
                    "note": (
                        "sf1 = sf0.1 facts replicated 10x with key offsets "
                        "(convergence.py build_scaled) + embeddings replicated "
                        "with deterministic perturbation; min of 2 runs, "
                        "fresh-session warmup at sf0.001"
                    ),
                    "probes": results,
                },
                f,
                indent=1,
            )
        print(f"sf1 {name}: spark={spark_sec}s duckdb={duck_sec}s {duck_note or ''}",
              flush=True)

    def duckdb_bounded(sql: str, budget_sec: int = 240):
        """DuckDB timing in a child process with a hard budget — at
        sf1 the quadratic all-pairs oracles are the side that stops
        scaling, and an unbounded run would eat the whole session."""
        import multiprocessing as mp

        def worker(q):
            q.put(conv.time_duckdb(sql, sf_dir, runs=1))

        q = mp.Queue()
        p = mp.Process(target=worker, args=(q,))
        p.start()
        p.join(budget_sec)
        if p.is_alive():
            p.terminate()
            p.join()
            return None, f"killed at {budget_sec}s (quadratic oracle)"
        return q.get(), None

    # --- two-sided sf1 ratios for the relational headliners (VERDICT
    # r5 #1: the 2x gate's named scale factor, measured, not argued
    # from sf0.1 floors). Each probe is timed on BOTH engines at BOTH
    # sf0.1 and sf1, so the ratio TREND (scheduling floor amortizing
    # into the scan as data grows 10x) is in the published record.
    RELATIONAL = [
        "q04_tpch_q1",
        "q43_tpch_q3_shape",
        "q44_tpch_q5_shape",
        "q03_two_hop",
        "q48_window_analytics",
        "q14_token_counts",
    ]
    for name in RELATIONAL:
        fn = queries[name]
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
        s_base = conv.time_spark(spark, fn, conv.BASE_SF, runs=2)
        s_sf1 = conv.time_spark(spark, fn, sf_dir, runs=2)
        d_base = conv.time_duckdb(oracles[name], conv.BASE_SF, runs=2)
        d_sf1, note = duckdb_bounded(oracles[name])
        results[name] = {
            "spark_sec": s_sf1,
            "duckdb_sec": d_sf1,
            "ratio": round(s_sf1 / d_sf1, 2) if d_sf1 else None,
            "sf0.1": {
                "spark_sec": s_base,
                "duckdb_sec": d_base,
                "ratio": round(s_base / d_base, 2) if d_base else None,
            },
        }
        if note:
            results[name]["duckdb_note"] = note
        with open(OUT, "w") as f:
            json.dump(
                {
                    "note": (
                        "sf1 = sf0.1 facts replicated 10x with key offsets "
                        "(convergence.py build_scaled) + embeddings replicated "
                        "with deterministic perturbation; min of 2 runs, "
                        "fresh-session warmup at sf0.001; relational probes "
                        "carry a nested sf0.1 block so the ratio trend is "
                        "measured, not argued"
                    ),
                    "probes": results,
                },
                f,
                indent=1,
            )
        print(
            f"sf1 {name}: spark {s_base}->{s_sf1}s duckdb {d_base}->{d_sf1}s "
            f"ratio {results[name]['sf0.1']['ratio']}->{results[name]['ratio']}",
            flush=True,
        )

    for name in ("q03_two_hop", "q29_cosine_neardup", "q104_leakage_safe_split"):
        if name in results and results[name].get("spark_sec"):
            continue  # already measured in an earlier (partial) run
        fn = queries[name]
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        record(name, round(best, 3))  # Spark lands first, never lost
        if name != "q104_leakage_safe_split":
            d, note = duckdb_bounded(oracles[name])
            record(name, round(best, 3), d, note)
        else:
            record(name, round(best, 3), None,
                   "skipped: recursive-CTE closure at sf1 pair volume "
                   "(known q106-class pathology)")


if __name__ == "__main__":
    main()
