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

# Same small-split scan tuning opt-in as bench.py (round-7 ADVICE:
# no longer a get_spark() library default).
os.environ.setdefault("SPARK_GRAFT_LOCAL_TUNING", "1")

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

    # optional argv filter: `python bench/sf1_probe.py q156_ann_pairs`
    # measures just the named anchors (new-anchor runs must not re-pay
    # the whole relational sweep)
    only = set(sys.argv[1:])
    want = lambda n: not only or n in only  # noqa: E731

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
        "q162_tpch_q10_shape",
        "q163_tpch_q7_shape",
        "q03_two_hop",
        "q48_window_analytics",
        "q14_token_counts",
        # round-8 document-pipeline anchors: zero-shuffle HOF folds
        # (q168) and the one-pass funnel (q169) over documents x10
        "q168_gopher_repetition",
        "q169_curation_funnel",
        "q170_domain_mixture",
        # round-14 anchors: the exact-substring positional index over
        # documents x10 (O(tokens) rows, equi-join + windows — the
        # family's scale path, previously argued from sf0.1 only) and
        # the container fan-outs (map-only decode, near-flat is the
        # claim, same as png_decode_x10)
        "q183_exact_substring_spans",
        "q199_mp4_container_frames",
        "q200_opus_container_packets",
    ]
    for name in RELATIONAL:
        if not want(name):
            continue
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
        if not want(name):
            continue
        if name in results and results[name].get("spark_sec"):
            continue  # already measured in an earlier (partial) run
        fn = queries[name]
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
        best = float("inf")
        from biodwh2_arcadedb_server_spark.operators import pipeline_queries as _pq

        for _ in range(2):
            # bust the session-scoped derived-table cache so both runs
            # pay the probe's full cost — the anchor records COLD cost
            # per probe (the per-round bench.py number is the one that
            # legitimately amortizes shared tables across the family)
            _pq._SESSION_CACHE.clear()
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

    # --- q156 ANN pair source vs q29 exact (VERDICT r6 #1 anchor):
    # the scale claim is GROWTH RATE, so the ANN shortlist is timed at
    # sf0.1 and sf1 with n_clusters grown 10x alongside the corpus
    # (SemDeDup practice: cells stay bounded, flops stay ~linear),
    # while q29's exact blocked matmul pays 100x the flops for 10x
    # the rows. Recall at sf1 is recorded next to the timing so the
    # anchor can't quietly trade recall for speed.
    if want("q156_ann_pairs"):
        from biodwh2_arcadedb_server_spark.operators import similarity as _sim
        from biodwh2_arcadedb_server_spark.sources.registry import load_table as _lt

        def ann_pairs(sf: str, k: int):
            return _sim.cosine_near_dup_pairs_ann(
                _lt(spark, sf, "embeddings"), 0.4, n_clusters=k, n_probe=5
            )

        ann_pairs("/root/testdata/sf0.001", 4).write.format("noop").mode(
            "overwrite"
        ).save()
        timings = {}
        for label, sf, k in (("sf0.1", BASE := "/root/testdata/sf0.1", 16), ("sf1", sf_dir, 160)):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                ann_pairs(sf, k).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            timings[label] = round(best, 3)
        exact_sf1 = {
            (r.id_a, r.id_b)
            for r in _sim.cosine_near_dup_pairs(
                _lt(spark, sf_dir, "embeddings"), 0.4
            ).select("id_a", "id_b").collect()
        }
        got = {
            (r.id_a, r.id_b)
            for r in ann_pairs(sf_dir, 160).select("id_a", "id_b").collect()
        }
        recall = round(len(got & exact_sf1) / max(len(exact_sf1), 1), 4)
        results["q156_ann_pairs"] = {
            "spark_sec": timings["sf1"],
            "sf0.1": {"spark_sec": timings["sf0.1"]},
            "sf1_over_sf0.1": round(timings["sf1"] / max(timings["sf0.1"], 1e-9), 2),
            "n_clusters": {"sf0.1": 16, "sf1": 160},
            "sf1_pair_recall_vs_exact": recall,
            "exact_pairs_sf1": len(exact_sf1),
            "note": (
                "ANN shortlist growth vs q29 exact: cells grown 10x with "
                "the corpus; compare q29_cosine_neardup.spark_sec (exact, "
                "100x flops at sf1)"
            ),
        }
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
        print(f"sf1 q156_ann_pairs: {timings} recall={recall}", flush=True)

    # --- round-12 anchors (VERDICT r11 #6) --------------------------------
    # q178: the map-only cluster-balanced sampler — its scale claim is
    # "no per-cluster window, no corpus sort", so the anchor records
    # the sf0.1→sf1 growth of the WHOLE probe (assign + threshold).
    if want("q178_cluster_threshold_sample"):
        fn = queries["q178_cluster_threshold_sample"]
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        s_base = conv.time_spark(spark, fn, conv.BASE_SF, runs=2)
        s_sf1 = conv.time_spark(spark, fn, sf_dir, runs=2)
        results["q178_cluster_threshold_sample"] = {
            "spark_sec": s_sf1,
            "sf0.1": {"spark_sec": s_base},
            "sf1_over_sf0.1": round(s_sf1 / max(s_base, 1e-9), 2),
            "note": (
                "map-only threshold filter + k-row percentile sketch; "
                "growth is the assignment scan, no window/sort term"
            ),
        }
        with open(OUT, "w") as f:
            json.dump({"note": results_note(), "probes": results}, f, indent=1)
        print(f"sf1 q178: {s_base}->{s_sf1}s", flush=True)

    # kmeans init scaling: sequential kmeans++ pays k full D² scans
    # (flops ≈ Σj·dim·n ≈ k²/2·dim·n); k-means|| with the incremental
    # running-cost column pays ~one evaluation per (row, candidate) —
    # ≈ ℓ·R·dim·n — in only init_rounds+2 passes. Measured history:
    # the first (rescan-the-growing-literal) implementation LOST at
    # k=16/ℓ=32/R=3 (43s vs 70s — the rescan made its flops exceed
    # kmeans++'s); the incremental cost array (Bahmani's running cost
    # vector) flipped it to 2.14x at k=16 and 9.06x at k=64 (MLlib's
    # ℓ=2k, R=2 point). On a cluster the pass count dominates either
    # way (each scan is a full corpus read at 100 TB: 64 reads vs 4).
    if want("kmeans_init_scaling"):
        from biodwh2_arcadedb_server_spark.operators import similarity as _sim2
        from biodwh2_arcadedb_server_spark.sources.registry import (
            load_table as _lt2,
        )

        for tag, sf_emb, kk, ll, rr in (
            ("k16_sf1", sf_dir, 16, 32.0, 3),
            ("k64_sf0.1", "/root/testdata/sf0.1", 64, 128.0, 2),
        ):
            key = f"kmeans_init_scaling_{tag}"
            if key in results:
                continue
            timings2 = {}
            for label, init, kw in (
                ("kmeanspp", "kmeans++", {}),
                (
                    "kmeansll",
                    "kmeans||",
                    {"init_rounds": rr, "oversample": ll},
                ),
            ):
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    _sim2.kmeans_assign(
                        _lt2(spark, sf_emb, "embeddings"),
                        k=kk, iterations=0, dim=64, init=init, seed=0,
                        **kw,
                    ).write.format("noop").mode("overwrite").save()
                    best = min(best, time.perf_counter() - t0)
                timings2[label] = round(best, 3)
            results[key] = {
                "k": kk, "oversample": ll, "init_rounds": rr,
                "corpus": sf_emb,
                "kmeanspp_sec": timings2["kmeanspp"],
                "kmeansll_sec": timings2["kmeansll"],
                "kmeanspp_scans": kk,
                "kmeansll_scans": rr + 2,
                "speedup": round(
                    timings2["kmeanspp"] / max(timings2["kmeansll"], 1e-9),
                    2,
                ),
                "note": (
                    "init only (iterations=0); locally CPU-bound so the "
                    "flop model k²/2 vs R²ℓ/2 (+weights) predicts wall — "
                    "kmeans|| wins at large k; at 100 TB the SCAN count "
                    "(k vs R+2 corpus reads) dominates at any k"
                ),
            }
            with open(OUT, "w") as f:
                json.dump(
                    {"note": results_note(), "probes": results}, f, indent=1
                )
            print(f"sf1 kmeans init {tag}: {timings2}", flush=True)

    # TWS long drain: the measured ~1.1s/trigger micro-batch + proto-
    # runner floor (SCALE.md) must stay per-TRIGGER, not per-volume —
    # a 20-trigger drain over the same corpus should cost ~20 floor
    # units, i.e. sec/trigger flat while events/trigger shrinks 6.7x.
    if want("tws_long_drain"):
        from biodwh2_arcadedb_server_spark.streaming.stateful import (
            run_finite_first_seen as _rffs,
        )

        drain = {}
        for n_chunks in (3, 20):
            t0 = time.perf_counter()
            n = _rffs(
                spark, "/root/testdata/sf0.1", modulus=97,
                n_chunks=n_chunks, name=f"sf1_drain_{n_chunks}",
            ).count()
            sec = round(time.perf_counter() - t0, 3)
            drain[str(n_chunks)] = {
                "total_sec": sec,
                "sec_per_trigger": round(sec / n_chunks, 3),
                "rows": n,
            }
        results["tws_first_seen_long_drain"] = {
            **drain,
            "note": (
                "same sf0.1 events corpus drained in 3 vs 20 triggers; "
                "flat sec/trigger = the floor is the micro-batch cycle, "
                "amortizing per-trigger on a real stream"
            ),
        }
        with open(OUT, "w") as f:
            json.dump({"note": results_note(), "probes": results}, f, indent=1)
        print(f"sf1 tws long drain: {drain}", flush=True)


def results_note() -> str:
    return (
        "sf1 = sf0.1 facts replicated 10x with key offsets "
        "(convergence.py build_scaled) + embeddings replicated "
        "with deterministic perturbation; min of 2 runs, "
        "fresh-session warmup at sf0.001; relational probes "
        "carry a nested sf0.1 block so the ratio trend is "
        "measured, not argued"
    )


if __name__ == "__main__":
    main()
