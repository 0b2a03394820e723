"""Round-14 drift adjudication (VERDICT r13 #3): compare r14 bench
results against r13 on COMMON probes, with the new environment-
insensitive executor task-time / CPU-time alongside wall-clock, and
answer the standing q31-family question — is the 4.9→6.7s wall drift
environmental (task-time flat) or a plan change (task-time moved)?

Usage: python bench/drift_r14.py
Reads bench/r13/bench_r13_run*.json (compact wall-only) and
bench/r14/bench_r14_run*.full.json (wall + task/cpu), prints a
markdown-ish summary and writes bench/r14/drift_adjudication.json.
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

import __spark_entry__ as entry_mod  # noqa: E402

short_to_full = {full.split("_")[0]: full for full in entry_mod.queries()}


def load_runs(pattern: str) -> list[dict]:
    out = []
    for p in sorted(glob.glob(pattern)):
        try:
            out.append(json.load(open(p)))
        except json.JSONDecodeError:
            lines = [l for l in open(p) if l.startswith("{")]
            out.append(json.loads(lines[-1]))
    return out


def min_over(runs: list[dict], field: str) -> dict[str, float]:
    acc: dict[str, float] = {}
    for r in runs:
        merged = {**r.get(field, {})}
        if field == "queries":
            merged.update(r.get("streaming", {}))
        for k, v in merged.items():
            full = short_to_full.get(k, k)
            acc[full] = min(acc.get(full, float("inf")), v)
    return acc


def main() -> None:
    r13 = load_runs(os.path.join(HERE, "r13", "bench_r13_run*.json"))
    r14 = load_runs(os.path.join(HERE, "r14", "bench_r14_run*.full.json"))
    if not r13 or not r14:
        raise SystemExit("missing r13 or r14 run files")
    w13 = min_over(r13, "queries")
    w14 = min_over(r14, "queries")
    t14 = min_over(r14, "task_time_sec")
    c14 = min_over(r14, "cpu_time_sec")

    common = sorted(set(w13) & set(w14))
    ratios = sorted(
        (w14[n] / w13[n], n) for n in common if w13[n] > 0.05
    )
    med = statistics.median(r for r, _ in ratios)
    q1 = ratios[len(ratios) // 4][0]
    q3 = ratios[3 * len(ratios) // 4][0]
    print(f"common probes: {len(common)}  wall ratio r14/r13 "
          f"median {med:.3f} quartiles {q1:.3f}/{q3:.3f}")

    watch = ["q31_ann_topk", "q25_label_propagation", "q84_stream_neardup",
             "q109_boilerplate_removal", "q185_kmeans_parallel_assign",
             "q176_kmeans_embeddings", "q147_dml_readback"]
    rows = {}
    for n in watch:
        if n in w14:
            rows[n] = {
                "wall_r13": w13.get(n),
                "wall_r14": w14[n],
                "task_r14": t14.get(n),
                "cpu_r14": c14.get(n),
            }
            print(f"{n}: wall {w13.get(n)} -> {w14[n]}  "
                  f"task={t14.get(n)} cpu={c14.get(n)}")

    doc = {
        "note": (
            "min-over-runs on common probes; r14 adds executor task/CPU "
            "time from bench.StageMeter (AppStatusStore). task/cpu are "
            "the environment-insensitive reference for future rounds: "
            "wall drift with flat task-time = environmental; task-time "
            "movement = plan/code change."
        ),
        "n_common": len(common),
        "wall_ratio_median": round(med, 4),
        "wall_ratio_quartiles": [round(q1, 4), round(q3, 4)],
        "watchlist": rows,
        "wall_r14_min": {k: round(v, 3) for k, v in sorted(w14.items())},
        "task_r14_min": {k: round(v, 3) for k, v in sorted(t14.items())},
        "cpu_r14_min": {k: round(v, 3) for k, v in sorted(c14.items())},
    }
    out = os.path.join(HERE, "r14", "drift_adjudication.json")
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=1)
    print("->", out)


if __name__ == "__main__":
    main()
