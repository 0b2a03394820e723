"""Interleaved A/B of RocksDB state-store commit-path confs on the
streaming drains (optimization r15, VERDICT r14 next #1).

The TWS drains' wall floor is the per-trigger RocksDB cycle: every
micro-batch commit snapshots each state partition's store into the
checkpoint. `changelogCheckpointing` (public Spark 3.4+ conf) makes a
commit append the batch's change log instead of a full snapshot
(snapshots move to the background maintenance thread) — the documented
production posture for frequent-trigger streams, and a pure
state-store-durability implementation detail: emitted rows are
identical. `trackTotalNumberOfRows=false` skips the per-put/delete
row-count bookkeeping (the documented RocksDB perf knob); numTotalRows
metrics degrade, results do not.

Modes are interleaved (base/changelog/changelog+noTrack per rep) so
ambient drift can't masquerade as a win; wall + executor task/CPU time
are all recorded (task/cpu are the environment-insensitive signals).

Usage: python bench/tws_ab.py [reps]   (default 2)
Writes bench/r15/tws_ab.json.
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

PROBES = [
    "q175_tws_running_stats",
    "q179_tws_session_close",
    "q181_tws_stream_first_seen",
    "q182_tws_warm_start_dedup",
    "q191_streaming_substring_contamination",
    "q201_streaming_contamination_rotation",
]
CHANGELOG = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)
TRACK = "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows"
MODES = {
    "base": {CHANGELOG: "false", TRACK: "true"},
    "changelog": {CHANGELOG: "true", TRACK: "true"},
    "changelog_notrack": {CHANGELOG: "true", TRACK: "false"},
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = entry_mod.queries()
    spark = get_spark("tws_ab")
    meter = bench_mod.StageMeter(spark)

    # warmup: every probe once at the small SF (JIT/codegen out of band)
    for name in PROBES:
        queries[name](spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()

    results: dict[str, dict[str, list[dict]]] = {}
    for _rep in range(reps):
        for mode, confs in MODES.items():
            for key, val in confs.items():
                spark.conf.set(key, val)
            for name in PROBES:
                meter.mark()
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                wall = round(time.perf_counter() - t0, 3)
                d = meter.delta() or (None, None)
                results.setdefault(name, {}).setdefault(mode, []).append(
                    {"wall": wall, "task": d[0], "cpu": d[1]}
                )
                print(f"{mode:18s} {name:42s} wall={wall:6.2f} "
                      f"task={d[0]} cpu={d[1]}", flush=True)
    for key in (CHANGELOG, TRACK):
        spark.conf.unset(key)
    out = os.path.join(HERE, "r15", "tws_ab.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        json.dump({"sf_dir": sf_dir, "reps": reps, "results": results}, fh,
                  indent=1)
    print(f"-> {out}")


if __name__ == "__main__":
    main()
