"""Per-probe job-timeline profiler (optimization round tooling).

Runs one or more registry probes with the noop sink and reconstructs
the JOB TIMELINE from the JVM AppStatusStore afterwards: per job,
submission/completion wall time, task count, and executor task time;
between jobs, the DRIVER GAP (Catalyst analysis + Python driver code +
scheduling) that wall-clock pays but executor metrics never show.

This is the attribution tool guide §1 asks for when wall >> task_time:
it answers "is the time in the executors, in the driver, or between
jobs" per probe without the UI.

Usage:  python bench/profile_probe.py q156_semdedup_ann_clusters [more...]
        SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 (default)
Writes bench/profiles/<probe>.json and prints a summary table.
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

import __spark_entry__ as entry_mod  # noqa: E402


def _jobs(spark):
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    lst = store.jobsList(None)
    out = []
    for i in range(lst.size()):
        j = lst.apply(i)
        sub = j.submissionTime()
        comp = j.completionTime()
        out.append(
            {
                "job_id": j.jobId(),
                "name": (j.name() or "")[:120],
                "submitted": sub.get().getTime() / 1e3 if sub.isDefined() else None,
                "completed": comp.get().getTime() / 1e3 if comp.isDefined() else None,
                "num_tasks": j.numTasks(),
                "stage_ids": [j.stageIds().apply(k) for k in range(j.stageIds().size())],
            }
        )
    out.sort(key=lambda r: r["job_id"])
    return out


def _stage_metrics(spark):
    sc = spark.sparkContext
    jvm, gw = sc._jvm, sc._gateway
    store = sc._jsc.sc().statusStore()
    lst = store.stageList(
        jvm.java.util.ArrayList(), False, False,
        gw.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
    )
    out = {}
    for i in range(lst.size()):
        s = lst.apply(i)
        out[s.stageId()] = {
            "run_sec": s.executorRunTime() / 1e3,
            "cpu_sec": s.executorCpuTime() / 1e9,
            "tasks": s.numCompleteTasks() + s.numFailedTasks(),
            "name": (s.name() or "")[:100],
        }
    return out


def profile(name: str, sf_dir: str, warm: bool = True) -> dict:
    spark = get_spark(f"profile_{name}")
    queries = entry_mod.queries()
    fn = queries[name]
    if warm:
        try:
            fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:  # noqa: BLE001
            print(f"warmup failed: {exc}", file=sys.stderr)
    before_jobs = {j["job_id"] for j in _jobs(spark)}
    spark.sparkContext.setJobDescription(f"profile:{name}")
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    t_end = time.time()
    try:
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(2000)
    except Exception:  # noqa: BLE001
        time.sleep(0.1)
    jobs = [j for j in _jobs(spark) if j["job_id"] not in before_jobs]
    stages = _stage_metrics(spark)
    for j in jobs:
        j["task_sec"] = round(
            sum(stages.get(sid, {}).get("run_sec", 0.0) for sid in j["stage_ids"]), 3
        )
        j["cpu_sec"] = round(
            sum(stages.get(sid, {}).get("cpu_sec", 0.0) for sid in j["stage_ids"]), 3
        )
        j["stage_names"] = [
            stages[sid]["name"] for sid in j["stage_ids"] if sid in stages
        ]
    # timeline accounting: job spans vs gaps, measured from the first
    # job's submission (driver time before job 1 = pre_first_job)
    t_first = min((j["submitted"] for j in jobs if j["submitted"]), default=t_end)
    in_jobs = 0.0
    gaps = []
    prev_end = t_first
    for j in jobs:
        if j["submitted"] is None or j["completed"] is None:
            continue
        gap = j["submitted"] - prev_end
        if gap > 0.02:
            gaps.append({"before_job": j["job_id"], "gap_sec": round(gap, 3)})
        in_jobs += max(0.0, j["completed"] - max(j["submitted"], prev_end))
        prev_end = max(prev_end, j["completed"])
    pre = t_first - (t_end - wall)
    summary = {
        "probe": name,
        "sf_dir": sf_dir,
        "wall_sec": round(wall, 3),
        "n_jobs": len(jobs),
        "pre_first_job_sec": round(pre, 3),
        "in_jobs_sec": round(in_jobs, 3),
        "gap_total_sec": round(sum(g["gap_sec"] for g in gaps), 3),
        "task_sec": round(sum(j.get("task_sec", 0) for j in jobs), 3),
        "cpu_sec": round(sum(j.get("cpu_sec", 0) for j in jobs), 3),
        "top_gaps": sorted(gaps, key=lambda g: -g["gap_sec"])[:10],
        "top_jobs": sorted(
            (
                {
                    "job_id": j["job_id"],
                    "dur_sec": round((j["completed"] or 0) - (j["submitted"] or 0), 3),
                    "task_sec": j.get("task_sec"),
                    "num_tasks": j["num_tasks"],
                    "name": j["name"][:80],
                }
                for j in jobs
                if j["submitted"] and j["completed"]
            ),
            key=lambda r: -r["dur_sec"],
        )[:10],
        "jobs": jobs,
    }
    spark.sparkContext.setJobDescription(None)
    return summary


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    if not names:
        print("usage: python bench/profile_probe.py <probe> [probe...]")
        sys.exit(2)
    os.makedirs(os.path.join(HERE, "profiles"), exist_ok=True)
    for name in names:
        s = profile(name, sf_dir)
        out = os.path.join(HERE, "profiles", f"{name}.json")
        with open(out, "w") as fh:
            json.dump(s, fh, indent=1)
        print(
            f"{name}: wall={s['wall_sec']}s jobs={s['n_jobs']} "
            f"pre={s['pre_first_job_sec']}s in_jobs={s['in_jobs_sec']}s "
            f"gaps={s['gap_total_sec']}s task={s['task_sec']}s cpu={s['cpu_sec']}s"
        )
        for g in s["top_gaps"][:5]:
            print(f"   gap {g['gap_sec']}s before job {g['before_job']}")
        for j in s["top_jobs"][:5]:
            print(
                f"   job {j['job_id']} {j['dur_sec']}s task={j['task_sec']}s "
                f"tasks={j['num_tasks']} {j['name'][:60]}"
            )


if __name__ == "__main__":
    main()
