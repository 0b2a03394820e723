"""All-probe local oracle sweep (VERDICT r8 "next" #1).

The driver hash-checks ~50 probes per round, so an untouched green can
go stale for several rounds; a probe whose shared dependency shifts
outside __spark_entry__._MODULE_DEPS could hide a regression in that
window. This script closes the blind spot: it runs EVERY registered
``queries()`` entry against its ``oracle_sql()`` twin through DuckDB at
sf0.01 with the driver's own canonicalization (testing.compare: sorted
rows, 4dp floats, ISO dates, column-name-sorted value hash) and writes
``bench/verify_all.json``. Non-oracled probes (if any ever exist) get
the driver's weaker rows-only check.

Run from the repo root:  python bench/verify_all.py
Part of the per-round checklist (ROADMAP): commit the JSON each round.
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

from biodwh2_arcadedb_server_spark.session import get_spark  # noqa: E402
from biodwh2_arcadedb_server_spark.testing import compare  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402

# Restart cadence mirrors bench.py's session-age control — one long
# session accumulates state that slows (never corrupts) later probes;
# correctness sweeps only need it to bound memory growth.
SEGMENT = 60


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_VERIFY_SF", "/root/testdata/sf0.01")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    spark = get_spark("verify_all")

    results: dict[str, dict] = {}
    t_start = time.perf_counter()
    for i, (name, fn) in enumerate(queries.items()):
        if i and i % SEGMENT == 0:
            spark.stop()
            spark = get_spark("verify_all")
        t0 = time.perf_counter()
        oracle = oracles.get(name)
        try:
            if oracle is None:
                n = fn(spark, sf_dir).count()
                results[name] = {"ok": n >= 0, "detail": f"rows_only n={n}"}
            else:
                ok, detail = compare(spark, fn, oracle, sf_dir)
                results[name] = {"ok": ok, "detail": detail}
        except Exception as exc:  # noqa: BLE001 — per-probe isolation
            results[name] = {
                "ok": False,
                "detail": f"{type(exc).__name__}: {exc}"[:300],
            }
        results[name]["sec"] = round(time.perf_counter() - t0, 2)
        mark = "ok" if results[name]["ok"] else "FAIL"
        print(f"[{i + 1}/{len(queries)}] {name}: {mark}", flush=True)

    n_ok = sum(1 for r in results.values() if r["ok"])
    payload = {
        "sf_dir": sf_dir,
        "probes": len(results),
        "ok": n_ok,
        "fail": len(results) - n_ok,
        "oracled": sum(1 for n in results if n in oracles),
        "total_sec": round(time.perf_counter() - t_start, 1),
        "results": results,
    }
    out = os.path.join(HERE, "verify_all.json")
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(
        f"\n{n_ok}/{len(results)} green "
        f"({payload['total_sec']}s) -> {out}"
    )
    spark.stop()
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
