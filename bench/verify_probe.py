"""Single-probe oracle check for fast optimization iteration.

Usage: python bench/verify_probe.py q28_simhash_neardup [more...]
       SFS=sf0.001,sf0.01 python bench/verify_probe.py q28_...
Runs each named probe against its DuckDB oracle twin with the driver's
canonicalization (testing.compare) at each SF in $SFS (default
sf0.001,sf0.01). Exits non-zero on any mismatch.
"""

from __future__ import annotations

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


def main() -> int:
    names = sys.argv[1:]
    sfs = os.environ.get("SFS", "sf0.001,sf0.01").split(",")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    spark = get_spark("verify_probe")
    bad = 0
    for name in names:
        fn = queries[name]
        for sf in sfs:
            sf_dir = f"/root/testdata/{sf}"
            t0 = time.perf_counter()
            oracle = oracles.get(name)
            if oracle is None:
                n = fn(spark, sf_dir).count()
                ok, detail = n >= 0, f"rows_only n={n}"
            else:
                ok, detail = compare(spark, fn, oracle, sf_dir)
            dt = time.perf_counter() - t0
            mark = "ok" if ok else "FAIL"
            print(f"{name} @ {sf}: {mark} ({dt:.1f}s) {detail if not ok else ''}",
                  flush=True)
            bad += 0 if ok else 1
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
