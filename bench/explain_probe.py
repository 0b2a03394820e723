"""Dump ``explain("formatted")`` for registry probes to plans/r<N>/.

Usage:  python bench/explain_probe.py r14 before q156_semdedup_ann_clusters [more...]
        python bench/explain_probe.py r14 after --all-touched q156,...
Writes plans/<round>/<probe>_<tag>.txt (judge deliverable).
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
os.environ.setdefault("SPARK_GRAFT_LOCAL_TUNING", "1")

from biodwh2_arcadedb_server_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402


def main() -> None:
    rnd, tag, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(ROOT, "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain_probe")
    queries = entry_mod.queries()
    for name in names:
        fn = queries[name]
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
