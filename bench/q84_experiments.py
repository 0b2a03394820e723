"""q84 drain-floor experiments (VERDICT r3 #8): time the streaming
MinHash near-dup drain at sf0.1 under state-store / partitioning
variants, verifying the emitted pair set is identical each time.

Usage: python bench/q84_experiments.py
Prints one line per variant; pick the winner into pipeline_queries.q84.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import os as _os
_os.environ.setdefault("SPARK_GRAFT_LOCAL_TUNING", "1")
from biodwh2_arcadedb_server_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
HDFS = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"


def drain(spark, *, cells: int, parts: int, spread: int, provider: str | None,
          name: str) -> tuple[float, int]:
    from biodwh2_arcadedb_server_spark.streaming import state_partitions
    from biodwh2_arcadedb_server_spark.streaming.neardup import (
        read_documents_stream,
        streaming_minhash_candidates,
    )

    if provider:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    t0 = time.perf_counter()
    with state_partitions(spark, parts):
        stream = read_documents_stream(spark, SF)
        out = streaming_minhash_candidates(
            stream, k=3, num_hashes=32, bands=8, rows=4,
            coarse_buckets=cells, spread=spread,
        )
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", tempfile.mkdtemp(prefix=f"{name}_ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    wall = time.perf_counter() - t0
    n = spark.table(name).select("id_a", "id_b").dropDuplicates().count()
    return round(wall, 2), n


def main() -> None:
    spark = get_spark("q84exp")
    # warmup JIT on the tiny sf
    global SF
    real_sf = SF
    SF = "/root/testdata/sf0.001"
    drain(spark, cells=16, parts=4, spread=32, provider=None, name="warm")
    SF = real_sf

    variants = [
        ("baseline_16c_4p_hdfs", dict(cells=16, parts=4, spread=32, provider=HDFS)),
        ("rocksdb_16c_4p", dict(cells=16, parts=4, spread=32, provider=ROCKSDB)),
        ("rocksdb_64c_8p", dict(cells=64, parts=8, spread=32, provider=ROCKSDB)),
        ("hdfs_8c_2p", dict(cells=8, parts=2, spread=32, provider=HDFS)),
        ("hdfs_32c_8p", dict(cells=32, parts=8, spread=32, provider=HDFS)),
        ("hdfs_16c_4p_spread16", dict(cells=16, parts=4, spread=16, provider=HDFS)),
    ]
    pairs_ref = None
    for name, kw in variants:
        wall, n = drain(spark, name=name, **kw)
        if pairs_ref is None:
            pairs_ref = n
        flag = "" if n == pairs_ref else f"  PAIR MISMATCH ({n} vs {pairs_ref})"
        print(f"{name}: {wall}s pairs={n}{flag}", flush=True)


if __name__ == "__main__":
    main()
