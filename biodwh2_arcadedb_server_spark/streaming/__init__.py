"""Structured Streaming operators over event streams (SURVEY.md C7)."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

# Default state-partition count for the finite streaming probes.
# Stateful-operator partitioning is NOT the batch shuffle default: the
# count is frozen into the checkpoint at first start, and every
# micro-batch pays a state-store open+commit per partition, so it must
# be sized to ACTIVE STATE VOLUME (target: state partitions ≈ active
# keys × bytes/key / ~64-256 MB), not to cluster cores. Measured at
# sf0.1 (150 users of running-stats state): 32 partitions 1.8s → 8
# partitions 1.2s → 1 partition 3.6s (per-partition commit overhead
# falls, then Python-call parallelism is lost). A 100 TB deployment
# with 10^8 active keys sizes UP for the same reason this sizes down.
STREAM_STATE_PARTITIONS = 8


@contextmanager
def state_partitions(spark: SparkSession, n: int = STREAM_STATE_PARTITIONS):
    """Pin ``spark.sql.shuffle.partitions`` while a streaming query is
    defined and started, restoring the session default afterwards.
    Safe for the finite probes because the stream runs to completion
    (awaitTermination) inside the scope; a long-lived deployment sets
    the conf once before first start instead — the checkpoint freezes
    it from then on."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
