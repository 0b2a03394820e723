"""Streaming near-duplicate detection (C2 × C7): MinHash+LSH over a
document stream with a stateful band-bucket store.

The reference ingests once and has no streaming story; a training-data
pipeline at 100 TB ingests continuously and wants near-dups flagged on
arrival, not in a nightly batch. The operator composes:

1. **Stateless signature stage** — tokenize → hashed k-shingles →
   MinHash signature → band/bucket keys, all per-row JVM expressions
   (`dedup.minhash_signatures_from_shingles` / `banded_signatures`
   are reused verbatim; they contain no shuffle or checkpoint, so the
   same code serves batch and stream — the batch/stream parity rule).
2. **Stateful bucket store** — ``applyInPandasWithState`` keyed by
   (band, bucket-hash): state is the sorted id list of documents seen
   in that bucket; each arriving doc emits one candidate pair per
   prior occupant, then joins the set. A pair is emitted exactly once
   (by the doc that arrives second), so downstream dedup is only
   needed across bands — same contract as the batch LSH join.

State size is O(docs × bands) ids total, the same volume the batch
job shuffles; ``ttl_ms`` evicts stale buckets for continuous runs
(opt-in — a pending ProcessingTimeTimeout keeps availableNow runs
scheduling extra micro-batches forever, see stateful.py).

The pytest gate streams the same files the batch path reads (split in
two so state must carry across micro-batches) and asserts the emitted
pair set equals ``dedup.lsh_candidate_pairs`` on identical parameters.
"""

from __future__ import annotations

import functools
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from biodwh2_arcadedb_server_spark.functions import shingles_from_tokens, tokens
from biodwh2_arcadedb_server_spark.operators.dedup import (
    banded_signatures,
    minhash_signatures_from_shingles,
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

PAIR_SCHEMA = "id_a long, id_b long, band int"
BUCKET_STATE_SCHEMA = "bhs array<bigint>, idlists array<array<bigint>>"


def read_documents_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int = 1,
    glob: str = "documents.parquet",
) -> DataFrame:
    """Incremental file-source stream over the documents table. The
    glob matches leaf *file* names (the testdata table is one file;
    tests stream multi-file directories with ``glob='*.parquet'``)."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", glob)
        .parquet(sf_dir)
    )


def _update_bucket(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState, ttl_ms: int | None
) -> Iterable[pd.DataFrame]:
    """State group = one coarse cell (band, bh mod coarse_buckets);
    the state maps each exact bucket hash seen in the cell to its
    sorted id list, so exact-bh matching is preserved while the
    Python-call count drops from one per bucket to one per cell."""
    band, _cell = key
    if state.hasTimedOut:
        state.remove()
        return iter(())
    if state.exists:
        bhs, idlists = state.get
        table: dict[int, set[int]] = {int(b): set(l) for b, l in zip(bhs, idlists)}
    else:
        table = {}
    a_out: list[int] = []
    b_out: list[int] = []
    for pdf in pdfs:
        for _id, bh in zip(pdf["_id"], pdf["bh"]):
            _id, bh = int(_id), int(bh)
            ids = table.setdefault(bh, set())
            if _id in ids:
                continue  # replayed doc: pairs already emitted
            for other in ids:
                a_out.append(min(_id, other))
                b_out.append(max(_id, other))
            ids.add(_id)
    state.update((list(table.keys()), [sorted(v) for v in table.values()]))
    if ttl_ms is not None:
        state.setTimeoutDuration(ttl_ms)
    if not a_out:
        return iter(())
    return iter(
        [pd.DataFrame({"id_a": a_out, "id_b": b_out, "band": [band] * len(a_out)})]
    )


def streaming_minhash_candidates(
    docs: DataFrame,
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    rows: int = 4,
    ttl_ms: int | None = None,
    coarse_buckets: int = 1024,
    spread: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs over a streaming document source.
    Output (id_a, id_b, band) — distinct pairs may repeat across
    bands (dedupe downstream, exactly like the batch LSH join does
    before verification).

    ``coarse_buckets`` sets state-key granularity: grouping on the
    raw (band, bh) would pay one Python invocation per *occupied
    bucket* per micro-batch (measured 14.5s for ~40k single-doc
    buckets at sf0.1); grouping on (band, bh mod coarse_buckets)
    caps the call count at bands × coarse_buckets while the in-state
    bh→ids map keeps matching exact. Measured sf0.1 curve: raw
    14.5s → 1024 cells 9.5s → 64 cells 6.6s (remaining floor is the
    stateful shuffle + state-store I/O, not the calls). Size it so a
    cell's state stays a few KB: ~docs×bands/(bands×cells) ids per
    cell — at 10^9 docs that means 10^6-10^7 cells, still thousands
    of docs per Python call.

    ``spread``: optional repartition between the source and the
    signature stage. A single-file test stream scans as ONE task, so
    the HOF-heavy MinHash stage serializes on one core (measured ~1s
    of the sf0.1 drain); spreading it first costs a narrow shuffle of
    raw text but uses every core. A production multi-file/Kafka
    stream already has scan parallelism — leave None (no-op) there,
    exactly like the batch `_spread` helper (curation.py)."""
    if spread:
        docs = docs.repartition(spread)
    toked = docs.select(F.col("doc_id").alias("_id"), tokens(F.col("text")).alias("_toks"))
    sh = toked.select(
        "_id",
        F.sort_array(
            F.transform(shingles_from_tokens(F.col("_toks"), k), lambda g: F.xxhash64(g))
        ).alias("_sh"),
    ).withColumn("_size", F.size("_sh"))
    # drop_empty=False: a filter interleaved with this micro-batch
    # plan re-evaluates the whole HOF shingle lineage per row
    # (measured 1.2s -> 5.8s at sf0.1); every doc emits >=1 gram so
    # the guard is row-wise a no-op (dedup.py docstring invariant)
    sigs = minhash_signatures_from_shingles(sh, num_hashes, drop_empty=False)
    banded = banded_signatures(sigs, bands, rows).withColumn(
        "cell", F.pmod("bh", F.lit(coarse_buckets))
    )
    timeout = (
        GroupStateTimeout.NoTimeout if ttl_ms is None else GroupStateTimeout.ProcessingTimeTimeout
    )
    return banded.groupBy("band", "cell").applyInPandasWithState(
        functools.partial(_update_bucket, ttl_ms=ttl_ms),
        outputStructType=PAIR_SCHEMA,
        stateStructType=BUCKET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
