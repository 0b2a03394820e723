"""Streaming MinHash near-dup: the stateful bucket store must emit
exactly the candidate pairs the batch LSH join finds, with state
carried across micro-batches."""

from __future__ import annotations

from biodwh2_arcadedb_server_spark.operators import dedup
from biodwh2_arcadedb_server_spark.sources.registry import load_table
from biodwh2_arcadedb_server_spark.streaming import neardup

PARAMS = dict(k=3, num_hashes=32, bands=8, rows=4)


def test_streaming_candidates_match_batch(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents")
    # batch reference on the same corpus and parameters
    sigs = dedup.minhash_signatures(docs, "doc_id", "text", PARAMS["k"], PARAMS["num_hashes"])
    batch = {
        (r.id_a, r.id_b)
        for r in dedup.lsh_candidate_pairs(sigs, PARAMS["bands"], PARAMS["rows"]).collect()
    }
    assert batch, "planted near-dups should produce candidates"

    # split the corpus into two single files so the stream runs >=2
    # micro-batches and bucket state must survive between them
    import pyarrow as pa
    import pyarrow.parquet as pq

    half = docs.count() // 2
    src = tmp_path / "stream_src"
    src.mkdir()
    cols = [f.name for f in neardup.DOCUMENTS_SCHEMA.fields]
    for i, part in enumerate(
        (docs.where(docs.doc_id < half), docs.where(docs.doc_id >= half))
    ):
        pdf = part.select(*cols).toPandas()
        pq.write_table(pa.Table.from_pandas(pdf), str(src / f"part{i}.parquet"))

    stream = neardup.read_documents_stream(
        spark, str(src), max_files_per_trigger=1, glob="*.parquet"
    )
    out = neardup.streaming_minhash_candidates(stream, **PARAMS)
    q = (
        out.writeStream.format("memory")
        .queryName("neardup_pairs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        result = spark.table("neardup_pairs")
        got = {(r.id_a, r.id_b) for r in result.collect()}
        assert got == batch
        # exactly-once per (pair, band): no duplicate emissions
        assert result.count() == result.dropDuplicates(["id_a", "id_b", "band"]).count()
        # more than one micro-batch actually ran
        assert len(q.recentProgress) >= 2
    finally:
        q.stop()


def test_streaming_plan_is_filter_free(spark, sf_small):
    """Pin the r4 lesson (ROADMAP #5): a Filter interleaved with the
    HOF shingle lineage in a micro-batch plan re-evaluates the whole
    interpreted pipeline per row (measured +4s at sf0.1). Batch paths
    sit on checkpoints; a stream cannot — so the streaming near-dup
    plan must contain ZERO Filter nodes between source and the
    stateful op (drop_empty=False invariant, empty signatures handled
    inside the bucket kernel)."""
    import re

    from biodwh2_arcadedb_server_spark.streaming.neardup import (
        read_documents_stream,
        streaming_minhash_candidates,
    )

    stream = read_documents_stream(spark, sf_small)
    out = streaming_minhash_candidates(
        stream, k=3, num_hashes=32, bands=8, rows=4,
        coarse_buckets=16, spread=32,
    )
    plan = out._jdf.queryExecution().analyzed().toString()
    assert len(re.findall(r"^\s*(?:\+-|:-)?\s*~?Filter", plan, re.M)) == 0, plan
