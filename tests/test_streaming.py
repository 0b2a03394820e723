"""C7 streaming tests: batch/stream parity (the streaming oracle),
session windows, bounded-state dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from biodwh2_arcadedb_server_spark.operators.relational import q16_tumbling_window
from biodwh2_arcadedb_server_spark.sources.registry import load_table
from biodwh2_arcadedb_server_spark.streaming import events as se


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_tumbling_stream_matches_batch(spark, sf_small):
    """The streaming tumbling agg in complete mode over a finite file
    source must equal the batch window aggregate — the same plan,
    incremental execution."""
    stream = se.read_events_stream(spark, sf_small)
    agg = se.tumbling_agg(stream, "1 hour", "10 minutes")
    q = se.run_stream_to_memory(agg, "tumbling_out", output_mode="complete")
    try:
        got = _rows(spark.table("tumbling_out"))
        want = _rows(q16_tumbling_window(spark, sf_small))
        assert got == want
    finally:
        q.stop()


def test_session_windows(spark, sf_small):
    stream = se.read_events_stream(spark, sf_small)
    sess = se.session_agg(stream, gap="10 minutes", watermark="10 minutes")
    q = se.run_stream_to_memory(sess, "session_out", output_mode="complete")
    try:
        rows = spark.table("session_out").collect()
        assert rows
        for r in rows:
            assert r.session_end >= r.session_start
            assert r.n_events >= 1
        # sessions of one user never overlap
        by_user = {}
        for r in rows:
            by_user.setdefault(r.user_id, []).append((r.session_start, r.session_end))
        for spans in by_user.values():
            spans.sort()
            for (s1, e1), (s2, _) in zip(spans, spans[1:]):
                assert s2 >= e1
    finally:
        q.stop()


def test_stream_dedup_bounded_state(spark, sf_small):
    stream = se.read_events_stream(spark, sf_small)
    deduped = se.stream_dedup(stream, watermark="1 hour")
    q = se.run_stream_to_memory(deduped, "dedup_out", output_mode="append")
    try:
        n_stream = spark.table("dedup_out").count()
        n_batch = load_table(spark, sf_small, "events").dropDuplicates(["event_id"]).count()
        assert n_stream == n_batch  # event_ids are unique in testdata
    finally:
        q.stop()


def test_sliding_total_events(spark, sf_small):
    """Every event falls in exactly window/slide sliding windows."""
    stream = se.read_events_stream(spark, sf_small)
    agg = se.sliding_agg(stream, "1 hour", "30 minutes", "10 minutes")
    q = se.run_stream_to_memory(agg, "sliding_out", output_mode="complete")
    try:
        total = spark.table("sliding_out").agg(F.sum("n")).collect()[0][0]
        n_events = load_table(spark, sf_small, "events").count()
        assert total == 2 * n_events
    finally:
        q.stop()


def test_trigger_cadence_never_changes_results(spark, sf_small, tmp_path):
    """ROADMAP rate-limited-source parity: a rate-limited or chunked
    source only changes HOW FAST event-time advances per trigger,
    never which windows are emitted. The same events replayed as 4
    micro-batches and as 1 must produce identical tumbling windows,
    both equal to the batch aggregate."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        os.path.join(sf_small, "events.parquet"), columns=["ts", "event_type", "value"]
    )
    tbl = tbl.set_column(
        tbl.schema.get_field_index("ts"),
        "ts",
        tbl.column("ts").cast(pa.timestamp("us"), safe=False),
    )
    df = tbl.to_pandas().sort_values("ts", ignore_index=True)
    src = str(tmp_path / "chunks")
    os.makedirs(src)
    bounds = [round(i * len(df) / 4) for i in range(5)]
    for i in range(4):
        path = os.path.join(src, f"c{i}.parquet")
        pq.write_table(pa.Table.from_pandas(df.iloc[bounds[i]:bounds[i + 1]], preserve_index=False), path)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    def run(max_files, name):
        stream = (
            spark.readStream.schema("ts timestamp, event_type string, value double")
            .option("maxFilesPerTrigger", max_files)
            .parquet(src)
        )
        agg = se.tumbling_agg(stream, "1 hour", "10 minutes")
        q = se.run_stream_to_memory(agg, name, output_mode="complete")
        try:
            return _rows(spark.table(name))
        finally:
            q.stop()

    slow = run(1, "cadence_slow")  # 4 micro-batches
    fast = run(4, "cadence_fast")  # 1 micro-batch
    want = _rows(q16_tumbling_window(spark, sf_small))
    assert slow == fast == want

    # same contract for OVERLAPPING windows: sliding-window emission
    # is watermark-driven too, so cadence must not change which of the
    # two windows each event lands in (ROADMAP r1 #3, sliding half)
    def run_sliding(max_files, name):
        stream = (
            spark.readStream.schema("ts timestamp, event_type string, value double")
            .option("maxFilesPerTrigger", max_files)
            .parquet(src)
        )
        agg = se.sliding_agg(stream, "1 hour", "30 minutes", "10 minutes")
        q = se.run_stream_to_memory(agg, name, output_mode="complete")
        try:
            return _rows(spark.table(name))
        finally:
            q.stop()

    from biodwh2_arcadedb_server_spark.operators.relational4 import q63_sliding_window

    slow_s = run_sliding(1, "cadence_slide_slow")
    fast_s = run_sliding(4, "cadence_slide_fast")
    want_s = _rows(q63_sliding_window(spark, sf_small))
    assert slow_s == fast_s == want_s and len(slow_s) > 0
