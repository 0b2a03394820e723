"""Driver-contract probe batch 6: QUALIFY-style window filters,
windowed DISTINCT aggregates, and SQL-surface LATERAL VIEW.

Reference parity: ArcadeDB SQL answers "top-N per group" with nested
SELECT + LIMIT per bucket and offers UNWIND for array fan-out
(SURVEY.md B11/B13/B17); modern warehouse SQL spells these QUALIFY
and LATERAL. The Spark-first forms:

- QUALIFY (q101): a window function in the same SELECT used as a
  filter. Spark has no QUALIFY keyword; the DataFrame form
  (withColumn(rank) → where) IS the desugared QUALIFY plan — one
  Window operator, filter applied before any downstream shuffle.
  The DuckDB oracle uses the literal QUALIFY keyword.
- Windowed DISTINCT aggregate (q102): COUNT(DISTINCT x) OVER (...)
  is unsupported in Spark windows; `size(collect_set(x) over w)` is
  the JVM-side equivalent (the set lives in the window buffer,
  never in Python).
- LATERAL VIEW (q103): the HiveQL/Spark SQL generator syntax —
  posexplode fan-out with the ordinal position preserved; the
  equivalent of ArcadeDB's UNWIND with index. Runs through
  spark.sql() to pin the SQL surface itself, not just the
  DataFrame API.

Scale notes (100 TB):
- q101's window shuffles once on the partition key; the rank filter
  prunes before anything else runs. For top-N per group where N is
  tiny and groups are huge, the window approach beats
  groupBy+collect_list because it never materializes a group in one
  buffer... but a skewed partition key still serializes per-key —
  salt the key or pre-aggregate if one group dominates.
- q102's collect_set buffer is bounded by per-key distinct
  cardinality (event types: dozens) — safe; for unbounded domains
  use approx_count_distinct over groupBy instead of a window.
- q103's explode multiplies rows before the downstream filter —
  project only needed columns BEFORE the explode so the fan-out
  carries narrow rows (the probe projects doc_id + token only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from biodwh2_arcadedb_server_spark.sources.registry import load_table


# --- B11 ext.: QUALIFY-style top-N per group ---------------------------------------
def q101_qualify_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer by price — the QUALIFY idiom: rank in
    the projection, filter on it, no subquery nesting. One window
    shuffle on o_custkey."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.where(F.col("o_custkey") <= 300)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 2)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("price"),
            "rnk",
        )
    )


# --- B9/B11 ext.: DISTINCT aggregate over a window ---------------------------------
def q102_windowed_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: how many DISTINCT event types has this user produced
    up to (and incl.) this event's time — a running feature-engineering
    staple. COUNT(DISTINCT) OVER is not in Spark's window surface;
    size(collect_set() over w) is the JVM-side desugaring (set grows
    in the window buffer — bounded by the event-type domain)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.where(F.col("user_id") <= 50)
        .select(
            "event_id",
            "user_id",
            F.size(F.collect_set("event_type").over(w)).alias("n_distinct_types"),
        )
    )


# --- B13/B17 ext.: LATERAL VIEW posexplode through the SQL surface ------------------
def q103_lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token fan-out with ordinal position via the literal
    `LATERAL VIEW posexplode` SQL syntax (ArcadeDB UNWIND parity) —
    pins the SQL-surface spelling, not just the DataFrame form.
    Narrow projection before the explode: only doc_id + the token
    array enter the generator."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_docs_q103")
    return spark.sql(
        """
        SELECT doc_id, pos, tok
        FROM (
            SELECT doc_id,
                   filter(split(lower(text), '\\\\s+'), x -> x != '') AS toks
            FROM _docs_q103
            WHERE doc_id < 40
        )
        LATERAL VIEW posexplode(toks) t AS pos, tok
        WHERE length(tok) >= 8
        """
    )


# --- training-pipeline staple: length-bucketed batch assembly -----------------------
BATCH_BAND_CHARS = 200   # documents within one band pad to a similar length
BATCH_SHARDS = 8         # parallel packers per band (scale knob)
BATCH_SIZE = 16          # docs per batch


def q105_length_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch assignment — the padding-efficiency
    staple: group documents into length BANDS (similar-length docs
    batch together, so per-batch padding waste is bounded by the band
    width), then assign contiguous batch ids within each (band,
    shard). Sharding is the scale design, as in sequence packing: the
    window partitions on (band, shard) so no band serializes through
    one task, and batch ids stay globally unique via the (band,
    shard) prefix. Pure key functions + one window — no rand(), no
    global sort."""
    d = load_table(spark, sf_dir, "documents")
    band = F.floor(F.col("n_chars") / BATCH_BAND_CHARS)
    shard = F.col("doc_id") % BATCH_SHARDS
    w = Window.partitionBy("band", "shard").orderBy("doc_id")
    return (
        d.select("doc_id", "n_chars", band.alias("band"), shard.alias("shard"))
        .withColumn(
            "batch_id",
            (F.col("band") * BATCH_SHARDS + F.col("shard")) * 1_000_000
            + F.floor((F.row_number().over(w) - 1) / BATCH_SIZE),
        )
        .select("doc_id", "n_chars", "band", "batch_id")
    )


# --- training-pipeline staple: temperature resampling across sources ----------------
TEMP_ALPHA = 0.5  # mixture temperature: kept_s ∝ count_s^alpha


def q107_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft domain rebalancing — the mixture-temperature staple
    (multilingual/multi-source pre-training): keep each source's
    documents at rate (c_min/c_s)^(1-alpha), so kept counts follow
    c_s^alpha (alpha=1 keeps natural proportions, alpha→0 equalizes
    sources; the smallest source keeps 100%). Complements q99's hard
    per-source cap with a smooth curve. Keep decisions are the usual
    deterministic md5 bucket — no rand(), append-stable. The
    per-source rates ride as one broadcast aggregate (counts) plus
    one broadcast 1-row min (the LET pattern) — map-only over the
    corpus, no corpus shuffle."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("_c"))
    cmin = counts.agg(F.min("_c").alias("_cmin"))
    rates = counts.crossJoin(F.broadcast(cmin)).select(
        "source",
        "_c",
        F.pow(F.col("_cmin") / F.col("_c"), 1.0 - TEMP_ALPHA).alias("_rate"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit("t:"), F.col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("long") % 1_000_000
    )
    return (
        d.join(F.broadcast(rates), "source")
        .where(bucket < F.floor(F.col("_rate") * 1_000_000))
        .select(
            "doc_id",
            "source",
            F.round("_rate", 4).alias("keep_rate"),
        )
    )


QUERIES = {
    "q101_qualify_topn": q101_qualify_topn,
    "q102_windowed_distinct": q102_windowed_distinct,
    "q103_lateral_explode": q103_lateral_explode,
    "q105_length_batching": q105_length_batching,
    "q107_temperature_resample": q107_temperature_resample,
}

ORACLE = {
    # DuckDB spells the idiom with the actual QUALIFY keyword
    "q101_qualify_topn": """
        SELECT o_custkey, o_orderkey,
               ROUND(o_totalprice, 4) AS price,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rnk
        FROM orders
        WHERE o_custkey <= 300
        QUALIFY rnk <= 2
    """,
    # DuckDB supports DISTINCT window aggregates natively
    "q102_windowed_distinct": """
        SELECT event_id, user_id,
               CAST(COUNT(DISTINCT event_type) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER)
                   AS n_distinct_types
        FROM events
        WHERE user_id <= 50
    """,
    "q107_temperature_resample": f"""
        WITH counts AS (
            SELECT source, COUNT(*) AS c FROM documents GROUP BY source),
        rates AS (
            SELECT source,
                   POW((SELECT MIN(c) FROM counts) * 1.0 / c, 1.0 - {TEMP_ALPHA}) AS rate
            FROM counts)
        SELECT d.doc_id, d.source, ROUND(r.rate, 4) AS keep_rate
        FROM documents d JOIN rates r ON d.source = r.source
        WHERE ('0x' || substr(md5('t:' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
                  % 1000000
              < CAST(FLOOR(r.rate * 1000000) AS BIGINT)
    """,
    "q105_length_batching": f"""
        SELECT doc_id, n_chars, band,
               (band * {BATCH_SHARDS} + shard) * 1000000
                 + CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY band, shard
                       ORDER BY doc_id) - 1) / {BATCH_SIZE}) AS BIGINT) AS batch_id
        FROM (SELECT doc_id, n_chars,
                     CAST(FLOOR(n_chars / {BATCH_BAND_CHARS}) AS BIGINT) AS band,
                     doc_id % {BATCH_SHARDS} AS shard
              FROM documents)
    """,
    # DuckDB has no WITH ORDINALITY; parallel UNNESTs zip positionally
    "q103_lateral_explode": r"""
        SELECT doc_id, pos, tok FROM (
            SELECT doc_id,
                   CAST(UNNEST(generate_series(0, len(toks)-1)) AS INTEGER) AS pos,
                   UNNEST(toks) AS tok
            FROM (SELECT doc_id,
                         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
                  FROM documents WHERE doc_id < 40)
        ) WHERE length(tok) >= 8
    """,
}
