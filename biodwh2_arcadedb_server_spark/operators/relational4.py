"""Driver-contract probe batch 4: paging, grouping sets, map values,
sketch aggregates, and the Python UDTF surface.

Reference parity: ArcadeDB SQL serves `SKIP`/`LIMIT` paging, grouped
aggregates, and embedded-map property access (pom.xml:104-108 [B],
SURVEY.md B9/B11/B17); UDTFs extend the C8 user-function surface the
same way `LET`-style server-side functions extend the reference's.

Scale notes (100 TB):
- OFFSET paging (q57) composes with a total sort only on the final
  page-sized result (TakeOrderedAndProject) — never a full sort of
  the table; deep paging at scale should switch to keyset pagination
  (WHERE key > last_seen), noted here as the contract.
- GROUPING SETS (q58) computes all sets in one shuffle (Expand node:
  each row replicated per set map-side, then one hash agg) rather
  than one job per set.
- approx_count_distinct (q60) is the sketch path: HLL++ partials are
  mergeable map-side, so the shuffle carries fixed-size sketches, not
  value sets — the only viable distinct-count at 100 TB.
- Python UDTFs (q61) run one Python worker per input partition with
  Arrow transfer; the hot-path equivalent stays `posexplode(split())`
  JVM-side. The UDTF exists to pin the extension-point plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biodwh2_arcadedb_server_spark.sources.registry import load_table


# --- B11: ORDER BY + LIMIT + OFFSET (SKIP) ------------------------------------------
def q57_offset_paging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second page of the price-ranked orders (ArcadeDB `SKIP 10
    LIMIT 10`)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", F.round("o_totalprice", 4).alias("price"))
        .offset(10)
        .limit(10)
    )


# --- B9 ext.: explicit GROUPING SETS -------------------------------------------------
def q58_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three explicit grouping sets in one pass — (flag), (status),
    and grand total — disambiguated by GROUPING flags."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping("l_returnflag").alias("g_flag"),
            F.grouping("l_linestatus").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n", "sum_qty")
    )


# --- B17: map construction + access --------------------------------------------------
def q59_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map values as property bags: build, access, introspect. The
    oracle pins the *values* the map operations must produce."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 100)
    m = F.create_map(
        F.lit("seg"), F.col("c_mktsegment"), F.lit("name"), F.col("c_name")
    )
    return c.select(
        "c_custkey",
        F.element_at(m, "seg").alias("seg"),
        F.size(m).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys"),
    )


# --- B10 at scale: sketch distinct (tolerance-contract oracle) -----------------------
def q60_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct users per event type — mergeable fixed-size
    sketches, the only viable distinct-count at 100 TB.

    Oracle strategy (tolerance contract): a sketch can't hash-match a
    cross-engine exact count, so the probe computes BOTH the sketch
    and the exact count in one aggregate and emits the exact count
    plus a ``within_tol`` bound check (|approx−exact|/exact ≤ 5·rsd).
    DuckDB reproduces the exact count and asserts ``true`` — the
    sketch's accuracy contract is what the differential gate verifies.
    tests/test_relational4.py keeps the tighter 3·rsd pin."""
    e = load_table(spark, sf_dir, "events")
    # One map-side-combined shuffle to distinct (event_type, user_id)
    # pairs feeds BOTH aggregates: HLL is duplicate-insensitive, so
    # sketching the deduped pairs gives the identical estimate, and
    # the exact count becomes a plain count — this avoids the expand
    # plan (scan doubling) that countDistinct-next-to-another-agg
    # would produce.
    pairs = e.groupBy("event_type", "user_id").agg(F.lit(1).alias("_one"))
    agg = pairs.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("_approx"),
        F.count(F.lit(1)).alias("exact_users"),
    )
    rel_err = F.abs(F.col("_approx") - F.col("exact_users")) / F.greatest(
        F.col("exact_users"), F.lit(1)
    )
    return agg.select(
        "event_type", "exact_users", (rel_err <= 0.05).alias("within_tol")
    )


# --- C8: Python UDTF (table function) ------------------------------------------------
# The synthetic documents contain no sentence punctuation; splitting
# on the frequent token " a " gives real multi-segment output while
# keeping re.split / regexp_split_to_array semantics identical.
SENTENCE_SPLIT_REGEX = r"\sa\s"


def q61_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence explosion of the first documents through a Python
    UDTF in a LATERAL join — the table-function extension point.
    Same output contract as JVM-side posexplode(split(...))."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, sentence string")
    class SplitSentences:
        def eval(self, text: str):
            if text is None:
                return
            for i, s in enumerate(re.split(SENTENCE_SPLIT_REGEX, text)):
                yield i, s

    spark.udtf.register("split_sentences", SplitSentences)
    load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50).select(
        "doc_id", "text"
    ).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, s.pos, s.sentence "
        "FROM _udtf_docs d, LATERAL split_sentences(d.text) s"
    )


# --- C7: stream-static enrichment, batch-checkable ----------------------------------
def q62_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stream-static dimension join (streaming/joins.py) to
    completion over the finite events source, then aggregate the
    enriched output — the oracle is the equivalent batch join."""
    from biodwh2_arcadedb_server_spark.streaming import state_partitions
    from biodwh2_arcadedb_server_spark.streaming.events import read_events_stream
    from biodwh2_arcadedb_server_spark.streaming.joins import enrich_with_dim

    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    with state_partitions(spark):
        stream = read_events_stream(spark, sf_dir)
        out = enrich_with_dim(stream, dim, "user_id", "c_custkey").select(
            "event_id", "c_mktsegment"
        )
        q = (
            out.writeStream.format("memory")
            .queryName("q62_enriched")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table("q62_enriched")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


# --- C7: sliding-window aggregate, batch-checkable ----------------------------------
def q63_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes: each event lands in
    exactly 2 windows. Same plan shape as streaming.events.sliding_agg;
    the oracle explodes each event into its two window starts."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


# --- C7: watermarked stream-stream self-join, drained (oracled) ----------------------
def q127_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the watermarked stream-stream self-join
    (streaming/joins.py::follow_within): ordered same-user event pairs
    within a 30-minute band. INNER stream-stream joins emit on match
    (no watermark holdback), so the drained set equals the batch
    self-join — which is the oracle. The watermark still matters at
    scale: it is what bounds each side's join state to
    O(rate × band) instead of the whole stream.

    The oracle CASTs ts to µs TIMESTAMP: the parquet is
    TIMESTAMP(NANOS) and the band inequalities must be evaluated at
    the same precision on both engines."""
    from biodwh2_arcadedb_server_spark.streaming import state_partitions
    from biodwh2_arcadedb_server_spark.streaming.events import read_events_stream
    from biodwh2_arcadedb_server_spark.streaming.joins import follow_within

    with state_partitions(spark):
        stream = read_events_stream(spark, sf_dir).where(F.col("user_id") < 50)
        out = follow_within(stream, within="30 minutes", watermark="10 minutes")
        q = (
            out.writeStream.format("memory")
            .queryName("q127_pairs")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table("q127_pairs").select("user_id", "l_event_id", "r_event_id")


# --- B14 ext.: regex + conditional battery ------------------------------------------
def q64_regex_conditionals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract/replace plus CASE/NULLIF/COALESCE — the scalar
    shapes ArcadeDB SQL's string functions and CASE expressions serve."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 5000)
    return o.select(
        "o_orderkey",
        F.regexp_extract("o_orderpriority", r"(\d)-(\w+)", 2).alias("prio_word"),
        F.regexp_replace("o_orderpriority", "[AEIOU]", "_").alias("devoweled"),
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias("status"),
    )


QUERIES = {
    "q57_offset_paging": q57_offset_paging,
    "q58_grouping_sets": q58_grouping_sets,
    "q59_map_functions": q59_map_functions,
    "q60_approx_distinct": q60_approx_distinct,
    "q61_udtf_sentences": q61_udtf_sentences,
    "q62_stream_enrich": q62_stream_enrich,
    "q127_stream_stream_join": q127_stream_stream_join,
    "q63_sliding_window": q63_sliding_window,
    "q64_regex_conditionals": q64_regex_conditionals,
}

ORACLE = {
    "q57_offset_paging": """
        SELECT o_orderkey, ROUND(o_totalprice, 4) AS price
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10 OFFSET 10
    """,
    "q58_grouping_sets": """
        SELECT l_returnflag, l_linestatus,
               CAST(CASE WHEN GROUPING(l_returnflag) THEN 1 ELSE 0 END AS TINYINT) AS g_flag,
               CAST(CASE WHEN GROUPING(l_linestatus) THEN 1 ELSE 0 END AS TINYINT) AS g_status,
               COUNT(*) AS n,
               ROUND(SUM(l_quantity), 4) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    "q59_map_functions": """
        SELECT c_custkey,
               c_mktsegment AS seg,
               2 AS n_keys,
               'name,seg' AS keys
        FROM customer WHERE c_custkey <= 100
    """,
    "q60_approx_distinct": """
        SELECT event_type,
               COUNT(DISTINCT user_id) AS exact_users,
               TRUE AS within_tol
        FROM events GROUP BY event_type
    """,
    "q61_udtf_sentences": f"""
        SELECT doc_id,
               CAST(generate_subscripts(arr, 1) - 1 AS INTEGER) AS pos,
               unnest(arr) AS sentence
        FROM (
            SELECT doc_id, regexp_split_to_array(text, '{SENTENCE_SPLIT_REGEX}') AS arr
            FROM documents WHERE doc_id < 50
        )
    """,
    "q127_stream_stream_join": """
        SELECT l.user_id,
               l.event_id AS l_event_id,
               r.event_id AS r_event_id
        FROM events l JOIN events r
          ON r.user_id = l.user_id
         AND CAST(r.ts AS TIMESTAMP) > CAST(l.ts AS TIMESTAMP)
         AND CAST(r.ts AS TIMESTAMP) <= CAST(l.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
        WHERE l.user_id < 50 AND r.user_id < 50
    """,
    "q62_stream_enrich": """
        SELECT c.c_mktsegment, COUNT(*) AS n_events
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    "q63_sliding_window": """
        SELECT ws AS window_start, event_type, COUNT(*) AS n
        FROM (
            SELECT event_type,
                   unnest([time_bucket(INTERVAL 30 MINUTES, ts),
                           time_bucket(INTERVAL 30 MINUTES, ts) - INTERVAL 30 MINUTES]) AS ws
            FROM events
        )
        GROUP BY ws, event_type
    """,
    "q64_regex_conditionals": r"""
        SELECT o_orderkey,
               regexp_extract(o_orderpriority, '(\d)-(\w+)', 2) AS prio_word,
               regexp_replace(o_orderpriority, '[AEIOU]', '_', 'g') AS devoweled,
               CASE WHEN o_totalprice > 200000 THEN 'high'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'low' END AS band,
               COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status
        FROM orders WHERE o_orderkey <= 5000
    """,
}
