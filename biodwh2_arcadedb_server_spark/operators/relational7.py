"""Driver-contract probe batch 7: time-grid gap-fill with LOCF,
deterministic mode + bivariate statistics, and exact-k weighted
sampling (Efraimidis–Spirakis exponential keys).

Reference parity: ArcadeDB SQL covers these shapes with client-side
post-processing (SURVEY.md B9/B11/B16); warehouse SQL spells them
generate_series + window fill, MODE()/CORR(), and ORDER BY key
LIMIT k. The Spark-first forms:

- Gap-fill + LOCF (q111): the time-series staple — build the dense
  (entity × day) grid from `sequence()` + explode, left-join the
  per-day aggregate, and carry the last observation forward with
  `last(col, ignorenulls=True)` over an unbounded-preceding window.
- Mode + correlation (q112): Spark's built-in `F.mode` documents
  nondeterministic tie-breaks, which a differential gate cannot
  tolerate — the probe desugars mode to count + rank with a
  value-order tie-break, which both engines reproduce bit-for-bit.
  CORR / COVAR_SAMP / STDDEV_SAMP share one definition (Pearson,
  n−1 denominators) across engines and ride the same aggregate.
- Weighted sampling without replacement (q113): Efraimidis–Spirakis
  A-ES — key_i = u_i^(1/w_i) with u_i a deterministic md5-derived
  uniform, keep the global top-k keys. The standard distributed
  exact-k weighted sample: one map-only key computation + a top-k.

Scale notes (100 TB):
- q111's grid is |entities| × |days| — generated, never shuffled
  (the day spine is a broadcast of one tiny exploded row). The LOCF
  window shuffles once on the entity key; per-partition state is one
  running value. At scale the grid join is the cost — keep the day
  spine bounded (partition the fill by calendar range) and the left
  side pre-aggregated (per entity-day, not per event).
- q112 is two hash aggregates, both map-side combined: the moment
  aggregates (corr/covar/stddev) are single-pass streaming partials,
  and the mode desugar's buffer never exceeds the
  (group × distinct-value) domain. No sort, no value buffer — this
  is why mode is desugared rather than collected.
- q113 never sorts the corpus: the exponential keys are map-only
  expressions and `orderBy().limit(k)` plans as
  TakeOrderedAndProject — per-partition top-k heaps merged on the
  driver, O(n) scan + O(k log k) merge, the same pattern at any
  scale. Weights enter only through 1/w in the exponent, so skewed
  weights cannot skew partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from biodwh2_arcadedb_server_spark.sources.registry import load_table

WSAMPLE_K = 100  # exact sample size for q113


# --- B16 ext.: dense time grid + gap-fill + LOCF ------------------------------------
def q111_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily event series with missing days filled: n_events
    gap-filled to 0, daily mean value carried forward (LOCF). The day
    spine derives from the data's own min/max date (the LET pattern:
    a broadcast 1-row aggregate exploded via sequence())."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") <= 20)
    day = F.to_date("ts").alias("day")
    daily = e.groupBy("user_id", day).agg(
        F.count(F.lit(1)).alias("_n"),
        F.round(F.avg("value"), 4).alias("_day_avg"),
    )
    spine = (
        e.agg(F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1"))
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    grid = e.select("user_id").distinct().crossJoin(F.broadcast(spine))
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce(F.col("_n"), F.lit(0)).alias("n_events"),
            F.last("_day_avg", ignorenulls=True).over(w).alias("locf_avg"),
        )
    )


# --- B9 ext.: deterministic mode + bivariate moments --------------------------------
def q112_mode_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per return flag: modal line status (deterministic tie-break)
    plus Pearson correlation, sample covariance, and sample stddev of
    (quantity, extendedprice) — the catalog/feature-engineering
    moment battery q82's single-column profile doesn't cover."""
    li = load_table(spark, sf_dir, "lineitem")
    moments = li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.count(F.lit(1)).alias("n"),
    )
    cnts = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("_c")
    )
    wm = Window.partitionBy("l_returnflag").orderBy(
        F.col("_c").desc(), F.col("l_linestatus")
    )
    mode = (
        cnts.withColumn("_rn", F.row_number().over(wm))
        .where(F.col("_rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_linestatus").alias("mode_status"),
            F.col("_c").alias("mode_n"),
        )
    )
    return moments.join(F.broadcast(mode), "l_returnflag")


# --- training-pipeline staple: exact-k weighted sample (A-ES) -----------------------
def q113_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus subset: keep exactly k documents with
    probability proportional to length (any quality score slots into
    the weight). Efraimidis–Spirakis exponential keys u^(1/w) with a
    deterministic md5 uniform — append-stable, reproducible, and
    rank-equivalent to true weighted sampling without replacement.
    Keys are rounded to 6 decimals with a doc_id tie-break so both
    engines select the identical set despite libm pow ulp noise."""
    d = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 1_000_000
        + 0.5
    ) / 1_000_000.0
    key = F.round(F.pow(u, 1.0 / F.greatest(F.col("n_chars"), F.lit(1))), 6)
    return (
        d.select("doc_id", "source", "n_chars", key.alias("ws_key"))
        .orderBy(F.col("ws_key").desc(), "doc_id")
        .limit(WSAMPLE_K)
    )


# --- B11/B16 ext.: gaps-and-islands interval merge ----------------------------------
MERGE_GAP_MIN = 30  # two activity intervals closer than this merge


def q117_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge each user's event timeline into maximal activity islands
    (intervals separated by gaps > MERGE_GAP_MIN minutes) — the
    gaps-and-islands staple behind sessionization, uptime reporting,
    and interval consolidation. Pure window algebra: a new-island flag
    when the gap from the previous event exceeds the threshold, a
    running sum of flags as the island id, then one aggregate per
    island. Two window passes + one aggregate, all sharing the single
    shuffle on user_id (Catalyst collapses same-partitioning windows
    into one Exchange)."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") <= 40)
    ts_s = F.unix_timestamp(F.col("ts").cast("timestamp"))
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id", "ts", "event_id", ts_s.alias("_s")
    ).withColumn(
        "_new",
        F.when(
            F.col("_s") - F.lag("_s").over(wo) > MERGE_GAP_MIN * 60, 1
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("_new").over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return islands.groupBy("user_id", "island").agg(
        F.min("ts").alias("island_start"),
        F.max("ts").alias("island_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --- B11/B16 ext.: ordered-event funnel ---------------------------------------------
def q118_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user signup → click → purchase funnel with ORDER enforced
    (each stage must follow the previous stage's first completion) —
    the conversion-analysis staple. Expressed as chained conditional
    MIN aggregates over one hash aggregate per stage depth: stage 1 is
    a plain conditional min; later stages re-aggregate events joined
    against the prior stage's timestamps. All joins are on user_id —
    one shuffle key end to end, so the whole funnel co-partitions."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = e.where(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("t_signup")
    )
    s2 = (
        e.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    s3 = (
        e.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        s1.join(s2.select("user_id", "t_click"), "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            "t_signup",
            "t_click",
            "t_purchase",
            (F.col("t_click").isNotNull()).alias("reached_click"),
            (F.col("t_purchase").isNotNull()).alias("converted"),
        )
    )


# --- B11 ext.: time-RANGE rolling window --------------------------------------------
ROLLING_WINDOW_S = 3600  # trailing 1 hour


def q119_rolling_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: count and sum of the user's events in the trailing
    hour — a RANGE frame over event time, not a ROWS frame: the frame
    holds however many events fall in the interval. Spark range
    frames need a numeric ordering column, so the frame is expressed
    over epoch seconds; the DuckDB oracle uses the literal
    RANGE BETWEEN INTERVAL syntax over the timestamp. One shuffle on
    user_id; the range frame is evaluated with a sliding pointer over
    the sorted partition (no per-row rescan)."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") <= 40)
    sec = F.unix_timestamp(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("_s")
        .rangeBetween(-ROLLING_WINDOW_S, 0)
    )
    return (
        e.select("event_id", "user_id", "ts", "value", sec.alias("_s"))
        .select(
            "event_id",
            "user_id",
            F.count(F.lit(1)).over(w).alias("n_1h"),
            F.round(F.sum("value").over(w), 4).alias("sum_1h"),
        )
    )


# --- scale toolkit: Bloom-prefiltered semi-join -------------------------------------
BLOOM_PRICE_MIN = 498_000.0  # top ~0.4% of orders — a genuinely rare build side
BLOOM_LONGS = 64             # 4096 bits ≈ 10 bits/key at sf0.1 → ~2% fp


def q120_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitems of very-high-value orders: the build side (rare order
    keys) folds into a Bloom sketch via one BIT_OR aggregate, the
    probe scan pre-filters on the sketch (map-side, false-positives
    only), and the exact semi-join runs on the survivors — so the
    RESULT is exact (the oracle is the plain semi-join) while the
    shuffle carries only rows that might match. The manual form of
    Spark's runtime bloom join, applicable across stage boundaries
    the optimizer won't cross."""
    from biodwh2_arcadedb_server_spark.operators.skew import (
        bloom_bits,
        bloom_might_contain,
    )

    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > BLOOM_PRICE_MIN
    )
    keys = o.select("o_orderkey")
    bits = bloom_bits(keys, "o_orderkey", n_longs=BLOOM_LONGS)
    li = load_table(spark, sf_dir, "lineitem")
    prefiltered = li.where(bloom_might_contain(F.col("l_orderkey"), bits))
    return (
        prefiltered.join(
            keys, prefiltered.l_orderkey == keys.o_orderkey, "left_semi"
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        )
    )


# --- training/feature staple: co-occurrence + PMI -----------------------------------
def q123_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between event types co-occurring
    in the same user's history — the association-mining /
    embedding-pretraining staple (PMI matrices seed word/item
    vectors). Presence is deduplicated per (user, type) first so the
    measure is over users, not raw event counts; the pair join fans
    out per-user |types|² — bounded by the type domain here; with a
    large item catalog cap the per-user basket (top-d by recency)
    before the join, the standard mitigation."""
    e = load_table(spark, sf_dir, "events")
    pres = e.select("user_id", "event_type").distinct()
    n_users = pres.select("user_id").distinct().count()
    a = pres.select("user_id", F.col("event_type").alias("type_a"))
    b = pres.select("user_id", F.col("event_type").alias("type_b"))
    pair = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    singles = pres.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_s"))
    sa = singles.select(F.col("event_type").alias("type_a"), F.col("n_s").alias("_na"))
    sb = singles.select(F.col("event_type").alias("type_b"), F.col("n_s").alias("_nb"))
    return (
        pair.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_ab",
            F.round(
                F.log(
                    F.col("n_ab") * F.lit(float(n_users))
                    / (F.col("_na") * F.col("_nb"))
                ),
                4,
            ).alias("pmi"),
        )
    )


# --- warehouse staple: retention cohort analysis ------------------------------------
def q124_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users cohorted by first-activity
    week; retention(cohort, k) = share of the cohort active k weeks
    later. Three aggregates sharing the user_id shuffle key: per-user
    cohort week (min), distinct user-week activity, then the
    cohort×offset rollup against broadcast cohort sizes."""
    e = load_table(spark, sf_dir, "events")
    week = F.to_date(F.date_trunc("week", F.col("ts"))).alias("week")
    activity = e.select("user_id", week).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohort.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    joined = activity.join(cohort, "user_id").select(
        "user_id",
        "cohort_week",
        (F.datediff(F.col("week"), F.col("cohort_week")) / 7).cast("int").alias("week_k"),
    )
    return (
        joined.groupBy("cohort_week", "week_k")
        .agg(F.count_distinct("user_id").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_k",
            "n_active",
            F.round(F.col("n_active") / F.col("cohort_size"), 4).alias("retention"),
        )
    )


# --- feature staple: first-order Markov transition matrix ---------------------------
def q125_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical first-order Markov chain over each user's event
    sequence: P(next=cur | prev) from lag pairs. One window shuffle on
    user_id for the lag, one hash aggregate for pair counts; the
    per-prev totals ride a window over the (small) pair table."""
    e = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            "user_id",
            F.lag("event_type").over(wo).alias("prev"),
            F.col("event_type").alias("cur"),
        )
        .where(F.col("prev").isNotNull())
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wp = Window.partitionBy("prev")
    return pairs.select(
        "prev",
        "cur",
        "n",
        F.round(F.col("n") / F.sum("n").over(wp), 4).alias("p"),
    )


QUERIES = {
    "q111_gap_fill": q111_gap_fill,
    "q112_mode_corr": q112_mode_corr,
    "q113_weighted_sample": q113_weighted_sample,
    "q117_interval_merge": q117_interval_merge,
    "q118_funnel": q118_funnel,
    "q119_rolling_time_window": q119_rolling_time_window,
    "q120_bloom_semi_join": q120_bloom_semi_join,
    "q123_cooccurrence_pmi": q123_cooccurrence_pmi,
    "q124_retention_cohorts": q124_retention_cohorts,
    "q125_markov_transitions": q125_markov_transitions,
}


ORACLE = {
    "q111_gap_fill": """
        WITH e AS (
            SELECT user_id, CAST(ts AS DATE) AS day, value
            FROM events WHERE user_id <= 20),
        daily AS (
            SELECT user_id, day, COUNT(*) AS n,
                   ROUND(AVG(value), 4) AS day_avg
            FROM e GROUP BY user_id, day),
        spine AS (
            SELECT CAST(UNNEST(generate_series(
                       (SELECT MIN(day) FROM e),
                       (SELECT MAX(day) FROM e),
                       INTERVAL 1 DAY)) AS DATE) AS day),
        grid AS (
            SELECT u.user_id, s.day
            FROM (SELECT DISTINCT user_id FROM e) u CROSS JOIN spine s)
        SELECT g.user_id, g.day,
               COALESCE(d.n, 0) AS n_events,
               LAST_VALUE(d.day_avg IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS locf_avg
        FROM grid g LEFT JOIN daily d
          ON g.user_id = d.user_id AND g.day = d.day
    """,
    "q112_mode_corr": """
        WITH moments AS (
            SELECT l_returnflag,
                   ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qty_price,
                   ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS covar_qty_price,
                   ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_qty,
                   COUNT(*) AS n
            FROM lineitem GROUP BY l_returnflag),
        cnts AS (
            SELECT l_returnflag, l_linestatus, COUNT(*) AS c
            FROM lineitem GROUP BY l_returnflag, l_linestatus),
        mode AS (
            SELECT l_returnflag, l_linestatus AS mode_status, c AS mode_n
            FROM cnts
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY l_returnflag
                ORDER BY c DESC, l_linestatus) = 1)
        SELECT m.l_returnflag, m.corr_qty_price, m.covar_qty_price,
               m.sd_qty, m.n, d.mode_status, d.mode_n
        FROM moments m JOIN mode d USING (l_returnflag)
    """,
    "q113_weighted_sample": f"""
        SELECT doc_id, source, n_chars,
               ROUND(POW(
                   (('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                        % 1000000 + 0.5) / 1000000.0,
                   1.0 / GREATEST(n_chars, 1)), 6) AS ws_key
        FROM documents
        ORDER BY ws_key DESC, doc_id
        LIMIT {WSAMPLE_K}
    """,
    "q124_retention_cohorts": """
        WITH activity AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS DATE) AS week
            FROM events),
        cohort AS (
            SELECT user_id, MIN(week) AS cohort_week
            FROM activity GROUP BY user_id),
        sizes AS (
            SELECT cohort_week, COUNT(*) AS cohort_size
            FROM cohort GROUP BY cohort_week),
        joined AS (
            SELECT a.user_id, c.cohort_week,
                   CAST(date_diff('day', c.cohort_week, a.week) / 7 AS INTEGER)
                       AS week_k
            FROM activity a JOIN cohort c ON a.user_id = c.user_id)
        SELECT j.cohort_week, j.week_k,
               COUNT(DISTINCT j.user_id) AS n_active,
               ROUND(COUNT(DISTINCT j.user_id) * 1.0 / s.cohort_size, 4)
                   AS retention
        FROM joined j JOIN sizes s ON s.cohort_week = j.cohort_week
        GROUP BY j.cohort_week, j.week_k, s.cohort_size
    """,
    "q125_markov_transitions": """
        WITH lagged AS (
            SELECT user_id,
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev,
                   event_type AS cur
            FROM events),
        pairs AS (
            SELECT prev, cur, COUNT(*) AS n
            FROM lagged WHERE prev IS NOT NULL GROUP BY prev, cur)
        SELECT prev, cur, n,
               ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY prev), 4) AS p
        FROM pairs
    """,
    "q123_cooccurrence_pmi": """
        WITH pres AS (
            SELECT DISTINCT user_id, event_type FROM events),
        pair AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   COUNT(*) AS n_ab
            FROM pres a JOIN pres b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY a.event_type, b.event_type),
        singles AS (
            SELECT event_type, COUNT(*) AS n_s FROM pres GROUP BY event_type),
        n AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM pres)
        SELECT p.type_a, p.type_b, p.n_ab,
               ROUND(ln(p.n_ab * (SELECT n_users * 1.0 FROM n)
                        / (sa.n_s * sb.n_s)), 4) AS pmi
        FROM pair p
        JOIN singles sa ON sa.event_type = p.type_a
        JOIN singles sb ON sb.event_type = p.type_b
    """,
    # the bloom is pruning-only, so the oracle is the PLAIN semi-join
    "q120_bloom_semi_join": f"""
        SELECT l_returnflag, COUNT(*) AS n,
               ROUND(SUM(l_quantity), 4) AS sum_qty
        FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders
            WHERE o_totalprice > {BLOOM_PRICE_MIN})
        GROUP BY l_returnflag
    """,
    # numeric RANGE frame over truncated epoch seconds on BOTH sides:
    # a literal INTERVAL frame over the raw microsecond timestamps
    # would disagree with Spark's second-granularity frame at exact
    # boundary events
    "q119_rolling_time_window": f"""
        SELECT event_id, user_id,
               COUNT(*) OVER w AS n_1h,
               ROUND(SUM(value) OVER w, 4) AS sum_1h
        FROM (SELECT event_id, user_id, value,
                     CAST(floor(epoch(ts)) AS BIGINT) AS s
              FROM events WHERE user_id <= 40)
        WINDOW w AS (PARTITION BY user_id ORDER BY s
                     RANGE BETWEEN {ROLLING_WINDOW_S} PRECEDING AND CURRENT ROW)
    """,
    "q117_interval_merge": f"""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                               - LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER w
                             > {MERGE_GAP_MIN} * 60
                        THEN 1 ELSE 0 END AS new_flag
            FROM events WHERE user_id <= 40
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        islands AS (
            SELECT user_id, ts,
                   CAST(SUM(new_flag) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS island
            FROM flagged)
        SELECT user_id, island,
               MIN(ts) AS island_start, MAX(ts) AS island_end,
               COUNT(*) AS n_events
        FROM islands GROUP BY user_id, island
    """,
    "q118_funnel": """
        WITH s1 AS (
            SELECT user_id, MIN(ts) AS t_signup
            FROM events WHERE event_type = 'signup' GROUP BY user_id),
        s2 AS (
            SELECT e.user_id, MIN(e.ts) AS t_click
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND e.ts > s1.t_signup
            GROUP BY e.user_id),
        s3 AS (
            SELECT e.user_id, MIN(e.ts) AS t_purchase
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
            GROUP BY e.user_id)
        SELECT s1.user_id, s1.t_signup, s2.t_click, s3.t_purchase,
               (s2.user_id IS NOT NULL) AS reached_click,
               (s3.user_id IS NOT NULL) AS converted
        FROM s1
        LEFT JOIN s2 ON s1.user_id = s2.user_id
        LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
}
