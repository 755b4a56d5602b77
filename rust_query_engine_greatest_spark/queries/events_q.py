"""Event-log analytics suite over the `events` table — the ClickBench
analog of the reference's benchmark surface (`benchmarks/src/clickbench.rs`,
`benchmarks/queries/clickbench/queries.sql`: hits-table scan/agg/top-k
queries). The reference ships that harness as *capability*; here each
shape is a first-class oracle-checked query at TESTDATA scale.

Scale notes: every query is a scan → (optional) shuffle-on-group-key →
small result. At 100 TB the events table would be date-partitioned;
`ts`-derived group keys (day, 15-min bin) align with partition pruning,
and the per-type/user aggregations shuffle only the grouping columns
(column pruning verified in plans/explain.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import compat
from ..sources.catalog import load_table
from .base import dec2, dsum, register

# value is a 2-dp monetary double → exact-decimal recipe (base.py).
VAL = "CAST(value AS DECIMAL(12,2))"


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@register(
    "events_daily_type",
    f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           event_type,
           COUNT(*)                         AS n,
           CAST(SUM({VAL}) AS DOUBLE)       AS total_value,
           CAST(SUM({VAL}) AS DOUBLE) / COUNT(*) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "aggregate", "bench"),
)
def events_daily_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type rollup (ClickBench Q-family: GROUP BY date, type).
    date_trunc group key aligns with date partitioning at scale."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            F.date_trunc("day", "ts").alias("day"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n"),
            dsum(dec2("value"), "total_value"),
            (F.sum(dec2("value")).cast("double") / F.count(F.lit(1))).alias("avg_value"),
        )
    )


@register(
    "events_json_extract",
    f"""
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) // 10 AS k_bucket,
           COUNT(*)                   AS n,
           CAST(SUM({VAL}) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
    tags=("events", "json", "bench"),
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props: JSON field extraction + bucketed agg
    (reference has JSON only as an ingest format, SURVEY §2.8 — Spark's
    get_json_object exceeds it; this query proves the surface)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.expr("CAST(get_json_object(props, '$.k') AS INT) div 10").alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(dec2("value"), "total_value"),
        )
    )


@register(
    "events_top_users",
    f"""
    WITH s AS (
        SELECT event_type, user_id, CAST(SUM({VAL}) AS DOUBLE) AS total_value
        FROM events GROUP BY event_type, user_id)
    SELECT event_type, user_id, total_value
    FROM (SELECT *, rank() OVER (PARTITION BY event_type
                                 ORDER BY total_value DESC, user_id) AS rk FROM s)
    WHERE rk <= 3
    """,
    tags=("events", "topk"),
)
def events_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 users per event type by exact-decimal spend: two-level agg →
    ranked window, the reference's TopK-aggregation shape
    (physical-optimizer/src/topk_aggregation.rs) at event-log scale."""
    e = _events(spark, sf_dir)
    s = e.groupBy("event_type", "user_id").agg(dsum(dec2("value"), "total_value"))
    w = Window.partitionBy("event_type").orderBy(F.desc("total_value"), "user_id")
    return (
        s.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 3)
        .select("event_type", "user_id", "total_value")
    )


@register(
    "events_funnel",
    """
    WITH m AS (
        SELECT user_id,
               min(ts) FILTER (WHERE event_type = 'view')     AS first_view,
               min(ts) FILTER (WHERE event_type = 'click')    AS first_click,
               min(ts) FILTER (WHERE event_type = 'purchase') AS first_purchase
        FROM events GROUP BY user_id)
    SELECT user_id, first_view, first_click, first_purchase
    FROM m
    WHERE first_view IS NOT NULL AND first_click IS NOT NULL
      AND first_purchase IS NOT NULL
      AND first_view < first_click AND first_click < first_purchase
    """,
    tags=("events", "funnel"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view→click→purchase funnel via conditional min-timestamps — one
    shuffle on user_id, no self-joins (the n-way-join funnel anti-pattern
    at 100 TB)."""
    e = _events(spark, sf_dir)

    def first_ts(t):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    m = e.groupBy("user_id").agg(
        first_ts("view").alias("first_view"),
        first_ts("click").alias("first_click"),
        first_ts("purchase").alias("first_purchase"),
    )
    return m.filter(
        F.col("first_view").isNotNull()
        & F.col("first_click").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_view") < F.col("first_click"))
        & (F.col("first_click") < F.col("first_purchase"))
    )


@register(
    "events_time_bucket",
    """
    SELECT CAST(floor(epoch(ts) / 900) AS BIGINT) * 900 AS bin_start_s,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS users
    FROM events
    GROUP BY 1
    """,
    tags=("events", "datetime"),
)
def events_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-minute tumbling bins via the compat `date_bin`
    (functions/src/datetime/date_bin.rs) — the batch twin of the
    streaming tumbling-window query (streaming_q.stream_window_counts)."""
    e = _events(spark, sf_dir)
    bin_col = compat.date_bin(900, F.col("ts")).cast("long").alias("bin_start_s")
    return e.groupBy(bin_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("users"),
    )


@register(
    "events_sessionize_batch",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id, CAST(sid AS BIGINT) AS sid, COUNT(*) AS n_events,
           MIN(ts) AS start_ts, MAX(ts) AS end_ts
    FROM sess GROUP BY user_id, sid
    """,
    tags=("events", "window", "session"),
)
def events_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): 30-minute-gap session
    boundaries via lag → flag → running sum, then per-session rollup —
    the exact-oracle batch twin of the stateful streaming
    `stream_sessionize` (applyInPandasWithState), proving identical
    session semantics both ways.

    Plan shape: lag-window, running-sum window, AND the (user_id, sid)
    aggregate all reuse ONE hash exchange on user_id (HashPartitioning
    on a key subset satisfies the aggregate's ClusteredDistribution) —
    the same single-shuffle discipline as q21."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_us = 30 * 60 * 1_000_000
    flagged = ev.select(
        "user_id", "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | ((F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))) > gap_us),
            1,
        ).otherwise(0).alias("new_s"),
    )
    sess = flagged.withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
    )


def _hourly_spine(e):
    """(hourly, spine) for the gap-fill family: per-(event_type, hour)
    aggregate and the hourly calendar spine spanned from each series'
    own min/max hour — one source of truth for bucket granularity and
    bounds across gapfill/interpolate."""
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mv"))
    # bounds are expressed over the hourly AGGREGATE (one source of
    # truth for bucket granularity); Catalyst prunes the spine branch's
    # copy down to a 2-column scan + partial min/max — calendar-sized
    # shuffle. (Exchange reuse as in q11/q15 can't fire here: per-branch
    # column pruning legitimately specializes the two subtrees.)
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .select(
            "event_type",
            F.explode(F.sequence("mn", "mx", F.expr("interval 1 hour"))).alias("h"),
        )
    )
    return hourly, spine


@register(
    "events_gapfill",
    """
    WITH bounds AS (
      SELECT event_type,
             date_trunc('hour', min(ts)) AS mn,
             date_trunc('hour', max(ts)) AS mx
      FROM events GROUP BY event_type),
    spine AS (
      SELECT event_type, UNNEST(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
      FROM bounds),
    hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             COUNT(*) AS n, MAX(value) AS mv
      FROM events GROUP BY event_type, date_trunc('hour', ts))
    SELECT s.event_type, s.h,
           COALESCE(hy.n, 0) AS n,
           last_value(hy.mv IGNORE NULLS)
             OVER (PARTITION BY s.event_type ORDER BY s.h) AS fill_value
    FROM spine s
    LEFT JOIN hourly hy ON hy.event_type = s.event_type AND hy.h = s.h
    """,
    tags=("events", "datetime"),
)
def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill + LOCF interpolation (the
    time_bucket_gapfill/locf operation of telemetry stores — beyond the
    reference, which has no gap-fill): per event_type, an hourly spine
    spanned from the series' own min/max hour (sequence + explode),
    left-joined to the hourly aggregate; missing hours carry count 0 and
    the last observed MAX(value) (IGNORE NULLS window — max is
    order-independent, so the double survives the oracle hash).

    Scale shape: the spine is calendar-sized (rows = hours × series),
    orders of magnitude smaller than the event data; the LOCF window
    partitions by the series key, so no global single-partition sort.
    One aggregation exchange on (event_type, hour), one broadcast-able
    spine join, one window exchange on event_type."""
    e = _events(spark, sf_dir)
    hourly, spine = _hourly_spine(e)
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type", "h",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.last("mv", ignorenulls=True).over(w).alias("fill_value"),
        )
    )


@register(
    "events_interpolate",
    """
    WITH bounds AS (
      SELECT event_type,
             date_trunc('hour', min(ts)) AS mn,
             date_trunc('hour', max(ts)) AS mx
      FROM events GROUP BY event_type),
    spine AS (
      SELECT event_type, UNNEST(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
      FROM bounds),
    hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, MAX(value) AS mv
      FROM events GROUP BY event_type, date_trunc('hour', ts)),
    joined AS (
      SELECT s.event_type, s.h, hy.mv,
             CASE WHEN hy.mv IS NULL THEN NULL ELSE s.h END AS obs_h
      FROM spine s
      LEFT JOIN hourly hy ON hy.event_type = s.event_type AND hy.h = s.h),
    ctx AS (
      SELECT event_type, h, mv,
             last_value(mv IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY h) AS pv,
             last_value(obs_h IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY h) AS ph,
             first_value(mv IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(obs_h IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
      FROM joined)
    SELECT event_type, h,
           CASE
             WHEN mv IS NOT NULL THEN mv
             WHEN pv IS NULL OR nv IS NULL THEN NULL
             ELSE pv + (nv - pv) * (CAST(epoch(h) - epoch(ph) AS DOUBLE)
                                    / CAST(epoch(nh) - epoch(ph) AS DOUBLE))
           END AS interp
    FROM ctx
    """,
    tags=("events", "datetime"),
)
def events_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across time-series gaps (the `interpolate`
    companion to events_gapfill's LOCF): each missing hour takes
    pv + (nv − pv)·Δt/ΔT between its surrounding observations; edges
    with no neighbor on one side stay NULL. Both engines evaluate the
    IDENTICAL double expression on exact epoch-second longs →
    deterministic IEEE result → hash parity. Same scale shape as
    gapfill: calendar-sized spine, windows partitioned by series key."""
    e = _events(spark, sf_dir)
    hourly, spine = _hourly_spine(e)
    joined = spine.join(
        hourly.drop("n"), ["event_type", "h"], "left"
    ).withColumn("obs_h", F.when(F.col("mv").isNotNull(), F.col("h")))
    back = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    sec = lambda c: F.col(c).cast("long")  # noqa: E731 — epoch seconds
    ctx = (
        joined.withColumn("pv", F.last("mv", ignorenulls=True).over(back))
        .withColumn("ph", F.last("obs_h", ignorenulls=True).over(back))
        .withColumn("nv", F.first("mv", ignorenulls=True).over(fwd))
        .withColumn("nh", F.first("obs_h", ignorenulls=True).over(fwd))
    )
    interp = (
        F.when(F.col("mv").isNotNull(), F.col("mv"))
        .when(F.col("pv").isNull() | F.col("nv").isNull(), F.lit(None))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * ((sec("h") - sec("ph")).cast("double")
               / (sec("nh") - sec("ph")).cast("double"))
        )
    )
    return ctx.select("event_type", "h", interp.alias("interp"))


@register(
    "events_ohlc_bars",
    """
    SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS bar_start_s,
           first(value ORDER BY ts, event_id) AS open,
           MAX(value)                         AS high,
           MIN(value)                         AS low,
           last(value ORDER BY ts, event_id)  AS close,
           COUNT(*)                           AS n_obs,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS volume
    FROM events
    GROUP BY 1
    """,
    tags=("events", "datetime"),
)
def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars — the canonical timeseries downsample
    (candlestick / continuous-aggregate rollup): open/close are the
    FIRST/LAST observation in the bar by (ts, event_id) — min_by /
    max_by over a struct key, deterministic under ties — high/low are
    plain extremes, volume is the exact-decimal sum (base.py float
    policy). One map-side-combined hash aggregate; at 100 TB each bar
    compresses in its map task before the exchange, the same shape as
    events_time_bucket."""
    e = _events(spark, sf_dir)
    bar = compat.date_bin(3600, F.col("ts")).cast("long").alias("bar_start_s")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return e.groupBy(bar).agg(
        F.min_by("value", key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(dec2("value")).cast("double").alias("volume"),
    )


@register(
    "events_retention_cohorts",
    """
    WITH f AS (
      SELECT user_id, ts,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               OVER (PARTITION BY user_id) AS first_p
      FROM events)
    SELECT CAST(date_trunc('week', first_p) AS DATE) AS cohort_week,
           CAST(datediff('day', date_trunc('week', first_p),
                         date_trunc('week', ts)) / 7 AS BIGINT) AS weeks_since,
           COUNT(DISTINCT user_id) AS active_users
    FROM f
    WHERE first_p IS NOT NULL AND ts >= first_p
    GROUP BY 1, 2
    """,
    tags=("events", "datetime"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix — the canonical product-analytics
    rollup: cohort = ISO week of the user's FIRST PURCHASE (a
    conditional window MIN over the user partition — one exchange, no
    join-back; anchoring on the conversion event spreads users across
    cohorts), cell = distinct cohort users active N weeks on. Both
    engines truncate weeks to Monday (ISO), and week-trunc deltas are
    exact multiples of 7 days, so the division is exact. Plan shape:
    the user_id exchange feeds the window; the (cohort, week) distinct
    aggregate is the only other shuffle pair — no self-join of events
    (the naive formulation joins events to a first-seen subquery and
    shuffles the fact twice)."""
    e = _events(spark, sf_dir)
    first_p = F.min(
        F.when(F.col("event_type") == "purchase", F.col("ts"))
    ).over(Window.partitionBy("user_id"))
    f = (
        e.select("user_id", "ts", first_p.alias("first_p"))
        .filter(F.col("first_p").isNotNull() & (F.col("ts") >= F.col("first_p")))
        .select(
            "user_id",
            F.date_trunc("week", F.col("first_p")).cast("date")
            .alias("cohort_week"),
            F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
        )
    )
    return (
        f.groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("long").alias("weeks_since"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )
