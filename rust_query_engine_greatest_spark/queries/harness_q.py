"""Harness-parity queries (SURVEY §6: the reference ships ClickBench,
H2O-db-benchmark and IMDB/JOB harnesses as capability). These entries
re-express the representative shapes of those suites over the TESTDATA
tables — each oracle-checked like everything else, and each exercising
a pattern the TPC-H/operator suites don't:

- ClickBench: raw-string LIKE scans, wide multi-key rollups over an
  events log.
- H2O groupby: high-cardinality key aggregation (the benchmark's g1/g4
  shapes).
- Time-interval RANGE window frames (reference window_frame.rs:409
  supports RANGE over temporal ORDER BY; Spark expresses the same via
  rangeBetween over epoch seconds — semantics proven against DuckDB's
  native INTERVAL frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.catalog import load_table
from .base import dec2, register


@register(
    "cb_like_search",
    """
    SELECT event_type, COUNT(*) AS n
    FROM events WHERE props LIKE '%"k": 7%'
    GROUP BY event_type
    """,
    tags=("harness", "clickbench"),
)
def cb_like_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench-style substring scan over a raw payload column (the
    suite's URL/SearchPhrase LIKE queries). Stays in codegen — LIKE is a
    JVM-side predicate, pushed to the scan as a string-contains
    filter."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("props").like('%"k": 7%'))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "cb_multi_group_rollup",
    """
    SELECT event_type,
           CAST(EXTRACT(hour FROM ts) AS INT) AS h,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v,
           COUNT(DISTINCT user_id) AS u
    FROM events GROUP BY event_type, CAST(EXTRACT(hour FROM ts) AS INT)
    """,
    tags=("harness", "clickbench"),
)
def cb_multi_group_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench-style wide rollup: two grouping keys, count + exact
    sum + distinct-user count in one aggregate (one shuffle; the
    distinct expands internally via Catalyst's RewriteDistinctAggregates
    — same rewrite the reference's single_distinct_to_groupby.rs
    does)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type", F.hour("ts").alias("h")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec2("value")).cast("double").alias("v"),
        F.countDistinct("user_id").alias("u"),
    )


@register(
    "h2o_groupby_highcard",
    """
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v_sum,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS v_mean,
           COUNT(*) AS n
    FROM events GROUP BY user_id
    """,
    tags=("harness", "h2o"),
)
def h2o_groupby_highcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2O db-benchmark g1/g4 shape: aggregation over a high-cardinality
    key (every user) — the partial/final split does the heavy lifting
    map-side; order-independent mean via exact-decimal sum / count."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.sum(dec2("value")).cast("double").alias("v_sum"),
        (F.sum(dec2("value")).cast("double") / F.count(F.lit(1))).alias("v_mean"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "window_time_range",
    """
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS v_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    tags=("harness", "window"),
)
def window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame (reference window_frame.rs:409 RANGE
    units over temporal ORDER BY): trailing 1-hour count/sum per user.
    Spark's rangeBetween is numeric, so the ORDER BY key is epoch
    MICROseconds with a [-3.6e9, 0] frame — bit-identical to DuckDB's
    native INTERVAL frame (both engines are µs-precision on ts, so the
    window boundary agrees exactly; epoch-seconds would disagree on
    pairs 3600-3601 s apart)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(dec2("value")).over(w).cast("double").alias("v_1h"),
    )
