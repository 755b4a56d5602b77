"""Event-log analytics suite (ClickBench analog) vs DuckDB oracle."""

from __future__ import annotations

import pytest

from rust_query_engine_greatest_spark.queries import REGISTRY

from tests.conftest import assert_frames_match

EVENTS = sorted(n for n in REGISTRY if n.startswith("events_"))


def test_suite_present():
    assert len(EVENTS) >= 5
    assert all(REGISTRY[n].oracle is not None for n in EVENTS)


@pytest.mark.parametrize("name", EVENTS)
def test_events_matches_oracle(name, spark, sf_dir, oracle):
    q = REGISTRY[name]
    assert_frames_match(q.build(spark, sf_dir), oracle.sql(q.oracle))


def test_events_funnel_nonvacuous(spark, oracle):
    """Guard against a vacuous 0/0 pass: the funnel must select a strict,
    non-empty subset of users at sf0.001."""
    df = REGISTRY["events_funnel"].build(spark, "/root/testdata/sf0.001")
    n_funnel = df.count()
    n_users = oracle.sql("SELECT COUNT(DISTINCT user_id) FROM events").fetchone()[0]
    assert 0 < n_funnel < n_users


def test_ohlc_open_close_tie_deterministic(spark):
    """events_ohlc_bars picks open/close by (ts, event_id): two
    observations at the SAME timestamp must resolve by event_id, not
    scan order — pinned by repartitioning the input differently."""
    from pyspark.sql import functions as F

    rows = [
        (1, "2024-01-01 00:10:00", 5.0),
        (2, "2024-01-01 00:10:00", 7.0),   # same ts as event 1
        (3, "2024-01-01 00:40:00", 3.0),
        (4, "2024-01-01 00:40:00", 9.0),   # same ts as event 3
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    key = F.struct(F.col("ts"), F.col("event_id"))
    out = (df.groupBy(F.lit(1))
           .agg(F.min_by("value", key).alias("open"),
                F.max_by("value", key).alias("close"))
           .collect()[0])
    assert out["open"] == 5.0 and out["close"] == 9.0
    out2 = (df.repartition(7)
            .groupBy(F.lit(1))
            .agg(F.min_by("value", key).alias("open"),
                 F.max_by("value", key).alias("close"))
            .collect()[0])
    assert (out2["open"], out2["close"]) == (out["open"], out["close"])
