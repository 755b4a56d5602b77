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
