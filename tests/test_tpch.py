"""Differential tests: every registered tpch_* query vs the DuckDB oracle
at sf0.001 (the driver re-runs the same pairs at sf0.01)."""

from __future__ import annotations

import pytest

from rust_query_engine_greatest_spark.queries import REGISTRY

TPCH = sorted(n for n in REGISTRY if n.startswith("tpch_"))


@pytest.mark.parametrize("name", TPCH)
def test_tpch_matches_oracle(name, spark, sf_dir, oracle):
    from tests.conftest import assert_frames_match

    q = REGISTRY[name]
    assert q.oracle is not None, f"{name} must have an oracle"
    df = q.build(spark, sf_dir)
    assert_frames_match(df, oracle.sql(q.oracle))
