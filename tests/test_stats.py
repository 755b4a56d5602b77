"""sources/stats.py — catalog statistics + CBO activation.

The stats layer is the 100 TB join-order story (ANALYZE once at ingest,
CBO reorders from row/NDV estimates at any scale), so pin its contract:
routing through catalog.load_table, statistics actually recorded, CBO
confs on, and clean deactivation.
"""

from __future__ import annotations

import pytest

from rust_query_engine_greatest_spark.sources import catalog, stats


@pytest.fixture()
def stats_active(spark, sf_dir):
    prep = stats.activate(spark, sf_dir, tables=("nation", "region", "supplier"))
    yield prep
    stats.deactivate(sf_dir)


def test_activate_routes_load_table_and_sets_cbo(spark, sf_dir, stats_active):
    tbl = stats.resolve(sf_dir, "nation")
    assert tbl is not None and tbl.startswith("stat_")
    assert spark.conf.get("spark.sql.cbo.enabled") == "true"
    assert spark.conf.get("spark.sql.cbo.joinReorder.enabled") == "true"
    df = catalog.load_table(spark, sf_dir, "nation")
    # routed to the catalog table, same rows as the raw read
    assert tbl in df._jdf.queryExecution().analyzed().toString()
    assert df.count() == spark.read.parquet(f"{sf_dir}/nation.parquet").count()


def test_analyze_records_row_counts(spark, sf_dir, stats_active):
    tbl = stats.resolve(sf_dir, "supplier")
    desc = {r["col_name"]: r["data_type"]
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}").collect()}
    st = desc.get("Statistics", "")
    assert "rows" in st, f"no row-count statistics recorded: {st!r}"


def test_activate_is_idempotent_and_deactivate_restores(spark, sf_dir):
    stats.activate(spark, sf_dir, tables=("region",))
    first = stats.resolve(sf_dir, "region")
    prep2 = stats.activate(spark, sf_dir, tables=("region",))
    assert stats.resolve(sf_dir, "region") == first
    assert prep2 < 1.0  # second activation reuses the analyzed table
    stats.deactivate(sf_dir)
    assert stats.resolve(sf_dir, "region") is None
    # load_table falls back to the raw parquet read
    df = catalog.load_table(spark, sf_dir, "region")
    assert "stat_" not in df._jdf.queryExecution().analyzed().toString()


def test_unactivated_tables_unrouted(spark, sf_dir, stats_active):
    # events is deliberately excluded (ns->us conversion lives in
    # load_table); it must never route through a catalog table
    assert stats.resolve(sf_dir, "events") is None
