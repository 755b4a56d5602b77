"""Relational operator inventory vs oracle + operator-helper unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_query_engine_greatest_spark.operators import asof_join, recursive_cte
from rust_query_engine_greatest_spark.queries import REGISTRY

from tests.conftest import assert_frames_match

REL_PREFIXES = ("join_", "agg_", "window_", "sort_", "topk_", "setop_", "distinct_on",
                "unnest_", "values_", "pivot_", "unpivot_", "recursive_", "empty_", "placeholder_",
                "cb_", "h2o_", "job_", "subq_")
REL = sorted(
    n for n in REGISTRY
    if n.startswith(REL_PREFIXES) and REGISTRY[n].oracle is not None
)


@pytest.mark.parametrize("name", REL)
def test_relational_matches_oracle(name, spark, sf_dir, oracle):
    q = REGISTRY[name]
    assert q.oracle is not None
    assert_frames_match(q.build(spark, sf_dir), oracle.sql(q.oracle))


def test_groups_frame_unsupported(spark):
    """SURVEY §7: GROUPS window frames are a documented exclusion —
    assert Spark rejects them so the gap is visible, mirroring the
    reference's error-parity style."""
    df = spark.range(10)
    with pytest.raises(Exception, match="(?i)groups|syntax|parse"):
        df.selectExpr("sum(id) OVER (ORDER BY id GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW)").collect()


def test_recursive_cte_transitive_closure(spark):
    """Reference RecursiveQueryExec (recursive_query.rs:57): integers
    1..=5 via WITH RECURSIVE-style iteration."""
    seed = spark.createDataFrame([(1,)], "n int")
    out = recursive_cte(seed, lambda f: f.select((F.col("n") + 1).alias("n")).filter("n <= 5"))
    assert sorted(r.n for r in out.collect()) == [1, 2, 3, 4, 5]


def test_recursive_cte_graph_reachability(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], "src int, dst int"
    ).cache()
    seed = spark.createDataFrame([(1,)], "node int")

    def step(frontier):
        return (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
        )

    out = recursive_cte(seed, step)
    assert sorted(r.node for r in out.collect()) == [1, 2, 3, 4]


def test_asof_join(spark):
    import datetime as dt

    quotes = spark.createDataFrame(
        [("A", dt.datetime(2024, 1, 1, 10, 0), 100.0),
         ("A", dt.datetime(2024, 1, 1, 11, 0), 101.0),
         ("B", dt.datetime(2024, 1, 1, 10, 30), 50.0)],
        "sym string, qts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [("A", dt.datetime(2024, 1, 1, 10, 30)),
         ("A", dt.datetime(2024, 1, 1, 12, 0)),
         ("B", dt.datetime(2024, 1, 1, 10, 0)),],
        "sym string, tts timestamp",
    )
    out = asof_join(trades, quotes, on="sym", left_ts="tts", right_ts="qts")
    got = {(r.sym, r.tts.hour, r.tts.minute): r.px for r in out.collect()}
    assert got[("A", 10, 30)] == 100.0   # latest quote <= 10:30
    assert got[("A", 12, 0)] == 101.0
    assert got[("B", 10, 0)] is None     # no quote yet → left join null


def test_agg_approx_within_tolerance(spark, sf_dir, oracle):
    """Sketch aggregates (HLL++ / percentile_approx) have no cross-engine
    oracle; assert rsd-bounded agreement with the exact answers instead
    (reference tests the same way: hyperloglog.rs error-bound tests)."""
    row = REGISTRY["agg_approx"].build(spark, sf_dir).collect()[0]
    exact = oracle.sql(
        """
        SELECT COUNT(DISTINCT l_orderkey) AS orders,
               COUNT(DISTINCT l_partkey)  AS parts,
               quantile_disc(l_quantity, 0.5)      AS med_qty,
               quantile_disc(l_extendedprice, 0.9) AS p90_price
        FROM lineitem
        """
    ).fetchone()
    assert abs(row.approx_orders - exact[0]) <= 0.05 * exact[0]
    assert abs(row.approx_parts - exact[1]) <= 0.05 * exact[1]
    # percentile_approx with accuracy 10000 returns an actual data value
    # near the true discrete quantile.
    assert abs(row.approx_med_qty - exact[2]) <= max(1.0, 0.02 * exact[2])
    assert abs(row.approx_p90_price - exact[3]) <= 0.02 * exact[3]


def test_salted_aggregate_equals_plain(spark, sf_dir):
    """operators/salted.py: the salted two-phase rewrite is exact for
    decomposable aggs — identical rows to the direct groupBy."""
    from rust_query_engine_greatest_spark.operators.salted import salted_aggregate
    from rust_query_engine_greatest_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    salted = salted_aggregate(
        ev, ["event_type"],
        [("value", "sum", "v_sum"), ("event_id", "count", "n"),
         ("ts", "min", "first_ts"), ("ts", "max", "last_ts")],
        n_salts=16,
    )
    plain = ev.groupBy("event_type").agg(
        F.sum("value").alias("v_sum"), F.count("event_id").alias("n"),
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
    s = {tuple(r) for r in salted.collect()}
    p = {tuple(r) for r in plain.collect()}
    assert {r[:1] + r[2:] for r in s} == {r[:1] + r[2:] for r in p}  # float sum order differs
    assert sorted(round(r[1], 6) for r in s) == sorted(round(r[1], 6) for r in p)


def test_salted_aggregate_rejects_non_decomposable(spark):
    from rust_query_engine_greatest_spark.operators.salted import salted_aggregate

    with pytest.raises(ValueError, match="non-decomposable"):
        salted_aggregate(spark.range(5), ["id"], [("id", "median", "m")])


def test_salted_join_equals_plain(spark, sf_dir):
    """Salted replicate join returns exactly the plain join's rows."""
    from rust_query_engine_greatest_spark.operators.salted import salted_join
    from rust_query_engine_greatest_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment")
    salted = salted_join(ev, cust, on="user_id", n_salts=8)
    plain = ev.join(cust, "user_id")
    assert salted.count() == plain.count()
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}


def test_asof_join_tolerance(spark):
    """asof_join tolerance_seconds: matches older than the window are
    dropped (→ NULL), mirroring pd.merge_asof(tolerance=...)."""
    import datetime as dt

    quotes = spark.createDataFrame(
        [("A", dt.datetime(2024, 1, 1, 10, 0), 100.0)],
        "sym string, qts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [("A", dt.datetime(2024, 1, 1, 10, 4)),   # 240s after quote
         ("A", dt.datetime(2024, 1, 1, 11, 0))],  # 3600s after quote
        "sym string, tts timestamp",
    )
    out = asof_join(trades, quotes, on="sym", left_ts="tts", right_ts="qts",
                    tolerance_seconds=300)
    got = {(r.tts.hour, r.tts.minute): r.px for r in out.collect()}
    assert got[(10, 4)] == 100.0
    assert got[(11, 0)] is None


def test_asof_join_null_right_ts_and_map_column(spark):
    """Right rows with NULL right_ts must never match (right_ts <= left_ts
    is never true for NULL), and a map-typed right column must not break
    the tie-resolution ordering (maps are excluded from the tiebreak)."""
    import datetime as dt

    quotes = spark.createDataFrame(
        [("A", None, 999.0, {"src": "bad"}),
         ("A", dt.datetime(2024, 1, 1, 10, 0), 100.0, {"src": "ok"}),
         ("B", None, 888.0, {"src": "bad"})],
        "sym string, qts timestamp, px double, attrs map<string,string>",
    )
    trades = spark.createDataFrame(
        [("A", dt.datetime(2024, 1, 1, 10, 30)),
         ("B", dt.datetime(2024, 1, 1, 10, 0))],
        "sym string, tts timestamp",
    )
    out = asof_join(trades, quotes, on="sym", left_ts="tts", right_ts="qts")
    got = {r.sym: (r.px, r.attrs) for r in out.collect()}
    assert got["A"] == (100.0, {"src": "ok"})   # NULL-ts quote never picked
    assert got["B"][0] is None                   # only NULL-ts quotes -> no match


def test_decimal_sum_overflow_yields_null_ansi_off(spark):
    """The deliberate-overflow sibling of agg_decimal_wide: summing
    DECIMAL(38,0) values that exceed 38 digits of headroom must yield
    NULL under ANSI-off Spark semantics (DuckDB raises instead — not
    SQL-mirrorable, pinned here)."""
    big = int("9" * 38)
    df = spark.createDataFrame(
        [(str(big),), (str(big),), (str(big),)], "v string"
    ).select(F.col("v").cast("decimal(38,0)").alias("v"))
    # NB: conf.get(key, default) returns the GIVEN default when the key
    # was never explicitly set — NOT the config entry's real default
    # (true on Spark 4) — so capturing with a default would "restore"
    # ANSI to off for the rest of the session.
    ansi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        assert df.agg(F.sum("v").alias("s")).head()["s"] is None
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi)


def test_unnest_zip_pads_shorter_array_with_nulls(spark):
    """Multi-column unnest zips positionally to the LONGER length and
    NULL-pads the shorter array (unnest.rs multi-column semantics;
    DuckDB multiple-unnest agrees — differential via the registry
    oracle). Planted unequal lengths pin the padding locally."""
    df = spark.createDataFrame(
        [(1, ["a", "b", "c"], [10]), (2, ["d"], [20, 30])],
        "id int, xs array<string>, ys array<int>",
    )
    z = F.explode(F.arrays_zip(F.col("xs").alias("x"), F.col("ys").alias("y")))
    got = sorted(
        ((r.id, r.z.x, r.z.y) for r in df.select("id", z.alias("z")).collect()),
        key=lambda t: (t[0], t[1] or "", t[2] or 0),
    )
    assert got == [
        (1, "a", 10), (1, "b", None), (1, "c", None),
        (2, None, 30), (2, "d", 20),
    ]
