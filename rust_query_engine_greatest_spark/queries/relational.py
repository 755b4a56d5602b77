"""Relational operator inventory (SURVEY §2.2-§2.7): one oracle-checked
query per operator row — joins (all 8 types + cross + theta + range),
aggregation (grouping sets/rollup/cube, distinct, the §2.4 function
registry), windows (ranking/analytic/frames), sort/limit/offset/top-k,
set ops, DISTINCT ON, unnest/explode, pivot, VALUES.

These are deliberately *thin declarations*: the operator is Spark's; the
deliverable is the verified inventory (SURVEY §7 step 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import compat
from ..operators import asof_join, distinct_on, range_join, top_k_per_group
from ..operators.recursive import recursive_cte
from ..sources.catalog import load_table
from .base import dec2, dsum, register


def _t(spark, sf_dir, *names):
    return [load_table(spark, sf_dir, n) for n in names]


# ---- joins (§2.3) ---------------------------------------------------------
# Build a mismatch-rich pair: customers (some without orders in window) ×
# orders (some custkeys filtered out on the customer side).

CUST_FILTER = "c_acctbal > 1000"
ORD_FILTER = "o_orderdate >= TIMESTAMP '1999-01-01'"


def _join_pair(spark, sf_dir):
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    c = customer.filter(F.expr(CUST_FILTER)).select("c_custkey", "c_name", "c_acctbal")
    o = orders.filter(F.expr(ORD_FILTER)).select("o_orderkey", "o_custkey", "o_totalprice")
    return c, o


def _join_oracle(how_sql: str) -> str:
    return f"""
    SELECT c.c_custkey, c.c_name, c.c_acctbal, o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM (SELECT c_custkey, c_name, c_acctbal FROM customer WHERE {CUST_FILTER}) c
    {how_sql} (SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE {ORD_FILTER}) o
      ON c.c_custkey = o.o_custkey
    """


def _mk_join(name: str, how: str, how_sql: str):
    @register(name, _join_oracle(how_sql), tags=("join",))
    def q(spark: SparkSession, sf_dir: str, how=how) -> DataFrame:
        c, o = _join_pair(spark, sf_dir)
        return c.join(o, c.c_custkey == o.o_custkey, how)

    q.__doc__ = f"Join type '{how}' (common/src/join_type.rs:30-46) on a mismatch-rich pair."
    return q


_mk_join("join_inner", "inner", "JOIN")
_mk_join("join_left", "left", "LEFT JOIN")
_mk_join("join_right", "right", "RIGHT JOIN")
_mk_join("join_full", "full", "FULL JOIN")


@register(
    "join_left_semi",
    f"""
    SELECT c_custkey, c_name, c_acctbal FROM customer c
    WHERE {CUST_FILTER} AND EXISTS (
      SELECT 1 FROM orders o WHERE {ORD_FILTER} AND o.o_custkey = c.c_custkey)
    """,
    tags=("join",),
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LeftSemi (join_type.rs:39) — EXISTS lowering."""
    c, o = _join_pair(spark, sf_dir)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi")


@register(
    "join_left_anti",
    f"""
    SELECT c_custkey, c_name, c_acctbal FROM customer c
    WHERE {CUST_FILTER} AND NOT EXISTS (
      SELECT 1 FROM orders o WHERE {ORD_FILTER} AND o.o_custkey = c.c_custkey)
    """,
    tags=("join",),
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LeftAnti (join_type.rs:42) — NOT EXISTS lowering."""
    c, o = _join_pair(spark, sf_dir)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti")


@register(
    "join_right_semi",
    f"""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
    WHERE {ORD_FILTER} AND EXISTS (
      SELECT 1 FROM customer c WHERE {CUST_FILTER} AND c.c_custkey = o.o_custkey)
    """,
    tags=("join",),
)
def join_right_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RightSemi (join_type.rs:40) — planned as LeftSemi with sides
    swapped, exactly how Spark and the reference's optimizer handle it."""
    c, o = _join_pair(spark, sf_dir)
    return o.join(c, c.c_custkey == o.o_custkey, "left_semi")


@register(
    "join_right_anti",
    f"""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
    WHERE {ORD_FILTER} AND NOT EXISTS (
      SELECT 1 FROM customer c WHERE {CUST_FILTER} AND c.c_custkey = o.o_custkey)
    """,
    tags=("join",),
)
def join_right_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RightAnti (join_type.rs:43) — LeftAnti with sides swapped."""
    c, o = _join_pair(spark, sf_dir)
    return o.join(c, c.c_custkey == o.o_custkey, "left_anti")


@register(
    "join_cross",
    "SELECT r_name, n_name FROM region CROSS JOIN nation",
    tags=("join",),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CrossJoinExec (physical-plan/src/joins/cross_join.rs:54)."""
    region, nation = _t(spark, sf_dir, "region", "nation")
    return region.select("r_name").crossJoin(nation.select("n_name"))


@register(
    "join_theta",
    """
    SELECT n1.n_name AS a, n2.n_name AS b
    FROM nation n1 JOIN nation n2
      ON n1.n_nationkey < n2.n_nationkey
     AND n1.n_regionkey = n2.n_regionkey
    """,
    tags=("join",),
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) predicate + equi key — the reference extracts the
    equi part (extract_equijoin_predicate.rs) and keeps `<` as residual
    filter; Spark's planner does the same (hash join + condition)."""
    (nation,) = _t(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("k1"), F.col("n_name").alias("a"),
                       F.col("n_regionkey").alias("r1"))
    n2 = nation.select(F.col("n_nationkey").alias("k2"), F.col("n_name").alias("b"),
                       F.col("n_regionkey").alias("r2"))
    return (
        n1.join(n2, (F.col("k1") < F.col("k2")) & (F.col("r1") == F.col("r2")))
        .select("a", "b")
    )


@register(
    "join_range",
    """
    SELECT o.o_orderkey, l.l_linenumber, l.l_shipdate
    FROM orders o JOIN lineitem l
      ON o.o_orderkey = l.l_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 60 DAY
    """,
    tags=("join",),
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via operators.range_join: equi key drives the hash
    join, range terms ride as residual (reference: SymmetricHashJoin
    interval pruning ≈ bounded-state range condition, §2.9)."""
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    o = orders.select("o_orderkey", "o_orderdate",
                      (F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("o_end"))
    out = range_join(
        lineitem.select("l_orderkey", "l_linenumber", "l_shipdate"),
        o,
        equi=[("l_orderkey", "o_orderkey")],
        lower=("l_shipdate", "o_orderdate"),
        upper=("l_shipdate", "o_end"),
    )
    return out.select("o_orderkey", "l_linenumber", "l_shipdate")


@register(
    "join_asof",
    """
    SELECT l.event_id AS p_id, l.user_id AS user_id, l.ts AS p_ts,
           r.event_id AS c_id, r.ts AS c_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
      ON l.user_id = r.user_id AND r.ts <= l.ts
    """,
    tags=("join",),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest click at-or-before each purchase, per user
    (attribution). The reference has no dedicated as-of operator
    (SURVEY §2.3 end note: range conditions live inside
    SymmetricHashJoin pruning / NestedLoop); operators.asof_join
    provides it as equi-join-on-key + per-left-row latest pick, one
    shuffle on the key. Deterministic here because (user_id, ts) is
    unique in events. Oracle: DuckDB's native ASOF LEFT JOIN."""
    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("c_id"), F.col("ts").alias("c_ts")
    )
    out = asof_join(purch, clicks, on="user_id", left_ts="p_ts", right_ts="c_ts")
    return out.select("p_id", "user_id", "p_ts", "c_id", "c_ts")


# ---- aggregation (§2.4) ---------------------------------------------------
@register(
    "agg_salted_two_phase",
    """
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v_sum,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    tags=("aggregate", "scale"),
)
def agg_salted_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof aggregation (operators/salted.py): groupBy(key+salt)
    partials merged by groupBy(key) — exact for decomposable aggs, and
    the oracle is the plain GROUP BY, proving the rewrite. The salt is
    xxhash64 of the row (deterministic). Reference has no skew story
    (SURVEY §2.2: one partition per key, hot or not); this is part of
    the added at-scale surface."""
    from ..operators.salted import salted_aggregate

    ev = _t(spark, sf_dir, "events")[0].withColumn("value", dec2("value"))
    out = salted_aggregate(
        ev, ["event_type"],
        [("value", "sum", "v_sum"), ("event_id", "count", "n")],
        n_salts=16,
    )
    return out.withColumn("v_sum", F.col("v_sum").cast("double"))
@register(
    "agg_registry",
    """
    SELECT l_returnflag,
           COUNT(*)                                        AS cnt,
           COUNT(DISTINCT l_suppkey)                       AS cnt_d,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           MIN(l_extendedprice)                            AS min_p,
           MAX(l_extendedprice)                            AS max_p,
           MEDIAN(l_quantity)                              AS med_q,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_q,
           MIN(l_shipdate)                                 AS min_d,
           MAX(l_shipdate)                                 AS max_d,
           bit_and(CAST(l_linenumber AS BIGINT))           AS band,
           bit_or(CAST(l_linenumber AS BIGINT))            AS bor,
           bit_xor(CAST(l_linenumber AS BIGINT))           AS bxor,
           bool_and(l_quantity > 0)                        AS ball,
           bool_or(l_quantity > 49)                        AS bany,
           min_by(l_orderkey, l_extendedprice)             AS first_by_price,
           max_by(l_orderkey, l_extendedprice)             AS last_by_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate",),
)
def agg_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 aggregate registry sweep: count/sum/min/max/median/avg,
    distinct count, bit_and/or/xor, bool_and/or, min_by/max_by (the
    deterministic stand-ins for first_value/last_value — reference
    functions-aggregate/src/{first_last,bit_and_or_xor,bool_and_or}.rs).
    min/max over doubles & timestamps are selection ops → exact."""
    (l,) = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.countDistinct("l_suppkey").alias("cnt_d"),
        dsum(dec2("l_quantity"), "sum_qty"),
        F.min("l_extendedprice").alias("min_p"),
        F.max("l_extendedprice").alias("max_p"),
        F.median("l_quantity").alias("med_q"),
        (F.sum(dec2("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_q"),
        F.min("l_shipdate").alias("min_d"),
        F.max("l_shipdate").alias("max_d"),
        F.expr("bit_and(CAST(l_linenumber AS BIGINT))").alias("band"),
        F.expr("bit_or(CAST(l_linenumber AS BIGINT))").alias("bor"),
        F.expr("bit_xor(CAST(l_linenumber AS BIGINT))").alias("bxor"),
        F.expr("bool_and(l_quantity > 0)").alias("ball"),
        F.expr("bool_or(l_quantity > 49)").alias("bany"),
        F.expr("min_by(l_orderkey, l_extendedprice)").alias("first_by_price"),
        F.expr("max_by(l_orderkey, l_extendedprice)").alias("last_by_price"),
    )


@register(
    "agg_stats",
    """
    SELECT c_mktsegment,
           round(var_samp(c_acctbal), 4)            AS var_s,
           round(var_pop(c_acctbal), 4)             AS var_p,
           round(stddev_samp(c_acctbal), 6)         AS sd_s,
           round(stddev_pop(c_acctbal), 6)          AS sd_p,
           round(covar_samp(c_acctbal, CAST(c_custkey AS DOUBLE)), 4) AS cov_s,
           round(covar_pop(c_acctbal, CAST(c_custkey AS DOUBLE)), 4)  AS cov_p,
           round(corr(c_acctbal, CAST(c_custkey AS DOUBLE)), 9)       AS corr_,
           round(regr_slope(c_acctbal, CAST(c_custkey AS DOUBLE)), 9) AS slope,
           round(regr_intercept(c_acctbal, CAST(c_custkey AS DOUBLE)), 5) AS icept,
           CAST(regr_count(c_acctbal, CAST(c_custkey AS DOUBLE)) AS BIGINT) AS rcount,
           round(regr_r2(c_acctbal, CAST(c_custkey AS DOUBLE)), 9)    AS r2,
           round(regr_avgx(c_acctbal, CAST(c_custkey AS DOUBLE)), 6)  AS avgx,
           round(regr_avgy(c_acctbal, CAST(c_custkey AS DOUBLE)), 6)  AS avgy
    FROM customer GROUP BY c_mktsegment
    """,
    tags=("aggregate", "stats"),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (functions-aggregate/src/{variance,stddev,
    covariance,correlation,regr}.rs). Rounded: these are the only
    intrinsically order-dependent float aggregates in the inventory
    (Welford-style accumulation differs across engines at ~1e-12)."""
    (c,) = _t(spark, sf_dir, "customer")
    bal, key = F.col("c_acctbal"), F.col("c_custkey").cast("double")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.var_samp(bal), 4).alias("var_s"),
        F.round(F.var_pop(bal), 4).alias("var_p"),
        F.round(F.stddev_samp(bal), 6).alias("sd_s"),
        F.round(F.stddev_pop(bal), 6).alias("sd_p"),
        F.round(F.covar_samp(bal, key), 4).alias("cov_s"),
        F.round(F.covar_pop(bal, key), 4).alias("cov_p"),
        F.round(F.corr(bal, key), 9).alias("corr_"),
        F.round(F.regr_slope(bal, key), 9).alias("slope"),
        F.round(F.regr_intercept(bal, key), 5).alias("icept"),
        F.regr_count(bal, key).alias("rcount"),
        F.round(F.regr_r2(bal, key), 9).alias("r2"),
        F.round(F.regr_avgx(bal, key), 6).alias("avgx"),
        F.round(F.regr_avgy(bal, key), 6).alias("avgy"),
    )


@register(
    "agg_rollup",
    """
    SELECT r_name, n_name, COUNT(*) AS cnt,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("aggregate", "groupingsets"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (GroupingSet::Rollup, expr/src/expr.rs:964-970)."""
    supplier, nation, region = _t(spark, sf_dir, "supplier", "nation", "region")
    j = (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return j.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("cnt"), dsum(dec2("s_acctbal"), "bal")
    )


@register(
    "agg_cube",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("aggregate", "groupingsets"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (GroupingSet::Cube)."""
    (l,) = _t(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "agg_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("aggregate", "groupingsets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (GroupingSet::GroupingSets) via SQL — the
    DataFrame API exposes only cube/rollup, SQL is the idiomatic path."""
    (l,) = _t(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("lineitem")
    return spark.sql(
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt FROM lineitem "
        "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"
    )


@register(
    "agg_array_collect",
    """
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), ',') AS names,
           string_agg(n_name, ',' ORDER BY n_name)       AS name_csv
    FROM nation GROUP BY n_regionkey
    """,
    tags=("aggregate",),
)
def agg_array_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_agg + string_agg (functions-aggregate/src/{array_agg,
    string_agg}.rs), made deterministic by sorting (collect_list order is
    partition-dependent — the compat string_agg takes an order key).
    The array aggregate is surfaced via array_join: the driver's pandas
    canonicalizer sorts cell values, and raw list cells are unhashable
    there — the sorted-array form stays covered in tests/test_relational.
    """
    (n,) = _t(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("names"),
        compat.string_agg(F.col("n_name"), ",", order_by=F.col("n_name")).alias("name_csv"),
    )


# ---- windows (§2.5) -------------------------------------------------------
@register(
    "window_ranking",
    """
    SELECT o_orderkey, o_custkey,
           row_number()   OVER w AS rn,
           rank()         OVER w AS rk,
           dense_rank()   OVER w AS drk,
           CAST(ntile(4) OVER w AS INT) AS nt,
           round(percent_rank() OVER w, 9) AS prk,
           round(cume_dist()    OVER w, 9) AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window",),
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking UDWFs (functions-window/src/{row_number,rank}.rs;
    built_in_window_function.rs:42-62). ORDER BY includes the unique
    orderkey so every rank is deterministic."""
    (o,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
        F.ntile(4).over(w).alias("nt"),
        F.round(F.percent_rank().over(w), 9).alias("prk"),
        F.round(F.cume_dist().over(w), 9).alias("cd"),
    )


@register(
    "window_analytic",
    """
    SELECT o_orderkey, o_custkey,
           lag(o_totalprice)  OVER w            AS prev_p,
           lead(o_totalprice) OVER w            AS next_p,
           lag(o_totalprice, 2, -1.0) OVER w    AS prev2_p,
           first_value(o_totalprice) OVER w     AS first_p,
           last_value(o_totalprice)  OVER w     AS last_p,
           nth_value(o_totalprice, 2) OVER w    AS second_p
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window",),
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions: lag/lead (+default), first/last/nth
    over an explicit full frame (window_frame.rs:40,304)."""
    (o,) = _t(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_totalprice").over(base).alias("prev_p"),
        F.lead("o_totalprice").over(base).alias("next_p"),
        F.lag("o_totalprice", 2, -1.0).over(base).alias("prev2_p"),
        F.first("o_totalprice").over(full).alias("first_p"),
        F.last("o_totalprice").over(full).alias("last_p"),
        F.nth_value("o_totalprice", 2).over(full).alias("second_p"),
    )


@register(
    "window_frames",
    """
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_sum,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS window3_sum,
           COUNT(*) OVER (PARTITION BY o_custkey
                          ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
                          RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW)
                AS cnt_90d
    FROM orders
    """,
    tags=("window",),
)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS and RANGE frames (window_frame.rs:409 units): running sum,
    sliding 3-row sum, 90-day RANGE count over epoch seconds. Any
    aggregate works as a window fn (physical-plan/src/windows/mod.rs).
    GROUPS frames: unsupported in Spark — documented exclusion with an
    error-asserting test (SURVEY §7)."""
    (o,) = _t(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w3 = base.rowsBetween(-2, Window.currentRow)
    rng = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-7776000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(dec2("o_totalprice")).over(run).cast("double").alias("running_sum"),
        F.sum(dec2("o_totalprice")).over(w3).cast("double").alias("window3_sum"),
        F.count(F.lit(1)).over(rng).alias("cnt_90d"),
    )


# ---- sort / limit / top-k (§2.6) -----------------------------------------
@register(
    "sort_limit_offset",
    """
    SELECT c_custkey, c_acctbal FROM customer
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 50 OFFSET 25
    """,
    tags=("sort",),
)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SortExec + GlobalLimit with offset (physical-plan/src/limit.rs:43;
    Spark 3.4 offset). Total order via unique key tiebreak."""
    (c,) = _t(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_acctbal")
        .orderBy(F.desc("c_acctbal"), "c_custkey")
        .offset(25)
        .limit(50)
    )


@register(
    "topk_per_group",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
    tags=("sort", "topk"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k via operators.top_k_per_group (reference TopK
    operator generalized per-group; physical-plan/src/topk/mod.rs:75)."""
    (o,) = _t(spark, sf_dir, "orders")
    out = top_k_per_group(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.desc("o_totalprice"), F.col("o_orderkey")],
        3,
    )
    # re-attach rn for oracle comparability
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return out.withColumn("rn", F.row_number().over(w))


# ---- set ops & distinct (§2.7) -------------------------------------------
@register(
    "setop_union_all",
    """
    SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000
    UNION ALL
    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000
    """,
    tags=("setop",),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — UnionExec partition concat (union.rs:89), no shuffle."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    a = customer.filter(F.col("c_acctbal") > 9000).select(F.col("c_custkey").alias("k"))
    b = orders.filter(F.col("o_totalprice") > 400000).select(F.col("o_custkey").alias("k"))
    return a.unionAll(b)


@register(
    "setop_union_distinct",
    """
    SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000
    UNION
    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000
    """,
    tags=("setop",),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION → union + Distinct→Aggregate (replace_distinct_aggregate.rs)."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    a = customer.filter(F.col("c_acctbal") > 9000).select(F.col("c_custkey").alias("k"))
    b = orders.filter(F.col("o_totalprice") > 400000).select(F.col("o_custkey").alias("k"))
    return a.union(b).distinct()


@register(
    "setop_intersect",
    """
    SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000
    """,
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT → LeftSemi join lowering (sql/src/set_expr.rs:78-88)."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    a = customer.filter(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("k"))
    b = orders.filter(F.col("o_totalprice") > 300000).select(F.col("o_custkey").alias("k"))
    return a.intersect(b)


@register(
    "setop_except",
    """
    SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
    EXCEPT
    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000
    """,
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT → LeftAnti join lowering (builder.rs:1035-1058)."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    a = customer.filter(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("k"))
    b = orders.filter(F.col("o_totalprice") > 300000).select(F.col("o_custkey").alias("k"))
    return a.subtract(b)


@register(
    "setop_intersect_all",
    """
    SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 45
    INTERSECT ALL
    SELECT l_suppkey AS k FROM lineitem WHERE l_discount > 0.08
    """,
    tags=("setop",),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset semantics)."""
    (l,) = _t(spark, sf_dir, "lineitem")
    a = l.filter(F.col("l_quantity") > 45).select(F.col("l_suppkey").alias("k"))
    b = l.filter(F.col("l_discount") > 0.08).select(F.col("l_suppkey").alias("k"))
    return a.intersectAll(b)


@register(
    "setop_except_all",
    """
    SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 47
    EXCEPT ALL
    SELECT l_suppkey AS k FROM lineitem WHERE l_discount > 0.09
    """,
    tags=("setop",),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset semantics)."""
    (l,) = _t(spark, sf_dir, "lineitem")
    a = l.filter(F.col("l_quantity") > 47).select(F.col("l_suppkey").alias("k"))
    b = l.filter(F.col("l_discount") > 0.09).select(F.col("l_suppkey").alias("k"))
    return a.exceptAll(b)


@register(
    "distinct_on",
    """
    SELECT c_nationkey, c_custkey, c_acctbal FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer) t WHERE rn = 1
    """,
    tags=("distinct",),
)
def q_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT ON (plan.rs:2810) via operators.distinct_on — richest
    customer per nation, deterministic tie-break on custkey."""
    (c,) = _t(spark, sf_dir, "customer")
    return distinct_on(
        c.select("c_nationkey", "c_custkey", "c_acctbal"),
        ["c_nationkey"],
        [F.desc("c_acctbal"), F.col("c_custkey")],
    )


# ---- unnest / values / pivot ---------------------------------------------
@register(
    "unnest_tokens",
    """
    SELECT tok, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split_regex(text, ' +')) AS tok FROM documents) t
    GROUP BY tok
    """,
    tags=("unnest",),
)
def unnest_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnest/explode (physical-plan/src/unnest.rs:60 → F.explode):
    token frequency over exploded text."""
    (d,) = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " +")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "unnest_outer",
    """
    SELECT doc_id, tok FROM (
      SELECT doc_id,
             unnest(CASE WHEN lang = 'zh' THEN [CAST(NULL AS VARCHAR)]
                         ELSE string_split_regex(text, ' +') END) AS tok
      FROM documents) t
    """,
    tags=("unnest",),
)
def unnest_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: NULL array still emits one row with NULL element
    (Unnest preserve-nulls semantics)."""
    (d,) = _t(spark, sf_dir, "documents")
    arr = F.when(F.col("lang") == "zh", F.lit(None)).otherwise(F.split("text", " +"))
    return d.select("doc_id", F.explode_outer(arr).alias("tok"))


@register(
    "unnest_zip",
    """
    SELECT doc_id,
           unnest(string_split_regex(text, ' +')) AS tok,
           unnest(range(1, least(len(string_split_regex(text, ' +')), 5) + 1)) AS pos
    FROM documents
    """,
    tags=("unnest",),
)
def unnest_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column unnest ZIPS arrays positionally, padding the shorter
    with NULLs (physical-plan/src/unnest.rs multi-column list unnest;
    DuckDB's multiple-unnest SELECT shares the semantics and is the
    oracle). Spark's explode of two arrays would CROSS-join them — the
    zip spelling is ``explode(arrays_zip(a, b))``, whose row count is
    the max of the two lengths. The pos array is capped at 5 so longer
    token arrays exercise the NULL padding path."""
    (d,) = _t(spark, sf_dir, "documents")
    toks = F.split("text", " +")
    pos = F.sequence(F.lit(1), F.least(F.size(toks), F.lit(5)))
    z = F.explode(F.arrays_zip(toks.alias("tok"), pos.alias("pos")))
    return (
        d.select("doc_id", z.alias("z"))
        .select(
            "doc_id",
            F.col("z.tok").alias("tok"),
            F.col("z.pos").cast("bigint").alias("pos"),
        )
    )


@register(
    "values_inline",
    "SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, NULL)) AS t(id, tag)",
    tags=("values",),
)
def values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ValuesExec (physical-plan/src/values.rs:40) — inline literal rows."""
    return spark.sql("SELECT id, tag FROM VALUES (1, 'a'), (2, 'b'), (3, NULL) AS t(id, tag)")


@register(
    "empty_relation",
    "SELECT CAST(NULL AS BIGINT) AS id WHERE FALSE",
    tags=("values",),
)
def empty_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EmptyExec (physical-plan/src/empty.rs:39) — the 0-row relation.
    The check here IS the 0/0 row count + schema agreement; Spark plans
    it as LocalRelation <empty> (PropagateEmptyRelation, same trivial-
    plan pruning as the reference's optimizer §4.2)."""
    return spark.range(0).select(F.col("id"))


@register(
    "placeholder_row",
    "SELECT CAST(1 AS BIGINT) AS one",
    tags=("values",),
)
def placeholder_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PlaceholderRowExec (physical-plan/src/placeholder_row.rs:41) —
    the 1-row relation that SELECT-without-FROM scans."""
    return spark.range(1).select((F.col("id") + 1).alias("one"))


@register(
    "pivot_status",
    """
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_linestatus = 'O') AS o_cnt,
           COUNT(*) FILTER (WHERE l_linestatus = 'F') AS f_cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)))
                FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS o_qty,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)))
                FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS f_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("pivot",),
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (no reference operator — planned as conditional aggregation,
    which is exactly what Spark's pivot lowers to)."""
    (l,) = _t(spark, sf_dir, "lineitem")
    p = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(dec2("l_quantity")).cast("double").alias("qty"),
        )
    )
    return p.select(
        "l_returnflag",
        F.col("O_cnt").alias("o_cnt"),
        F.col("F_cnt").alias("f_cnt"),
        F.col("O_qty").alias("o_qty"),
        F.col("F_qty").alias("f_qty"),
    )


# ---- recursive CTE (§2.1 WorkTableExec / RecursiveQueryExec) --------------

@register(
    "recursive_cte",
    """
    WITH RECURSIVE r(k) AS (
        SELECT DISTINCT CAST(c_custkey AS BIGINT) FROM customer WHERE c_acctbal > 9000
        UNION
        SELECT k // 2 FROM r WHERE k > 0
    )
    SELECT k FROM r
    """,
    tags=("recursive",),
)
def recursive_cte_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (reference RecursiveQueryExec,
    physical-plan/src/recursive_query.rs:57 + WorkTableExec
    work_table.rs:97): ancestor closure k → k DIV 2 over a binary-tree
    key space, UNION (distinct) semantics via the driver-side fixpoint
    loop in operators/recursive.py — each iteration fully distributed."""
    (customer,) = _t(spark, sf_dir, "customer")
    seed = (
        customer.filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").cast("bigint").alias("k"))
        .distinct()
    )
    return recursive_cte(seed, lambda df: df.filter(F.col("k") > 0).select(F.expr("k div 2").alias("k")))


# ---- approximate aggregates (§2.4 approx_distinct / approx_percentile) ----

@register(
    "agg_percentile_exact",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 6)  AS p50,
           round(quantile_cont(l_quantity, 0.9), 6)  AS p90,
           round(quantile_cont(l_extendedprice, 0.25), 6) AS price_p25
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("aggregate",),
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentile (reference approx_percentile_cont's
    exact sibling; functions-aggregate/src/approx_percentile_cont.rs is
    the t-digest path, checked separately in agg_approx). F.percentile
    == DuckDB quantile_cont (linear interpolation) — deterministic, so
    it hash-matches the oracle."""
    (l,) = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 6).alias("price_p25"),
    )


@register(
    "agg_approx",
    None,  # sketches differ across engines → rows-only check; tolerance vs exact in tests/test_relational.py
    tags=("aggregate", "approx"),
)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates (reference approx_distinct = HyperLogLog,
    functions-aggregate/src/hyperloglog.rs:50; approx_median /
    approx_percentile_cont = t-digest). Spark: approx_count_distinct
    (HLL++) + percentile_approx. Cross-engine sketch internals differ,
    so the oracle is omitted; tests assert rsd-bounded agreement with
    the exact answers."""
    (l,) = _t(spark, sf_dir, "lineitem")
    return l.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.percentile_approx("l_quantity", F.lit(0.5), F.lit(10000)).alias("approx_med_qty"),
        F.percentile_approx("l_extendedprice", F.lit(0.9), F.lit(10000)).alias("approx_p90_price"),
    )


# ---- GROUPS window frame, emulated (§2.5 / SURVEY §7 "what's hard") -------

@register(
    "window_groups_frame",
    """
    WITH g AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(o_totalprice AS DECIMAL(12,2)) AS price,
               dense_rank() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_orderdate) AS grp
        FROM orders),
    s AS (
        SELECT o_orderpriority, grp, SUM(price) AS sg
        FROM g GROUP BY o_orderpriority, grp)
    SELECT g.o_orderkey,
           CAST(s1.sg + COALESCE(s0.sg, 0) AS DOUBLE) AS groups_sum
    FROM g
    JOIN s s1 ON s1.o_orderpriority = g.o_orderpriority AND s1.grp = g.grp
    LEFT JOIN s s0 ON s0.o_orderpriority = g.o_orderpriority AND s0.grp = g.grp - 1
    """,
    tags=("window",),
)
def window_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW window frame (reference
    expr/src/window_frame.rs:409; unsupported in Spark — and DuckDB)
    emulated exactly: dense_rank() assigns each peer group its ordinal,
    then a RANGE frame over that ordinal is the GROUPS frame. The oracle
    cross-checks via an *independent* formulation (peer-group sums +
    self-join on adjacent ordinals). Cost: one extra window pass over
    the same sort order — no extra shuffle."""
    (orders,) = _t(spark, sf_dir, "orders")
    w_rank = Window.partitionBy("o_orderpriority").orderBy("o_orderdate")
    w_groups = (
        Window.partitionBy("o_orderpriority").orderBy("grp").rangeBetween(-1, 0)
    )
    return (
        orders.withColumn("grp", F.dense_rank().over(w_rank))
        .withColumn("groups_sum", F.sum(dec2("o_totalprice")).over(w_groups).cast("double"))
        .select("o_orderkey", "groups_sum")
    )


@register(
    "unpivot_measures",
    """
    SELECT l_orderkey, l_linenumber, metric, val
    FROM (SELECT l_orderkey, l_linenumber,
                 l_quantity AS qty, l_extendedprice AS price, l_tax AS tax
          FROM lineitem)
    UNPIVOT (val FOR metric IN (qty, price, tax))
    """,
    tags=("relational", "unpivot"),
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt — wide measures to (metric, value) rows (the SQL
    -standard inverse of pivot_status; Spark DataFrame `unpivot`,
    Spark 3.4+). Never-null measures here, so the engines' differing
    null-row elision defaults cannot diverge."""
    (l,) = _t(spark, sf_dir, "lineitem")
    wide = l.select(
        "l_orderkey", "l_linenumber",
        F.col("l_quantity").alias("qty"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_tax").alias("tax"),
    )
    return wide.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["qty", "price", "tax"],
        variableColumnName="metric",
        valueColumnName="val",
    )


_WINDOW_EDGE_VALUES = """
    (VALUES (1, 'a', 10,   1.5),
            (2, 'a', 20,   CAST(NULL AS DOUBLE)),
            (3, 'a', CAST(NULL AS INT), 2.5),
            (4, 'a', 20,   3.5),
            (5, 'b', 5,    CAST(NULL AS DOUBLE)),
            (6, 'b', CAST(NULL AS INT), CAST(NULL AS DOUBLE)),
            (7, 'c', 1,    9.0))
      AS t(id, grp, ord, v)
"""


@register(
    "window_null_edge",
    f"""
    SELECT id, grp,
           row_number()  OVER w                                    AS rn,
           rank()        OVER (PARTITION BY grp
                               ORDER BY ord ASC NULLS LAST)        AS rk,
           lag(v, 1, -1.0)  OVER w                                 AS lag_def,
           lead(v, 1, -1.0) OVER w                                 AS lead_def,
           first_value(v IGNORE NULLS) OVER w                      AS first_nn,
           last_value(v IGNORE NULLS)  OVER
             (PARTITION BY grp ORDER BY ord ASC NULLS LAST, id
              ROWS BETWEEN UNBOUNDED PRECEDING
                       AND UNBOUNDED FOLLOWING)                    AS last_nn,
           count(v)      OVER w                                    AS n_nn,
           CAST(sum(CAST(v AS DECIMAL(12,2))) OVER w AS DOUBLE)    AS run_sum
    FROM {_WINDOW_EDGE_VALUES}
    WINDOW w AS (PARTITION BY grp ORDER BY ord ASC NULLS LAST, id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("relational", "window", "edge"),
)
def window_null_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window edges the mega-suites don't pin: NULLs in the ORDER key
    (explicit NULLS LAST so both engines agree), NULL measure values
    (count/sum skip them, IGNORE NULLS first/last reach past them,
    lag/lead defaults fill row-boundary gaps — note defaults do NOT
    replace NULL values in range, only missing rows), rank ties on a
    non-unique key next to row_number's total order, and a singleton
    partition. Frames written ROWS-explicit because rank needs the
    default RANGE frame while running sums need deterministic ROWS."""
    df = spark.sql(f"SELECT * FROM {_WINDOW_EDGE_VALUES}")
    w = Window.partitionBy("grp").orderBy(F.asc_nulls_last("ord"), "id")
    wrows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wrank = Window.partitionBy("grp").orderBy(F.asc_nulls_last("ord"))
    return df.select(
        "id", "grp",
        F.row_number().over(w).alias("rn"),
        F.rank().over(wrank).alias("rk"),
        F.lag("v", 1, -1.0).over(w).alias("lag_def"),
        F.lead("v", 1, -1.0).over(w).alias("lead_def"),
        F.first("v", ignorenulls=True).over(wrows).alias("first_nn"),
        F.last("v", ignorenulls=True).over(wall).alias("last_nn"),
        F.count("v").over(wrows).alias("n_nn"),
        F.sum(F.col("v").cast("decimal(12,2)")).over(wrows).cast("double").alias("run_sum"),
    )


@register(
    "sort_multikey_nulls",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    ORDER BY event_type ASC,
             nullif(value, 0.0) DESC NULLS LAST,
             user_id ASC,
             event_id ASC
    LIMIT 500
    """,
    tags=("relational", "sort"),
)
def sort_multikey_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key external sort (reference benchmarks/src/sort.rs's
    mixed-key workload): string + nullable-double (injected NULLs via
    nullif, explicit NULLS LAST) + two integer tiebreakers, fused with
    the limit into TakeOrderedAndProject (per-partition heaps + driver
    merge — never a full global sort for a bounded result)."""
    (ev,) = _t(spark, sf_dir, "events")
    return (
        ev.select("event_id", "user_id", "event_type", "value")
        .orderBy(
            F.asc("event_type"),
            F.desc_nulls_last(F.nullif(F.col("value"), F.lit(0.0))),
            F.asc("user_id"),
            F.asc("event_id"),
        )
        .limit(500)
    )


@register(
    "join_null_safe",
    """
    SELECT a.id AS id_a, b.id AS id_b, a.k AS k
    FROM (VALUES (1, 'x'), (2, CAST(NULL AS VARCHAR)), (3, 'y'), (4, CAST(NULL AS VARCHAR)))
           AS a(id, k)
    JOIN (VALUES (10, 'x'), (20, CAST(NULL AS VARCHAR)), (30, 'z'))
           AS b(id, k)
      ON a.k IS NOT DISTINCT FROM b.k
    """,
    tags=("relational", "join"),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (reference HashJoinExec's null_equals_null
    mode, hash_join.rs; Spark `<=>`, SQL IS NOT DISTINCT FROM): NULL
    keys MATCH each other — the opposite of the equi-join default
    pinned by the join_* suite. Still a hash join, not a theta join:
    Catalyst plans <=> as an equi-key with null-safe comparison."""
    a = spark.createDataFrame([(1, "x"), (2, None), (3, "y"), (4, None)], "id int, k string")
    b = spark.createDataFrame([(10, "x"), (20, None), (30, "z")], "id int, k string")
    return a.join(b, a["k"].eqNullSafe(b["k"])).select(
        a["id"].alias("id_a"), b["id"].alias("id_b"), a["k"].alias("k")
    )


@register(
    "agg_empty_input",
    """
    SELECT COUNT(*)                          AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s,
           MIN(l_quantity)                   AS mn,
           MAX(l_quantity)                   AS mx,
           CAST(SUM(CASE WHEN l_quantity > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
    FROM lineitem WHERE l_quantity < -1
    """,
    tags=("relational", "aggregate", "edge"),
)
def agg_empty_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregate over an empty input must emit exactly ONE row:
    count 0, sums/mins/maxes NULL (SQL standard; the reference pins
    this in aggregate.slt's empty-relation blocks). A grouped aggregate
    would emit zero rows instead — this entry pins the ungrouped case
    the optimizer must not 'optimize away'."""
    (l,) = _t(spark, sf_dir, "lineitem")
    return l.filter(F.col("l_quantity") < -1).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec2("l_quantity")).cast("double").alias("s"),
        F.min("l_quantity").alias("mn"),
        F.max("l_quantity").alias("mx"),
        F.sum(F.when(F.col("l_quantity") > 0, 1).otherwise(0)).cast("long").alias("n_pos"),
    )


# --- round-4 edge suites: sqllogictest parity beyond functions
# (reference joins.slt 4,276 lines / window.slt 4,992 / aggregate.slt
# 6,088 — the outer-join×frame, empty-partition-frame, wide-decimal and
# interval edge matrices their blocks pin). ---------------------------


@register(
    "join_outer_frame_edge",
    """
    WITH a(id, k, v) AS (VALUES
           (1, 'x', 10.0), (2, CAST(NULL AS VARCHAR), 20.0),
           (3, 'y', 30.0), (4, 'x', 40.0)),
         b(id, k, w) AS (VALUES
           (10, 'x', 1.0), (20, CAST(NULL AS VARCHAR), 2.0),
           (30, 'z', 3.0)),
         j AS (
           SELECT a.id AS a_id, b.id AS b_id,
                  coalesce(a.k, b.k, '<null>') AS kk, a.v AS v, b.w AS w
           FROM a FULL OUTER JOIN b ON a.k = b.k)
    SELECT a_id, b_id, kk, v, w,
           CAST(SUM(CAST(coalesce(v, 0.0) + coalesce(w, 0.0) AS DECIMAL(12,2)))
                OVER (PARTITION BY kk
                      ORDER BY a_id ASC NULLS LAST, b_id ASC NULLS LAST
                      ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS DOUBLE) AS run,
           COUNT(v) OVER (PARTITION BY kk
                          ORDER BY a_id ASC NULLS LAST, b_id ASC NULLS LAST
                          ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS n_v
    FROM j
    """,
    tags=("relational", "join", "window", "edge"),
)
def join_outer_frame_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer-join null-fill × window-frame interaction (reference
    joins.slt outer blocks × window.slt frame blocks): NULL keys do NOT
    match in a FULL OUTER equi-join, so both sides' null-key rows emit
    null-filled partners; a running frame over the coalesced key must
    then treat the null-filled measure columns per aggregate rules
    (SUM coalesced, COUNT skips NULLs). Deterministic via explicit
    NULLS LAST on both order keys."""
    a = spark.createDataFrame(
        [(1, "x", 10.0), (2, None, 20.0), (3, "y", 30.0), (4, "x", 40.0)],
        "id int, k string, v double",
    )
    b = spark.createDataFrame(
        [(10, "x", 1.0), (20, None, 2.0), (30, "z", 3.0)],
        "id int, k string, w double",
    )
    j = a.join(b, a["k"] == b["k"], "full").select(
        a["id"].alias("a_id"), b["id"].alias("b_id"),
        F.coalesce(a["k"], b["k"], F.lit("<null>")).alias("kk"),
        a["v"].alias("v"), b["w"].alias("w"),
    )
    w = (
        Window.partitionBy("kk")
        .orderBy(F.asc_nulls_last("a_id"), F.asc_nulls_last("b_id"))
        .rowsBetween(-1, Window.currentRow)
    )
    return j.select(
        "a_id", "b_id", "kk", "v", "w",
        F.sum((F.coalesce("v", F.lit(0.0)) + F.coalesce("w", F.lit(0.0))).cast("decimal(12,2)"))
        .over(w).cast("double").alias("run"),
        F.count("v").over(w).alias("n_v"),
    )


@register(
    "window_empty_frame_edge",
    """
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                      ROWS BETWEEN 5 PRECEDING AND 2 PRECEDING) AS DOUBLE) AS s_empty,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                          ROWS BETWEEN 5 PRECEDING AND 2 PRECEDING) AS n_empty,
           lead(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS lead2,
           nth_value(o_orderkey, 3) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND UNBOUNDED FOLLOWING) AS third
    FROM orders WHERE o_orderkey % 37 = 0
    """,
    tags=("relational", "window", "edge"),
)
def window_empty_frame_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frames over mostly-single-row partitions (reference window.slt's
    empty-frame blocks): the filtered orders leave most custkeys with
    ONE row, so `ROWS BETWEEN 5 PRECEDING AND 2 PRECEDING` is an EMPTY
    frame — SUM must yield NULL (not 0), COUNT must yield 0; lead(2)
    and nth_value(3) fall off the partition edge → NULL. Multi-row
    custkeys in the same result pin the non-degenerate frame
    alongside."""
    (o,) = _t(spark, sf_dir, "orders")
    wp = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    wf = wp.rowsBetween(-5, -2)
    wall = wp.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.filter(F.col("o_orderkey") % 37 == 0).select(
        "o_orderkey", "o_custkey",
        F.sum(dec2("o_totalprice")).over(wf).cast("double").alias("s_empty"),
        F.count(F.lit(1)).over(wf).alias("n_empty"),
        F.lead("o_orderkey", 2).over(wp).alias("lead2"),
        F.nth_value("o_orderkey", 3).over(wall).alias("third"),
    )


@register(
    "agg_decimal_wide",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) AS s38,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                         * CAST(l_quantity AS DECIMAL(12,2))
                         AS DECIMAL(38,4))) AS DOUBLE) AS sprod,
           CAST(MIN(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) AS mn,
           CAST(MAX(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) AS mx
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("relational", "aggregate", "edge"),
)
def agg_decimal_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Widest-decimal aggregation path (reference aggregate.slt decimal
    blocks): SUM at precision 38 (no headroom left for Spark's +10
    widening — exercises the overflow-checked sum path), and SUM over a
    decimal×decimal product explicitly re-cast to DECIMAL(38,4) so both
    engines aggregate identical exact values. The deliberate-overflow
    sibling (ANSI-off sum → NULL, DuckDB errors instead) is pinned in
    tests/test_relational.py — not SQL-mirrorable by design."""
    (l,) = _t(spark, sf_dir, "lineitem")
    wide = F.col("l_extendedprice").cast("decimal(38,2)")
    prod = (dec2("l_extendedprice") * dec2("l_quantity")).cast("decimal(38,4)")
    return l.groupBy("l_returnflag").agg(
        F.sum(wide).cast("double").alias("s38"),
        F.sum(prod).cast("double").alias("sprod"),
        F.min(wide).cast("double").alias("mn"),
        F.max(wide).cast("double").alias("mx"),
    )


@register(
    "func_interval_edge",
    """
    WITH d(id, base) AS (VALUES
        (1, DATE '2024-01-31'), (2, DATE '2024-02-29'),
        (3, DATE '2023-02-28'), (4, DATE '2024-12-31'),
        (5, DATE '2024-07-04'))
    SELECT id, base,
           CAST(base + INTERVAL 1 MONTH AS DATE)      AS plus_1m,
           CAST(base + INTERVAL 12 MONTH AS DATE)     AS plus_12m,
           CAST(base - INTERVAL 2 MONTH AS DATE)      AS minus_2m,
           last_day(base)                             AS eom,
           CAST(date_trunc('week', base) AS DATE)     AS wk,
           base + 45                                  AS plus_45d,
           datediff('day', DATE '2024-01-01', base)   AS since_ny
    FROM d
    """,
    tags=("functions", "datetime", "edge"),
)
def func_interval_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/date arithmetic edges (reference date_bin/interval slt
    blocks): month-end clamping (Jan 31 + 1 month → Feb 29 in a leap
    year; Feb 29 + 12 months → Feb 28), negative month arithmetic,
    last_day, ISO-Monday week truncation, day addition across month
    boundaries, and day diffs — every case where naive day-count
    arithmetic and calendar arithmetic disagree."""
    rows = [(1, "2024-01-31"), (2, "2024-02-29"), (3, "2023-02-28"),
            (4, "2024-12-31"), (5, "2024-07-04")]
    d = spark.createDataFrame(rows, "id int, base_s string").select(
        "id", F.col("base_s").cast("date").alias("base")
    )
    return d.select(
        "id", "base",
        F.add_months("base", 1).alias("plus_1m"),
        F.add_months("base", 12).alias("plus_12m"),
        F.add_months("base", -2).alias("minus_2m"),
        F.last_day("base").alias("eom"),
        F.date_trunc("week", "base").cast("date").alias("wk"),
        F.date_add("base", 45).alias("plus_45d"),
        F.datediff("base", F.lit("2024-01-01").cast("date")).alias("since_ny"),
    )


@register(
    "agg_float_special_keys",
    """
    SELECT g + CAST(0.0 AS DOUBLE) AS gk, COUNT(*) AS n,
           CAST(SUM(x) AS BIGINT) AS sx,
           MAX(y) AS mx, MIN(y) AS mn
    FROM (VALUES
      ('nan'::DOUBLE, 1, 2.0::DOUBLE), (('nan'::DOUBLE) * -1, 2, 'inf'::DOUBLE),
      (0.0::DOUBLE, 3, 'nan'::DOUBLE), ('-0.0'::DOUBLE, 4, '-inf'::DOUBLE),
      ('inf'::DOUBLE, 5, 1.0::DOUBLE), (1.5::DOUBLE, 6, 0.5::DOUBLE),
      (1.5::DOUBLE, 7, 'nan'::DOUBLE)) v(g, x, y)
    GROUP BY g
    """,
    tags=("aggregate", "edge"),
)
def agg_float_special_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sqllogictest aggregate.slt matrix row the function edges don't
    cover: GROUP BY over IEEE special values. Spark canonicalizes both
    NaN bit patterns into ONE group and -0.0 with +0.0 (SQLConf
    canonicalization the reference engine shares via Arrow group-by
    normalization); MAX treats NaN as greater than +Inf and MIN keeps
    -Inf below every finite. `g + 0.0` canonicalizes the emitted key's
    zero sign so both engines print 0.0. Runs on VALUES — engine
    semantics, not data."""
    v = spark.sql(
        """
        SELECT g, x, y FROM VALUES
          (CAST('NaN' AS DOUBLE), 1, CAST(2.0 AS DOUBLE)),
          (CAST('NaN' AS DOUBLE) * -1, 2, CAST('Infinity' AS DOUBLE)),
          (CAST(0.0 AS DOUBLE), 3, CAST('NaN' AS DOUBLE)),
          (CAST('-0.0' AS DOUBLE), 4, CAST('-Infinity' AS DOUBLE)),
          (CAST('Infinity' AS DOUBLE), 5, CAST(1.0 AS DOUBLE)),
          (CAST(1.5 AS DOUBLE), 6, CAST(0.5 AS DOUBLE)),
          (CAST(1.5 AS DOUBLE), 7, CAST('NaN' AS DOUBLE)) AS v(g, x, y)
        """
    )
    return v.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.max("y").alias("mx"),
        F.min("y").alias("mn"),
    ).select(
        (F.col("g") + F.lit(0.0)).alias("gk"), "n", "sx", "mx", "mn"
    )


@register(
    "join_float_special_keys",
    """
    WITH a(k, va) AS (VALUES ('nan'::DOUBLE, 1), (0.0::DOUBLE, 2), (1.5::DOUBLE, 3)),
         b(k, vb) AS (VALUES (('nan'::DOUBLE) * -1, 10), ('-0.0'::DOUBLE, 20),
                             (2.5::DOUBLE, 30))
    SELECT a.k + CAST(0.0 AS DOUBLE) AS k, va, vb
    FROM a JOIN b ON a.k = b.k
    """,
    tags=("join", "edge"),
)
def join_float_special_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sqllogictest joins.slt matrix row: equi-join over IEEE special
    keys. Spark's EqualTo follows its NaN semantics (NaN = NaN is TRUE;
    -0.0 keys canonicalized to +0.0), so a NaN row on each side matches
    across different NaN bit patterns and ±0.0 match each other — the
    same behavior the reference inherits from Arrow row equality, and
    DuckDB's documented float comparison. Key re-emitted as k + 0.0 to
    canonicalize the printed zero sign."""
    a = spark.sql(
        "SELECT k, va FROM VALUES (CAST('NaN' AS DOUBLE), 1), "
        "(CAST(0.0 AS DOUBLE), 2), (CAST(1.5 AS DOUBLE), 3) AS a(k, va)"
    )
    b = spark.sql(
        "SELECT k, vb FROM VALUES (CAST('NaN' AS DOUBLE) * -1, 10), "
        "(CAST('-0.0' AS DOUBLE), 20), (CAST(2.5 AS DOUBLE), 30) AS b(k, vb)"
    )
    return a.join(b, a["k"] == b["k"]).select(
        (a["k"] + F.lit(0.0)).alias("k"), "va", "vb"
    )


@register(
    "window_range_null_peers",
    """
    WITH v(id, grp, ord, x) AS (VALUES
      (1, 'a', 10, 1), (2, 'a', 10, 2), (3, 'a', 20, 4),
      (4, 'a', NULL, 8), (5, 'a', NULL, 16),
      (6, 'b', NULL, 1), (7, 'b', 5, 2), (8, 'b', 5, 4), (9, 'b', 6, 8))
    SELECT id, grp,
           CAST(sum(x) OVER (PARTITION BY grp ORDER BY ord ASC NULLS FIRST
                             RANGE BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS BIGINT) AS run,
           CAST(count(*) OVER (PARTITION BY grp ORDER BY ord ASC NULLS FIRST
                               RANGE BETWEEN CURRENT ROW
                                         AND CURRENT ROW) AS BIGINT) AS peers
    FROM v
    """,
    tags=("relational", "window", "edge"),
)
def window_range_null_peers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """window.slt matrix row: RANGE frames over a NULL-bearing numeric
    order key. All NULL rows are PEERS — one shared frame (CURRENT ROW
    in RANGE means 'through the last peer', so every NULL row sees the
    whole NULL block, and equal keys aggregate as a block) — vs ROWS
    frames which would split them. NULLS FIRST pins the block to the
    partition start on both engines."""
    df = spark.sql(
        "SELECT * FROM VALUES (1,'a',10,1),(2,'a',10,2),(3,'a',20,4),"
        "(4,'a',CAST(NULL AS INT),8),(5,'a',CAST(NULL AS INT),16),"
        "(6,'b',CAST(NULL AS INT),1),(7,'b',5,2),(8,'b',5,4),(9,'b',6,8)"
        " AS v(id, grp, ord, x)"
    )
    w = Window.partitionBy("grp").orderBy(F.asc_nulls_first("ord"))
    run = w.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    cur = w.rangeBetween(Window.currentRow, Window.currentRow)
    return df.select(
        "id", "grp",
        F.sum("x").over(run).alias("run"),
        F.count(F.lit(1)).over(cur).alias("peers"),
    )


@register(
    "agg_approx_bounds",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(1 AS BOOLEAN) AS hll_orders_ok,
           CAST(1 AS BOOLEAN) AS hll_parts_ok,
           CAST(1 AS BOOLEAN) AS med_ok,
           CAST(1 AS BOOLEAN) AS p90_ok
    FROM lineitem
    """,
    tags=("aggregate", "approx"),
)
def agg_approx_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-oracle companion to `agg_approx` (whose raw sketch values
    can never cross-engine-match): the DECIDABLE property is the
    sketches' error CONTRACT, so this entry emits booleans asserting
    |approx − exact| within bounds — approx_count_distinct(rsd=0.02)
    within 3.5·rsd = 7 % of the exact distinct counts, and
    percentile_approx(accuracy=10000) within 2 % of the exact
    percentile for the smooth p90, and within 6 % for the median —
    percentile_approx returns an actual DATA VALUE while the exact
    percentile interpolates, so on the 50-distinct-integer quantity
    column one value step is 1/25 = 4 % around the median (observed: 26
    vs 25.0 at sf0.1); the looser bound covers quantization, not sketch
    error. Given fixed data + implementation these are
    deterministic, and the oracle's literal TRUEs make a sketch
    regression a hard driver FAIL instead of a rows-only shrug
    (same constructive-oracle doctrine as the dedup sketch fixtures)."""
    (l,) = _t(spark, sf_dir, "lineitem")
    row = l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("hll_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("hll_parts"),
        F.percentile_approx("l_quantity", F.lit(0.5), F.lit(10000)).alias("amed"),
        F.percentile("l_quantity", F.lit(0.5)).alias("emed"),
        F.percentile_approx("l_extendedprice", F.lit(0.9), F.lit(10000)).alias("ap90"),
        F.percentile("l_extendedprice", F.lit(0.9)).alias("ep90"),
    )

    def _within(approx, exact, tol):
        return (
            F.abs(F.col(approx).cast("double") - F.col(exact).cast("double"))
            / F.col(exact).cast("double")
            <= tol
        )

    return row.select(
        "n_rows",
        "exact_orders",
        _within("hll_orders", "exact_orders", 0.07).alias("hll_orders_ok"),
        _within("hll_parts", "exact_parts", 0.07).alias("hll_parts_ok"),
        _within("amed", "emed", 0.06).alias("med_ok"),
        _within("ap90", "ep90", 0.02).alias("p90_ok"),
    )


@register(
    "setop_coercion_edge",
    """
    WITH u AS (
      SELECT CAST(c_custkey AS DOUBLE) AS k, 'int_side' AS side
      FROM customer WHERE c_custkey < 20
      UNION ALL
      SELECT CAST(c_acctbal AS DOUBLE) + 0.25 AS k, 'dbl_side' AS side
      FROM customer WHERE c_custkey < 20
      UNION ALL
      SELECT CAST(NULL AS DOUBLE) AS k, 'null_side' AS side
      FROM customer WHERE c_custkey < 3)
    SELECT side, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(k) AS BIGINT) AS n_nonnull,
           CAST(SUM(CAST(k AS DECIMAL(18,6))) AS DOUBLE) AS total,
           MIN(k) AS lo, MAX(k) AS hi
    FROM u GROUP BY side
    """,
    tags=("setop", "edge"),
)
def setop_coercion_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation type-coercion matrix (sqllogictest union.slt
    family): UNION of BIGINT, DECIMAL-derived DOUBLE, and typed-NULL
    branches — the common super-type (double) must be applied per
    branch BEFORE the union, and NULL columns must coerce without
    poisoning aggregates. Branch provenance kept as a tag column so the
    hash check pins each branch's coerced values, not just the blend."""
    (customer,) = _t(spark, sf_dir, "customer")
    a = customer.filter(F.col("c_custkey") < 20).select(
        F.col("c_custkey").cast("double").alias("k"), F.lit("int_side").alias("side")
    )
    b = customer.filter(F.col("c_custkey") < 20).select(
        (F.col("c_acctbal").cast("double") + F.lit(0.25)).alias("k"),
        F.lit("dbl_side").alias("side"),
    )
    c = customer.filter(F.col("c_custkey") < 3).select(
        F.lit(None).cast("double").alias("k"), F.lit("null_side").alias("side")
    )
    return (
        a.unionByName(b).unionByName(c)
        .groupBy("side")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("k").alias("n_nonnull"),
            F.sum(F.col("k").cast("decimal(18,6)")).cast("double").alias("total"),
            F.min("k").alias("lo"),
            F.max("k").alias("hi"),
        )
    )


@register(
    "agg_multi_distinct",
    """
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_cust,
           COUNT(DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE)) AS n_months,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg", "edge"),
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple DISTINCT aggregates over different columns alongside
    plain aggregates in one GROUP BY — Catalyst rewrites via Expand
    (one row per distinct-group per input row) + two-phase agg, the
    same rewrite the reference applies in
    optimizer/src/single_distinct_to_groupby.rs and its multi-distinct
    planner path. Plan-pinned: Expand present, ONE shuffle family on
    the group key (no per-distinct re-scan)."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct(
            F.date_trunc("month", F.col("o_orderdate")).cast("date")
        ).alias("n_months"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum(dec2("o_totalprice"), "sum_price"),
    )


@register(
    "join_sort_merge",
    _join_oracle("JOIN"),
    tags=("join",),
)
def join_sort_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SortMergeJoin (physical-plan/src/joins/sort_merge_join.rs) — the
    same mismatch-rich inner join FORCED onto the sorted-merge path
    with the MERGE hint (broadcast wins by default at test scale), so
    the SMJ executor gets its own per-round driver row; the fuzz suite
    covers it only via a global broadcast-off permutation. Plan pinned
    in tests/test_plans.py::test_join_sort_merge_hint_plans_smj. At
    100 TB this is the join strategy two already-sorted/bucketed fact
    tables should take — no hash table, spill-friendly."""
    c, o = _join_pair(spark, sf_dir)
    return c.hint("merge").join(o, c.c_custkey == o.o_custkey, "inner")


@register(
    "join_shuffle_hash",
    _join_oracle("JOIN"),
    tags=("join",),
)
def join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned HashJoin (physical-plan/src/joins/hash_join.rs,
    PartitionMode::Partitioned — DataFusion's default for two large
    inputs): the inner join FORCED onto Spark's ShuffledHashJoin with
    the SHUFFLE_HASH hint, completing the strategy trio next to the
    broadcast default and join_sort_merge. Plan pinned in
    tests/test_plans.py::test_join_shuffle_hash_hint_plans_shj. At
    100 TB this is the shape when neither side broadcasts and neither
    is pre-sorted: both sides hash-exchange on the key, build the
    smaller per-partition."""
    c, o = _join_pair(spark, sf_dir)
    return c.hint("shuffle_hash").join(o, c.c_custkey == o.o_custkey, "inner")
