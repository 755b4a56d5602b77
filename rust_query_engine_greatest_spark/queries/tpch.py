"""Adapted TPC-H q1-q22 over the driver TESTDATA star schema.

Reference parity: the reference ships TPC-H q1-q22 as golden sqllogictests
(`datafusion/sqllogictest/test_files/tpch/q*.slt.part`) and a benchmark
runner (`benchmarks/src/tpch/run.rs`, queries `benchmarks/queries/q*.sql`).
TESTDATA omits `partsupp` and several columns (l_commitdate, l_receiptdate,
l_shipmode, l_shipinstruct, p_container, ps_supplycost, c_phone, comments),
so queries touching those are *adapted*: same operator shape (join graph,
subquery class, aggregation pattern) re-targeted at available columns.
Each adaptation is noted in the builder docstring.

Numeric discipline: see queries/base.py — monetary doubles are summed as
exact decimals then surfaced as doubles, so Spark and the DuckDB oracle
agree bit-for-bit regardless of aggregation order/parallelism.

Scale notes (100 TB target):
- lineitem/orders joins shuffle on orderkey — both sides hash-partition;
  AQE handles skew.  dim tables (region/nation/supplier/part/customer)
  are broadcast (they stay small relative to facts at any SF).
- Every filter is expressed on the base column (no wrapping functions)
  so Catalyst pushes it into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.catalog import load_table
from .base import davg, dec2, dsum, one_minus, one_plus, register

# Spark-side exact revenue term; SQL mirror below.
def _rev():
    return (dec2("l_extendedprice") * one_minus("l_discount")).cast("decimal(18,4)")


# DuckDB mirrors of the helpers (keep in lockstep with queries/base.py).
REV = ("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * "
       "CAST(1.0 - l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4))")
QTY = "CAST(l_quantity AS DECIMAL(12,2))"
PRICE = "CAST(l_extendedprice AS DECIMAL(12,2))"


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]


# --------------------------------------------------------------------------
@register(
    "tpch_q1",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({QTY}) AS DOUBLE)                          AS sum_qty,
           CAST(SUM({PRICE}) AS DOUBLE)                        AS sum_base_price,
           CAST(SUM({REV}) AS DOUBLE)                          AS sum_disc_price,
           CAST(SUM(CAST({REV} * CAST(1.0 + l_tax AS DECIMAL(4,2))
                    AS DECIMAL(22,6))) AS DOUBLE)              AS sum_charge,
           CAST(SUM({QTY}) AS DOUBLE) / COUNT(*)               AS avg_qty,
           CAST(SUM({PRICE}) AS DOUBLE) / COUNT(*)             AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*)                                            AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("tpch", "aggregate"),
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (reference: tpch/q1.slt.part). Unmodified
    shape; date cutoff moved inside TESTDATA's 1995-2001 range. The
    driver-checked output surfaces the exact-decimal sums as DOUBLE:
    the driver's value-hash coerces oracle decimals to float but hashes
    Spark decimals raw (CORRECTNESS_r06 tpch_q1 red with bit-identical
    values both sides), so DecimalType is a driver-hash hazard and is
    banned from registry output (test_entry_contract). The decimal-exact
    SF1 comparison lives in tpch_q1_decimal below (tools/tpch_sf1.py)."""
    (l,) = _t(spark, sf_dir, "lineitem")
    rev = _rev()
    charge = (rev * one_plus("l_tax")).cast("decimal(22,6)")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec2("l_quantity"), "sum_qty"),
            dsum(dec2("l_extendedprice"), "sum_base_price"),
            dsum(rev, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg(dec2("l_quantity"), "avg_qty"),
            davg(dec2("l_extendedprice"), "avg_price"),
            davg(F.col("l_discount").cast("decimal(4,2)"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# Decimal-exact q1 (NOT registered — DecimalType is a driver-hash
# hazard): at SF1 the two engines' final decimal→double casts round a
# 17th significant digit differently (BENCH_NOTES r5), so the SF1
# harness compares the sums as exact decimals via this pair instead.
TPCH_Q1_DECIMAL_ORACLE = f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({QTY}) AS DECIMAL(22,2))                   AS sum_qty,
           CAST(SUM({PRICE}) AS DECIMAL(22,2))                 AS sum_base_price,
           CAST(SUM({REV}) AS DECIMAL(28,4))                   AS sum_disc_price,
           CAST(SUM(CAST({REV} * CAST(1.0 + l_tax AS DECIMAL(4,2))
                    AS DECIMAL(22,6))) AS DECIMAL(32,6))       AS sum_charge,
           CAST(SUM({QTY}) AS DOUBLE) / COUNT(*)               AS avg_qty,
           CAST(SUM({PRICE}) AS DOUBLE) / COUNT(*)             AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*)                                            AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """


def tpch_q1_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-decimal q1 variant for the SF1 differential harness."""
    (l,) = _t(spark, sf_dir, "lineitem")
    rev = _rev()
    charge = (rev * one_plus("l_tax")).cast("decimal(22,6)")

    def xsum(col, prec_scale, alias):
        return F.sum(col).cast(f"decimal{prec_scale}").alias(alias)

    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            xsum(dec2("l_quantity"), "(22,2)", "sum_qty"),
            xsum(dec2("l_extendedprice"), "(22,2)", "sum_base_price"),
            xsum(rev, "(28,4)", "sum_disc_price"),
            xsum(charge, "(32,6)", "sum_charge"),
            davg(dec2("l_quantity"), "avg_qty"),
            davg(dec2("l_extendedprice"), "avg_price"),
            davg(F.col("l_discount").cast("decimal(4,2)"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "tpch_q2",
    """
    WITH bridge AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name
    FROM part p
    JOIN bridge b ON b.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = b.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_type LIKE 'STANDARD%' AND p.p_size < 15 AND r.r_name = 'EUROPE'
      AND s.s_acctbal = (
        SELECT MIN(s2.s_acctbal)
        FROM lineitem b2
        JOIN supplier s2 ON s2.s_suppkey = b2.l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
        WHERE b2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 20
    """,
    tags=("tpch", "join", "subquery"),
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-cost supplier (adapted: TESTDATA has no partsupp, so the
    part↔supplier relation is the distinct (l_partkey,l_suppkey) bridge
    from lineitem, and ps_supplycost → s_acctbal). The correlated scalar
    subquery (reference ScalarSubqueryToJoin,
    optimizer/src/scalar_subquery_to_join.rs) is expressed as a window
    min over p_partkey + filter — one pass over the candidate set, so
    the expensive lineitem-bridge subtree is built ONCE (the min-agg +
    self-join form builds it twice; at 100 TB that second scan is the
    bottleneck)."""
    part, lineitem, supplier, nation, region = _t(
        spark, sf_dir, "part", "lineitem", "supplier", "nation", "region"
    )
    # LIKE-prefix, not equality: TESTDATA p_type is the bare word
    # ('STANDARD'), official dbgen is three words ('STANDARD ANODIZED
    # TIN') — the prefix predicate selects real rows in BOTH domains,
    # so the SF1 differential (tools/tpch_sf1.py) is non-vacuous.
    pf = part.filter(F.col("p_type").like("STANDARD%") & (F.col("p_size") < 15))
    # Semi-filter the fact by the selective part predicate BEFORE the
    # distinct: the bridge's dedup shuffle then carries only the ~4% of
    # lineitem rows whose part qualifies, instead of the whole fact —
    # the dominant exchange in this plan at any scale.
    bridge = (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(pf.select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .distinct()
    )
    eu_supp = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
    )
    cand = (
        pf.join(bridge, F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
@register(
    "tpch_q3",
    f"""
    SELECT l.l_orderkey,
           CAST(SUM({REV}) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_shipdate > TIMESTAMP '1997-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
    """,
    tags=("tpch", "join", "topk"),
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority (adapted: o_shippriority column absent →
    o_orderpriority). Fact-fact join shuffles on orderkey; customer dim
    broadcast. Top-10 via orderBy+limit → Spark TakeOrderedAndProject
    (reference TopK operator, physical-plan/src/topk/mod.rs:75)."""
    customer, orders, lineitem = _t(spark, sf_dir, "customer", "orders", "lineitem")
    cut = F.lit("1997-01-01").cast("timestamp")
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cut)
        .join(lineitem.filter(F.col("l_shipdate") > cut),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_rev(), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
@register(
    "tpch_q4",
    """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o.o_orderpriority
    """,
    tags=("tpch", "semijoin"),
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order priority checking (adapted: l_commitdate/l_receiptdate absent
    → "late" means shipped >30 days after order date). EXISTS lowered as
    inner-join + distinct-on-key with the FILTERED orders on the build
    side (priority is functionally dependent on the key, so the distinct
    is deterministic): Spark broadcasts one year of orders when it fits
    (SF1: 2.7 → 1.05 s — lineitem never shuffles) and falls back to a
    shuffle join when it doesn't, where the distinct shuffles only the
    MATCHED rows — strictly less than the left-semi form's full-fact
    shuffle at any scale. No broadcast hint: the plan stays
    size-adaptive at 100 TB."""
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    hit = (
        lineitem.select("l_orderkey", "l_shipdate")
        .join(o, (F.col("l_orderkey") == F.col("o_orderkey"))
              & (F.col("l_shipdate")
                 > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")))
        .select("o_orderkey", "o_orderpriority")
        .dropDuplicates(["o_orderkey"])
    )
    return hit.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# --------------------------------------------------------------------------
@register(
    "tpch_q5",
    f"""
    SELECT n.n_name, CAST(SUM({REV}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
    tags=("tpch", "join"),
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume — six-table join graph. Join order is
    lineitem ⋈ orders(date-filtered, 2 columns) FIRST, customer second
    (r6 SF1 A/B: 0.86 s vs 3.70 s for the customer-first form): the
    selective pre-projected orders side is small enough for Catalyst to
    BROADCAST at bench scale, so the fact never shuffles; at 100 TB the
    same shape degrades gracefully to a shuffle join on orderkey while
    the customer-first form FORCES an early custkey exchange at every
    scale. Dims broadcast."""
    customer, orders, lineitem, supplier, nation, region = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    fo = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    return (
        lineitem.join(fo, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(_rev(), "revenue"))
    )


# --------------------------------------------------------------------------
@register(
    "tpch_q6",
    f"""
    SELECT CAST(SUM(CAST({PRICE} * CAST(l_discount AS DECIMAL(4,2))
                 AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("tpch", "filter", "aggregate"),
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting revenue change — pure scan→filter→agg; all predicates
    push to the parquet scan (reference: ParquetExec row-group pruning,
    row_group_filter.rs)."""
    (l,) = _t(spark, sf_dir, "lineitem")
    amount = (dec2("l_extendedprice") * F.col("l_discount").cast("decimal(4,2)")).cast(
        "decimal(18,4)"
    )
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(amount, "revenue"))
    )


# --------------------------------------------------------------------------
@register(
    "tpch_q7",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
           CAST(SUM({REV}) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_nationkey = 1 AND n2.n_nationkey = 2)
        OR (n1.n_nationkey = 2 AND n2.n_nationkey = 1))
      AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "join"),
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between two nations; disjunctive nation-pair
    predicate over a self-joined dim (nation appears twice). The pair is
    selected by n_nationkey (1, 2), not name: keys exist in both the
    synthetic TESTDATA domain (NATION_1) and official dbgen (IRAN,
    IRAQ), so the SF1 differential is non-vacuous. The nation filters
    are pushed onto the supplier/customer dims BEFORE their fact joins —
    each join side carries 2/N of the dim instead of all of it."""
    supplier, lineitem, orders, customer, nation = _t(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    sup = supplier.filter(F.col("s_nationkey").isin(1, 2)).select("s_suppkey", "s_nationkey")
    cust = customer.filter(F.col("c_nationkey").isin(1, 2)).select("c_custkey", "c_nationkey")
    # orders ⋈ nation-filtered customer FIRST (r6 SF1 A/B: 0.91 s vs
    # 1.38 s): the 2/N-nation customer slice broadcasts into orders and
    # the dim-sized (orderkey, c_nationkey) output then joins the
    # supplier-filtered fact — the fact never shuffles at bench scale
    # and degrades to one orderkey exchange at 100 TB.
    oc = (
        orders.select("o_orderkey", "o_custkey")
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_nationkey")
    )
    return (
        lineitem.filter(
            F.col("l_shipdate").between(
                F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
            )
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(oc, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            ((F.col("s_nationkey") == 1) & (F.col("c_nationkey") == 2))
            | ((F.col("s_nationkey") == 2) & (F.col("c_nationkey") == 1))
        )
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(_rev(), "revenue"))
    )


# --------------------------------------------------------------------------
@register(
    "tpch_q8",
    f"""
    WITH all_nations AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
             {REV} AS volume_dec, n2.n_nationkey AS supp_nkey
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type LIKE 'ECONOMY%'
        AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31')
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nkey = 3 THEN volume_dec
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(volume_dec) AS DOUBLE) AS mkt_share
    FROM all_nations GROUP BY o_year
    """,
    tags=("tpch", "join", "aggregate"),
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share — eight-table join, conditional aggregation.
    Part selected by LIKE-prefix and the numerator nation by key (3),
    valid in both the TESTDATA and official-dbgen domains (see q2/q7
    notes) so the SF1 differential is non-vacuous."""
    part, lineitem, supplier, orders, customer, nation, region = _t(
        spark, sf_dir, "part", "lineitem", "supplier", "orders", "customer", "nation", "region"
    )
    n1 = nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    vol = _rev()
    base = (
        lineitem.join(F.broadcast(part.filter(F.col("p_type").like("ECONOMY%"))),
                      F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.filter(
                F.col("o_orderdate").between(
                    F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
                )
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
              F.col("cn_region") == F.col("r_regionkey"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume_dec"),
                F.col("s_nationkey").alias("supp_nkey"))
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        base.groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("supp_nkey") == 3, F.col("volume_dec")).otherwise(zero)).cast("double")
                / F.sum("volume_dec").cast("double")
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
@register(
    "tpch_q9",
    f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST({REV} - CAST({QTY} * CAST(p_retailprice AS DECIMAL(12,2))
                 AS DECIMAL(20,4)) * CAST(0.1 AS DECIMAL(3,1)) AS DECIMAL(26,5)))
                AS DOUBLE) AS sum_profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    """,
    tags=("tpch", "join", "aggregate"),
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product type profit (adapted: ps_supplycost absent → unit cost
    proxied as 10% of p_retailprice)."""
    part, lineitem, supplier, orders, nation = _t(
        spark, sf_dir, "part", "lineitem", "supplier", "orders", "nation"
    )
    cost = (
        (dec2("l_quantity") * dec2("p_retailprice")).cast("decimal(20,4)")
        * F.lit(0.1).cast("decimal(3,1)")
    )
    profit = (_rev() - cost).cast("decimal(26,5)")
    return (
        lineitem.join(F.broadcast(part.filter(F.col("p_name").like("%red%"))),
                      F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dsum(profit, "sum_profit"))
    )


# --------------------------------------------------------------------------
@register(
    "tpch_q10",
    f"""
    SELECT c.c_custkey, c.c_name, CAST(SUM({REV}) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate < TIMESTAMP '1995-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    tags=("tpch", "join", "topk"),
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned item reporting — top-20 customers by lost revenue.
    Window is 1995 Q1: the only quarter where BOTH domains have 'R'
    lineitems (dbgen only sets returnflag R/A when l_receiptdate ≤
    1995-06-17, so any later order window is vacuous on official data;
    TESTDATA orders start 1995-01-01, so any earlier window is vacuous
    on the driver's tables)."""
    customer, orders, lineitem, nation = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
        )
        .join(lineitem.filter(F.col("l_returnflag") == "R"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_rev(), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
@register(
    "tpch_q11",
    f"""
    WITH pv AS (
      SELECT l_partkey,
             SUM(CAST({QTY} * {PRICE} AS DECIMAL(22,4))) AS value_dec
      FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey AS ps_partkey, CAST(value_dec AS DOUBLE) AS part_value
    FROM pv
    WHERE CAST(value_dec AS DOUBLE) >
          (SELECT CAST(SUM(value_dec) AS DOUBLE) * 1.4 / COUNT(*) FROM pv)
    ORDER BY part_value DESC, ps_partkey
    """,
    tags=("tpch", "subquery", "aggregate"),
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock identification (adapted: no partsupp → per-part
    traded value Σ qty·price from lineitem; threshold 1.4× the mean part
    value, which stays selective at every scale factor — TPC-H's own
    FRACTION=0.0001/SF scales the same way).
    Global-aggregate scalar subquery → broadcast cross-join, the same
    plan the reference's ScalarSubqueryToJoin produces."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    pv = (
        lineitem.groupBy("l_partkey")
        .agg(F.sum((dec2("l_quantity") * dec2("l_extendedprice")).cast("decimal(22,4)")).alias("value_dec"))
    )
    total = pv.agg(
        (F.sum("value_dec").cast("double") * F.lit(1.4) / F.count(F.lit(1))).alias("threshold")
    )
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec").cast("double") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("value_dec").cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "ps_partkey")
    )


# --------------------------------------------------------------------------
@register(
    "tpch_q12",
    """
    SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 60
                THEN 'LATE' ELSE 'ONTIME' END AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY ship_class
    """,
    tags=("tpch", "aggregate"),
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping modes/priority (adapted: l_shipmode + commit/receipt dates
    absent → classes derived from ship delay vs order date)."""
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    j = orders.join(
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        ),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.withColumn(
            "ship_class",
            F.when(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60, "LATE").otherwise("ONTIME"),
        )
        .groupBy("ship_class")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "tpch_q13",
    """
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey) cc
    GROUP BY c_count
    """,
    tags=("tpch", "outerjoin", "aggregate"),
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer distribution (adapted: o_comment filter → o_orderpriority
    filter). Left outer join + two-level aggregation."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "5-LOW"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
@register(
    "tpch_q14",
    f"""
    SELECT 100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {REV}
                                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM({REV}) AS DOUBLE) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
    tags=("tpch", "join", "aggregate"),
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect (adapted: p_type prefix LIKE → exact 'PROMO'
    since TESTDATA p_type is single-word)."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    zero = F.lit(0).cast("decimal(18,4)")
    rev = _rev()
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue")
        )
    )


# --------------------------------------------------------------------------
@register(
    "tpch_q15",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, CAST(SUM({REV}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("tpch", "subquery"),
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier — scalar MAX subquery over a derived view. Exact
    decimal sums make the equality comparison deterministic.
    The explicit l_suppkey IS NOT NULL in the view matches the null
    filter the optimizer pushes for the supplier join, so BOTH consumers
    of `revenue` (the join and the MAX scalar) share a byte-identical
    aggregation subtree and AQE's exchange reuse computes it once
    (pinned in test_plans.py::test_scalar_branch_reuses_exchange);
    NULL-keyed lineitem can't join supplier, so the view is unchanged
    for every joinable row. NOTE the MAX scalar leans on more than
    that: a NULL-keyed GROUP's total_revenue could in principle be the
    max and change the threshold — correctness relies on the TPC-H
    schema's l_suppkey NOT NULL (identifier, TPC-H spec §1.4), which
    the exchange-reuse pin test asserts against the actual data."""
    lineitem, supplier = _t(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
            & F.col("l_suppkey").isNotNull()
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(_rev(), "total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        supplier.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
@register(
    "tpch_q16",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT b.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
    JOIN part p ON p.p_partkey = b.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (5, 10, 15, 20, 25, 30)
      AND b.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    tags=("tpch", "antijoin", "distinct"),
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts/supplier relationship (adapted: partsupp → lineitem bridge;
    comment-LIKE exclusion → negative-balance supplier exclusion).
    NOT IN → left-anti join (reference lowers EXCEPT/NOT-IN the same way,
    expr/src/logical_plan/builder.rs:1035-1058).

    Plan shape: no pre-distinct of the bridge — COUNT(DISTINCT
    l_suppkey) dedupes inside the aggregate and the anti-join is
    per-suppkey, so the extra distinct would only add a full-width
    shuffle. Both joins broadcast (map-side); the single exchange is the
    final partial/final distinct-aggregate."""
    lineitem, part, supplier = _t(spark, sf_dir, "lineitem", "part", "supplier")
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(
            F.broadcast(
                part.filter((F.col("p_brand") != "Brand#1") & F.col("p_size").isin(5, 10, 15, 20, 25, 30))
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
@register(
    "tpch_q17",
    f"""
    SELECT CAST(SUM({PRICE}) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11'
      AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = p.p_partkey)
    """,
    tags=("tpch", "subquery", "aggregate"),
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (adapted: p_container filter absent).
    Correlated AVG subquery → per-part aggregate + rejoin. l_quantity is
    integer-valued so the double AVG is exact/order-independent."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    p = part.filter(F.col("p_brand") == "Brand#11").select("p_partkey")
    # Scale shape: semi-filter the fact to the brand's partkeys FIRST, then
    # aggregate — the per-partkey AVG only needs rows for those partkeys,
    # so the aggregate (and its broadcast) is dimension-sized, not
    # |part|-sized. Broadcasting an unfiltered fact aggregate would OOM at
    # 100× (VERDICT r1 item 3).
    li = (
        lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .drop("p_partkey")
    )
    avg_q = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(F.broadcast(avg_q), F.col("l_partkey") == F.col("ak"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg((F.sum(dec2("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
@register(
    "tpch_q18",
    f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM({QTY}) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 200)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderdate, o_orderkey LIMIT 100
    """,
    tags=("tpch", "semijoin", "topk"),
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large volume customer (threshold 300→200 to fit TESTDATA's ~4
    lineitems/order). The outer grouping keys are all functionally
    dependent on o_orderkey, so the per-order lineitem aggregate IS the
    final sum_qty — lineitem is scanned and aggregated ONCE and never
    rejoined at detail grain (r5 SF1 A/B: the window-over-detail form
    shuffles 6M detail rows through the join, 7.8 s; the r3 semi-join
    form scans lineitem twice, 6.5 s; this collapsed form 5.3 s at SF1
    and 0.84 vs 0.97 s at sf0.1). The filtered aggregate is
    dimension-sized (sq > 200 keeps ~1.4% of orders), so AQE broadcasts
    it to orders. Pinned in test_plans.py::test_q18_single_lineitem_scan."""
    customer, orders, lineitem = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(dec2("l_quantity")).cast("double").alias("sum_qty"))
        .filter(F.col("sum_qty") > 200)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
@register(
    "tpch_q19",
    f"""
    SELECT CAST(SUM({REV}) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#33' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
    tags=("tpch", "filter", "join"),
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue — OR-of-ANDs predicate spanning both join sides
    (adapted: container/shipmode terms absent). Exercises the reference's
    RewriteDisjunctivePredicate + join-predicate pushdown."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    j = lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    q = F.col("l_quantity")
    branch = lambda brand, smax, qlo, qhi: (
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & (q >= qlo)
        & (q <= qhi)
    )
    return j.filter(
        branch("Brand#11", 15, 1, 11) | branch("Brand#22", 25, 10, 20) | branch("Brand#33", 35, 20, 30)
    ).agg(dsum(_rev(), "revenue"))


# --------------------------------------------------------------------------
@register(
    "tpch_q20",
    """
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_regionkey = 2
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE '%red%'
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l.l_suppkey HAVING SUM(l.l_quantity) > 100)
    ORDER BY s_name
    """,
    tags=("tpch", "semijoin"),
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential part promotion (adapted: partsupp availability → shipped
    quantity of '%red%' parts in 1996 exceeding 100). Nested semi-join
    chain."""
    supplier, nation, lineitem, part = _t(spark, sf_dir, "supplier", "nation", "lineitem", "part")
    red = part.filter(F.col("p_name").like("%red%")).select("p_partkey")
    heavy = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 100)
        .select("l_suppkey")
    )
    return (
        supplier.join(F.broadcast(nation.filter(F.col("n_regionkey") == 2)),
                      F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(F.broadcast(heavy), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# --------------------------------------------------------------------------
@register(
    "tpch_q21",
    """
    WITH per_order AS (
      SELECT l.l_orderkey, COUNT(DISTINCT l.l_suppkey) AS n_supp,
             MAX(l.l_shipdate) AS o_max
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F' GROUP BY l.l_orderkey),
    per_supp AS (
      SELECT l.l_orderkey, l.l_suppkey, MAX(l.l_shipdate) AS s_max
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F' GROUP BY l.l_orderkey, l.l_suppkey)
    SELECT s.s_name, COUNT(*) AS numwait
    FROM per_supp ps
    JOIN per_order po ON po.l_orderkey = ps.l_orderkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    WHERE po.n_supp >= 2 AND ps.s_max = po.o_max
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name LIMIT 10
    """,
    tags=("tpch", "join", "aggregate"),
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (adapted: receipt/commit dates
    absent → the 'blocking' supplier is the one whose latest ship date
    equals the order's latest, on multi-supplier finalized orders —
    preserving q21's exists/not-exists correlation shape via aggregates).

    Plan shape: both per-order and per-(order,supplier) statistics come
    from windows over ONE hash exchange on l_orderkey — the
    (l_orderkey, l_suppkey) window and the dropDuplicates reuse that
    clustering (HashPartitioning on a subset of the keys satisfies the
    ClusteredDistribution), so the filtered lineitem is scanned once and
    shuffled once, versus twice-scanned + thrice-shuffled in the
    aggregate/self-join form."""
    lineitem, orders, supplier = _t(spark, sf_dir, "lineitem", "orders", "supplier")
    f_orders = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    li = (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(f_orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    )
    w_order = Window.partitionBy("l_orderkey")
    w_supp = Window.partitionBy("l_orderkey", "l_suppkey")
    return (
        li.withColumn("o_max", F.max("l_shipdate").over(w_order))
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w_order)))
        .withColumn("s_max", F.max("l_shipdate").over(w_supp))
        .filter((F.col("n_supp") >= 2) & (F.col("s_max") == F.col("o_max")))
        .dropDuplicates(["l_orderkey", "l_suppkey"])
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


# --------------------------------------------------------------------------
@register(
    "tpch_q22",
    """
    SELECT c.c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        FROM customer c2 WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '1999-06-01')
    GROUP BY c.c_nationkey
    """,
    tags=("tpch", "antijoin", "subquery"),
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sales opportunity (adapted: c_phone country codes absent →
    grouped by c_nationkey). NOT EXISTS → left-anti join; scalar AVG
    subquery via broadcast cross-join, exact-decimal mean."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec2("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.filter(F.col("o_orderdate") >= F.lit("1999-06-01").cast("timestamp")),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(dec2("c_acctbal"), "totacctbal"),
        )
    )
