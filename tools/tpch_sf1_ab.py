"""SF1 A/B harness for the round-6 perf items (r5 verdict #2): candidate
plan variants for the worst SF1 queries (q5, q16, q11) plus conf
variants (runtime bloom join filter, AQE advisory sizes), each measured
interleaved best-of-N against the registry baseline on official dbgen
SF1 parquet. Results print as one JSON line per variant; winners get
promoted into queries/tpch.py (never both forms).

Usage: python tools/tpch_sf1_ab.py [--dir /tmp/sf1_tpch] [--passes 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from tpch_sf1 import ensure_sf1, TPCH_TABLES  # noqa: E402


def q5_orders_first(spark, sf_dir):
    """q5 variant: orders⋈lineitem on orderkey FIRST, customer joins
    second — the custkey exchange then carries joined fact rows instead
    of pre-join orders. A/B for the smaller first exchange at scale."""
    from rust_query_engine_greatest_spark.sources.catalog import load_table

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    from rust_query_engine_greatest_spark.queries.tpch import _rev
    from rust_query_engine_greatest_spark.queries.base import dsum

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


def q16_part_first(spark, sf_dir):
    """q16 variant: the selective broadcast part join (12% survive)
    BEFORE the anti-join, so the anti probe sees 8x fewer rows."""
    from rust_query_engine_greatest_spark.sources.catalog import load_table

    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(
                part.filter((F.col("p_brand") != "Brand#1")
                            & F.col("p_size").isin(5, 10, 15, 20, 25, 30))
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"),
              "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


CONF_VARIANTS = {
    # runtime bloom join filter on the fact side (Spark injects it
    # automatically at >=10GB probe scans — the 100 TB default; at SF1
    # the thresholds must be lowered to see the cluster behavior)
    "bloom": {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "64MB",
    },
    "advisory16m": {"spark.sql.adaptive.advisoryPartitionSizeInBytes": "16MB"},
    "advisory128m": {"spark.sql.adaptive.advisoryPartitionSizeInBytes": "128MB"},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf1_tpch")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--queries", default="tpch_q5,tpch_q16,tpch_q11,tpch_q21,tpch_q18,tpch_q9,tpch_q3,tpch_q12")
    args = ap.parse_args()

    from rust_query_engine_greatest_spark.queries import REGISTRY
    from rust_query_engine_greatest_spark.session import get_spark
    from rust_query_engine_greatest_spark.sources import compact

    ensure_sf1(args.dir)
    spark = get_spark(app_name="tpch-sf1-ab")
    dest, _ = compact.compact_tables(spark, args.dir, tables=TPCH_TABLES)
    compact._ACTIVE[os.path.abspath(args.dir)] = dest
    if os.environ.get("SPARK_GRAFT_AB_STATS", "1") != "0":
        # A/B under the same stats+CBO configuration the bench of
        # record runs (r7 promoted it); disable: SPARK_GRAFT_AB_STATS=0
        from rust_query_engine_greatest_spark.sources import stats

        stats.activate(spark, args.dir)

    names = args.queries.split(",")
    plan_variants = {
        "tpch_q5": {"orders_first": q5_orders_first},
        "tpch_q16": {"part_first": q16_part_first},
        "tpch_q21": {"single_sort": q21_single_sort,
                     "agg_form": q21_agg_form,
                     "arrays": q21_arrays},
        "tpch_q18": {"slice_broadcast": q18_slice_broadcast},
    }

    # build the run matrix: (label, builder, confs)
    runs: list[tuple[str, object, dict]] = []
    for n in names:
        runs.append((f"{n}:base", REGISTRY[n].build, {}))
        for vn, vb in plan_variants.get(n, {}).items():
            runs.append((f"{n}:{vn}", vb, {}))
        for cn, confs in CONF_VARIANTS.items():
            runs.append((f"{n}:conf-{cn}", REGISTRY[n].build, confs))

    # warm every plan once
    for label, build, confs in runs:
        saved = {k: spark.conf.get(k, None) for k in confs}
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            build(spark, args.dir).collect()
        except Exception as e:  # noqa: BLE001
            print(f"warm {label} failed: {e}", file=sys.stderr)
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    best: dict[str, float] = {}
    rows: dict[str, int] = {}
    for _ in range(args.passes):
        for label, build, confs in runs:
            saved = {k: spark.conf.get(k, None) for k in confs}
            for k, v in confs.items():
                spark.conf.set(k, v)
            try:
                t0 = time.perf_counter()
                rows[label] = len(build(spark, args.dir).collect())
                dt = time.perf_counter() - t0
                best[label] = round(min(best.get(label, 9e9), dt), 4)
            except Exception as e:  # noqa: BLE001
                print(f"run {label} failed: {e}", file=sys.stderr)
                best[label] = -1.0
            finally:
                for k, v in saved.items():
                    if v is None:
                        spark.conf.unset(k)
                    else:
                        spark.conf.set(k, v)
    print(json.dumps({"metric": "sf1_ab_best", "passes": args.passes,
                      "best": best, "rows": rows,
                      "load": list(os.getloadavg()),
                      "ts": round(time.time(), 1)}))




def q7_orders_cust_first(spark, sf_dir):
    """q7 variant: orders ⋈ nation-filtered customer FIRST (dim-sized
    output), broadcast into the supplier-filtered lineitem — zero fact
    exchanges at bench scale, graceful shuffle degradation at 100 TB."""
    from rust_query_engine_greatest_spark.sources.catalog import load_table
    from rust_query_engine_greatest_spark.queries.tpch import _rev
    from rust_query_engine_greatest_spark.queries.base import dsum

    supplier = load_table(spark, sf_dir, "supplier")
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"),
                       F.col("n_name").alias("cust_nation"))
    sup = supplier.filter(F.col("s_nationkey").isin(1, 2)).select(
        "s_suppkey", "s_nationkey")
    cust = customer.filter(F.col("c_nationkey").isin(1, 2)).select(
        "c_custkey", "c_nationkey")
    oc = (orders.select("o_orderkey", "o_custkey")
          .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
          .select("o_orderkey", "c_nationkey"))
    return (
        lineitem.filter(
            F.col("l_shipdate").between(
                F.lit("1996-01-01").cast("timestamp"),
                F.lit("1997-12-31").cast("timestamp"))
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(oc, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            ((F.col("s_nationkey") == 1) & (F.col("c_nationkey") == 2))
            | ((F.col("s_nationkey") == 2) & (F.col("c_nationkey") == 1))
        )
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(dsum(_rev(), "revenue"))
    )


def q8_orders_cust_first(spark, sf_dir):
    """q8 variant: date-filtered orders ⋈ region-filtered customer
    first; the joined (orderkey, year) side then joins the part-filtered
    fact."""
    from rust_query_engine_greatest_spark.sources.catalog import load_table
    from rust_query_engine_greatest_spark.queries.tpch import _rev

    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n1 = nation.select(F.col("n_nationkey").alias("cn_key"),
                       F.col("n_regionkey").alias("cn_region"))
    cust_am = (customer.select("c_custkey", "c_nationkey")
               .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cn_key"))
               .join(F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
                     F.col("cn_region") == F.col("r_regionkey"))
               .select("c_custkey"))
    oc = (orders.filter(
            F.col("o_orderdate").between(
                F.lit("1996-01-01").cast("timestamp"),
                F.lit("1997-12-31").cast("timestamp")))
          .select("o_orderkey", "o_custkey", "o_orderdate")
          .join(F.broadcast(cust_am), F.col("o_custkey") == F.col("c_custkey"))
          .select("o_orderkey", F.year("o_orderdate").alias("o_year")))
    vol = _rev()
    base = (
        lineitem.join(F.broadcast(part.filter(F.col("p_type").like("ECONOMY%"))),
                      F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(oc, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_year", vol.alias("volume_dec"),
                F.col("s_nationkey").alias("supp_nkey"))
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        base.groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("supp_nkey") == 3,
                             F.col("volume_dec")).otherwise(zero)).cast("double")
                / F.sum("volume_dec").cast("double")
            ).alias("mkt_share")
        )
    )


# ---- round-8 variants (VERDICT r7 #2: q11/q18/q21 post-exchange shave) ----

def q21_single_sort(spark, sf_dir):
    """q21 variant: the (l_orderkey, l_suppkey) window FIRST, then a
    dense_rank-based supplier count — the registry form sorts the 4M-row
    semi-filtered fact TWICE (by okey for o_max/n_supp, then by
    okey+skey for s_max) and builds a collect_set per row; ordering the
    specs so the (okey, skey) sort happens first lets EnsureRequirements
    satisfy the (okey)-window's required ordering from the existing
    prefix, and max(dense_rank) replaces the set build."""
    from pyspark.sql import Window

    from rust_query_engine_greatest_spark.sources.catalog import load_table

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    f_orders = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    li = (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(f_orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    )
    w_supp = Window.partitionBy("l_orderkey", "l_suppkey")
    w_rank = Window.partitionBy("l_orderkey").orderBy("l_suppkey")
    w_order = Window.partitionBy("l_orderkey")
    return (
        li.withColumn("s_max", F.max("l_shipdate").over(w_supp))
        .withColumn("dr", F.dense_rank().over(w_rank))
        .withColumn("n_supp", F.max("dr").over(w_order))
        .withColumn("o_max", F.max("l_shipdate").over(w_order))
        .filter((F.col("n_supp") >= 2) & (F.col("s_max") == F.col("o_max")))
        .dropDuplicates(["l_orderkey", "l_suppkey"])
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


def q21_agg_form(spark, sf_dir):
    """q21 variant: the aggregate/join EXISTS lowering over ONE explicit
    orderkey repartition (both groupBys and the join-back are satisfied
    by the same clustering; the r5 A/B of this shape predates stats+CBO)."""
    from rust_query_engine_greatest_spark.sources.catalog import load_table

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    f_orders = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    li = (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(f_orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .repartition("l_orderkey")
    )
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("s_max"))
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.max("s_max").alias("o_max"))
    return (
        per_supp.join(per_order.filter(F.col("n_supp") >= 2), "l_orderkey")
        .filter(F.col("s_max") == F.col("o_max"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


def q18_slice_broadcast(spark, sf_dir):
    """q18 variant: broadcast the ~1.4%-of-orders slice INTO customer
    (the registry form broadcasts the whole 150k-row customer build
    side; the filtered orders⋈big slice is ~7× smaller)."""
    from rust_query_engine_greatest_spark.queries.base import dec2
    from rust_query_engine_greatest_spark.sources.catalog import load_table

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(dec2("l_quantity")).cast("double").alias("sum_qty"))
        .filter(F.col("sum_qty") > 200)
    )
    slice_ = orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
    return (
        customer.join(F.broadcast(slice_),
                      F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )




def q21_arrays(spark, sf_dir):
    """q21 variant: ONE ObjectHashAggregate over the orderkey exchange
    collects each order's (suppkey, shipdate) entries (bounded: TPC-H
    orders have ≤7 lineitems at any SF), then pure array expressions
    derive o_max / n_supp / the blocking suppliers — no Sort, no Window,
    no dedup aggregate. A supplier's s_max equals o_max iff it has an
    entry AT o_max, so winners = distinct suppkeys among entries with
    shipdate == array_max."""
    from rust_query_engine_greatest_spark.sources.catalog import load_table

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    f_orders = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    li = (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(f_orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    )
    xs = F.col("xs")
    o_max = F.array_max(F.transform(xs, lambda x: x["l_shipdate"]))
    n_supp = F.size(F.array_distinct(F.transform(xs, lambda x: x["l_suppkey"])))
    winners = F.array_distinct(
        F.transform(
            F.filter(xs, lambda x: x["l_shipdate"] == F.col("o_max")),
            lambda x: x["l_suppkey"],
        )
    )
    return (
        li.groupBy("l_orderkey")
        .agg(F.collect_list(F.struct("l_suppkey", "l_shipdate")).alias("xs"))
        .withColumn("o_max", o_max)
        .filter(n_supp >= 2)
        .select(F.explode(winners).alias("l_suppkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


if __name__ == "__main__":
    main()
