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


# --- ClickBench family breadth (reference benchmarks/queries/clickbench/
# queries.sql, 43 queries). Each entry below re-expresses one FAMILY the
# suite exercises that the two original cb_* shapes did not: regex
# carving (Q28), global COUNT(DISTINCT) (Q5-6), point lookup (Q19),
# empty results (Q19's miss case), deep LIMIT/OFFSET pagination
# (Q38-42), exact quantiles, wide multi-sum scans (Q29), per-minute
# time-series rollups (Q43), HAVING over string-length stats (Q27-28),
# and CASE-carved grouping keys (Q38). ----------------------------------


@register(
    "cb_regex_extract_key",
    r"""
    SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k,
           COUNT(*) AS n,
           CAST(SUM(length(props)) AS DOUBLE) / COUNT(*) AS avg_len
    FROM events
    GROUP BY k HAVING COUNT(*) > 20
    ORDER BY n DESC, k LIMIT 10
    """,
    tags=("harness", "clickbench"),
)
def cb_regex_extract_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench Q28 family: regex-carve a key out of a raw payload
    column, aggregate over it, HAVING-filter, top-N. regexp_extract is a
    codegen JVM expression — the regex never leaves the executor. The
    mean is expressed as exact integer SUM / COUNT (one double division)
    so both engines produce bit-identical doubles."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.regexp_extract("props", r'"k": (\d+)', 1).cast("int").alias("k"),
            F.length("props").alias("len"),
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("len").cast("double") / F.count(F.lit(1))).alias("avg_len"),
        )
        .filter(F.col("n") > 20)
        .orderBy(F.desc("n"), "k")
        .limit(10)
    )


@register(
    "cb_count_distinct_global",
    """
    SELECT COUNT(DISTINCT user_id)    AS users,
           COUNT(DISTINCT event_type) AS types,
           COUNT(*)                   AS n
    FROM events
    """,
    tags=("harness", "clickbench"),
)
def cb_count_distinct_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench Q5/Q6 family: global COUNT(DISTINCT) without grouping.
    Catalyst expands multiple distincts into an expand+two-phase plan —
    partial distinct map-side, so the shuffle carries distinct keys, not
    rows (the scale property that matters at 100 TB)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("users"),
        F.countDistinct("event_type").alias("types"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "cb_point_lookup",
    """
    SELECT event_id, user_id, event_type
    FROM events WHERE user_id = 7 ORDER BY event_id
    """,
    tags=("harness", "clickbench"),
)
def cb_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench Q19 family: single-key point lookup on an unindexed
    column. The equality predicate is pushed to the parquet scan
    (PushedFilters) so row groups whose user_id stats exclude 7 are
    skipped without decoding."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("user_id") == 7)
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    )


@register(
    "cb_empty_result",
    """
    SELECT event_id, value FROM events
    WHERE value < -1e18 ORDER BY event_id LIMIT 10
    """,
    tags=("harness", "clickbench"),
)
def cb_empty_result(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench miss-case family: a selective predicate that matches
    nothing must return a clean empty result (schema intact, no scan
    error). Intentionally 0 rows — the check here is agreement on
    emptiness + schema, and parquet min/max stats prune every row group
    before any decode."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("value") < -1e18)
        .select("event_id", "value")
        .orderBy("event_id")
        .limit(10)
    )


@register(
    "cb_topn_offset",
    """
    SELECT user_id, COUNT(*) AS c FROM events
    GROUP BY user_id ORDER BY c DESC, user_id LIMIT 10 OFFSET 20
    """,
    tags=("harness", "clickbench"),
)
def cb_topn_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench Q38-42 family: deep pagination — ORDER BY ... LIMIT
    with OFFSET. Spark has no OFFSET in the DataFrame API pre-3.4-SQL,
    but `offset()` exists in 3.5+/4.x and plans as
    GlobalLimit(offset+limit)+drop — a driver-bounded top-(k+offset),
    not a full sort. Ties broken by user_id for determinism."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "user_id")
        .offset(20)
        .limit(10)
    )


@register(
    "cb_quantiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.50), 6) AS p50,
           round(quantile_cont(value, 0.90), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
    tags=("harness", "clickbench"),
)
def cb_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench quantile family over the raw value column: exact
    continuous percentiles per group (F.percentile == DuckDB
    quantile_cont, linear interpolation; round(6) absorbs last-ulp
    divergence in the interpolation step)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
    )


@register(
    "cb_wide_sums",
    """
    SELECT """ + ",\n           ".join(
        f"CAST(SUM(CAST(value AS DECIMAL(12,2)) + {i}) AS DOUBLE) AS s{i}"
        for i in range(10)
    ) + """
    FROM events
    """,
    tags=("harness", "clickbench"),
)
def cb_wide_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench Q29 family: many SUM expressions over one scan — all
    ten aggregates ride a single pass (one partial-agg over the scan, no
    repeated reads), each in exact decimal then surfaced as double."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(*[
        F.sum(dec2("value") + F.lit(i)).cast("double").alias(f"s{i}")
        for i in range(10)
    ])


@register(
    "cb_minute_series",
    """
    SELECT date_trunc('minute', ts) AS m, COUNT(*) AS n
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
      AND ts <  TIMESTAMP '2024-01-06 00:00:00'
    GROUP BY m ORDER BY m LIMIT 100 OFFSET 10
    """,
    tags=("harness", "clickbench"),
)
def cb_minute_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench Q43 family: per-minute time-series rollup with a date
    window and pagination. The ts range predicate is pushed to the scan;
    date_trunc stays codegen."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-05 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-06 00:00:00").cast("timestamp"))
        )
        .groupBy(F.date_trunc("minute", "ts").alias("m"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("m")
        .offset(10)
        .limit(100)
    )


@register(
    "cb_len_stats_having",
    """
    SELECT event_type,
           CAST(SUM(length(props)) AS DOUBLE) / COUNT(*) AS l,
           COUNT(*) AS c,
           MIN(props) AS first_props
    FROM events WHERE props <> ''
    GROUP BY event_type HAVING COUNT(*) > 100
    ORDER BY l DESC, event_type LIMIT 25
    """,
    tags=("harness", "clickbench"),
)
def cb_len_stats_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench Q27/Q28 family: string-length statistics + MIN(string)
    per group with a HAVING floor. Mean as exact SUM/COUNT division."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("props") != "")
        .groupBy("event_type")
        .agg(
            (F.sum(F.length("props")).cast("double") / F.count(F.lit(1))).alias("l"),
            F.count(F.lit(1)).alias("c"),
            F.min("props").alias("first_props"),
        )
        .filter(F.col("c") > 100)
        .orderBy(F.desc("l"), "event_type")
        .limit(25)
    )


@register(
    "cb_case_carved_key",
    """
    SELECT event_type,
           CASE WHEN user_id % 10 = 0 THEN props ELSE '' END AS src,
           COUNT(*) AS pv
    FROM events WHERE value >= 0
    GROUP BY event_type, src
    ORDER BY pv DESC, event_type, src LIMIT 10 OFFSET 100
    """,
    tags=("harness", "clickbench"),
)
def cb_case_carved_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench Q38 family: a CASE-carved grouping key (Src/Dst
    traffic-source shape) + deep OFFSET pagination, fully tie-broken for
    determinism."""
    ev = load_table(spark, sf_dir, "events")
    src = F.when(F.col("user_id") % 10 == 0, F.col("props")).otherwise(F.lit("")).alias("src")
    return (
        ev.filter(F.col("value") >= 0)
        .groupBy("event_type", src)
        .agg(F.count(F.lit(1)).alias("pv"))
        .orderBy(F.desc("pv"), "event_type", "src")
        .offset(100)
        .limit(10)
    )


# --- IMDB/JOB + H2O-join harness shapes (reference benchmarks/queries/
# imdb/*.sql = the Join Order Benchmark, benchmarks/src/imdb/; H2O join
# task alongside the existing h2o_groupby_highcard). JOB's signature:
# many-way star joins, highly selective dimension predicates, LIKE /
# NOT LIKE / OR-chains on strings, and MIN() result aggregates — the
# optimizer-stress family the TPC-H suite doesn't cover. --------------


@register(
    "job_star_min",
    """
    SELECT MIN(p.p_name)          AS min_part,
           MIN(s.s_name)          AS min_supp,
           MIN(o.o_orderdate)     AS first_order
    FROM lineitem l, orders o, customer c, nation n, part p, supplier s
    WHERE l.l_orderkey = o.o_orderkey
      AND o.o_custkey  = c.c_custkey
      AND c.c_nationkey = n.n_nationkey
      AND l.l_partkey  = p.p_partkey
      AND l.l_suppkey  = s.s_suppkey
      AND n.n_name = 'FRANCE'
      AND p.p_type LIKE '%BRASS'
      AND o.o_orderpriority = '1-URGENT'
    """,
    tags=("harness", "job"),
)
def job_star_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOB 1a shape (benchmarks/queries/imdb/1a.sql): 6-way star join,
    every dimension carrying a selective predicate, MIN() outputs.
    Catalyst reorders the joins by the filtered cardinalities and
    broadcasts every dimension side — the exact optimization JOB was
    built to stress. Written as comma-joins in the oracle to prove the
    WHERE-clause join-condition extraction path too."""
    l, o, c, n, p, s = (load_table(spark, sf_dir, t) for t in
                        ("lineitem", "orders", "customer", "nation", "part", "supplier"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n.filter(F.col("n_name") == "FRANCE"), c.c_nationkey == n.n_nationkey)
        .join(p.filter(F.col("p_type").like("%BRASS")), l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .filter(o.o_orderpriority == "1-URGENT")
        .agg(
            F.min("p_name").alias("min_part"),
            F.min("s_name").alias("min_supp"),
            F.min("o_orderdate").alias("first_order"),
        )
    )


@register(
    "job_like_or_chain",
    """
    SELECT p.p_brand, COUNT(*) AS n, MIN(p.p_name) AS min_name
    FROM part p, lineitem l
    WHERE p.p_partkey = l.l_partkey
      AND p.p_name NOT LIKE '%blue%'
      AND (p.p_name LIKE '%red%' OR p.p_name LIKE '%green%')
      AND l.l_quantity > 40
    GROUP BY p.p_brand ORDER BY n DESC, p.p_brand LIMIT 10
    """,
    tags=("harness", "job"),
)
def job_like_or_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOB's NOT LIKE + OR-of-LIKEs predicate chain (1a.sql's mc.note
    carving) — disjunctive string predicates stay JVM-codegen and are
    evaluated on the dimension BEFORE the join, so the fact side probes
    an already-filtered broadcast."""
    p, l = load_table(spark, sf_dir, "part"), load_table(spark, sf_dir, "lineitem")
    pf = p.filter(
        ~F.col("p_name").like("%blue%")
        & (F.col("p_name").like("%red%") | F.col("p_name").like("%green%"))
    )
    return (
        l.filter(F.col("l_quantity") > 40)
        .join(pf, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), F.min("p_name").alias("min_name"))
        .orderBy(F.desc("n"), "p_brand")
        .limit(10)
    )


@register(
    "h2o_join_bigsmall",
    """
    WITH dim AS (
      SELECT user_id, min(event_type) AS seg,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS dim_v
      FROM events WHERE user_id % 20 = 0 GROUP BY user_id
    )
    SELECT e.event_type, d.seg,
           COUNT(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS v
    FROM events e JOIN dim d ON e.user_id = d.user_id
    GROUP BY e.event_type, d.seg
    """,
    tags=("harness", "h2o"),
)
def h2o_join_bigsmall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2O db-benchmark join task (big table × small keyed dim, then
    re-aggregate): the dim is derived small (5% of users) → broadcast
    side; the fact never shuffles for the join, only for the final
    two-key aggregate."""
    ev = load_table(spark, sf_dir, "events")
    dim = (
        ev.filter(F.col("user_id") % 20 == 0)
        .groupBy("user_id")
        .agg(
            F.min("event_type").alias("seg"),
            F.sum(dec2("value")).cast("double").alias("dim_v"),
        )
    )
    return (
        ev.join(F.broadcast(dim), "user_id")
        .groupBy("event_type", "seg")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec2("value")).cast("double").alias("v"),
        )
    )


# --- ClickBench fidelity pass (round 4): the remaining corpus shapes
# the 13 cb_* families above don't subsume. COVERAGE.md maps every one
# of the reference's 43 queries
# (datafusion-greatest/benchmarks/queries/clickbench/queries.sql) to an
# entry. ---------------------------------------------------------------


@register(
    "cb_select_star_topk",
    """
    SELECT event_id, ts, user_id, event_type, value, props
    FROM events WHERE props LIKE '%"k": 7%'
    ORDER BY ts, event_id LIMIT 10
    """,
    tags=("harness", "clickbench"),
)
def cb_select_star_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench Q23 (`SELECT * ... WHERE URL LIKE ... ORDER BY time
    LIMIT 10`): full-width row top-k — no aggregation, every column
    rides the TakeOrderedAndProject, so only 10 rows ever reach the
    driver while the LIKE stays a scan-level predicate. Tie-broken by
    event_id for determinism."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("props").like('%"k": 7%'))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .orderBy("ts", "event_id")
        .limit(10)
    )


@register(
    "cb_bare_sort_project",
    """
    SELECT props FROM events WHERE props <> ''
    ORDER BY ts, props LIMIT 10
    """,
    tags=("harness", "clickbench"),
)
def cb_bare_sort_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench Q24-26 (`SELECT SearchPhrase ... ORDER BY EventTime
    LIMIT 10`): single-column projection sorted by a DIFFERENT column —
    the sort key is pruned from the output but must survive until the
    TakeOrderedAndProject. Column pruning keeps the scan at two
    columns."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("props") != "")
        .orderBy("ts", "props")
        .select("props")
        .limit(10)
    )


@register(
    "cb_regex_replace_domain",
    r"""
    SELECT regexp_replace(props, '^\{"k": (\d)\d*\}$', '\1') AS k,
           CAST(SUM(length(props)) AS DOUBLE) / COUNT(*) AS l,
           COUNT(*) AS c,
           MIN(props) AS m
    FROM events WHERE props <> ''
    GROUP BY k HAVING COUNT(*) > 50
    ORDER BY l DESC, k LIMIT 25
    """,
    tags=("harness", "clickbench"),
)
def cb_regex_replace_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench Q28 (`REGEXP_REPLACE(Referer, ...)` domain carve +
    AVG(length) + MIN + HAVING + top-N): a backreference rewrite as the
    GROUPING KEY. Spark spells the backref $1, DuckDB \\1 — same
    single-match anchored pattern, so replace-first vs replace-all
    semantics coincide. Mean as exact SUM/COUNT division."""
    ev = load_table(spark, sf_dir, "events")
    carved = F.regexp_replace("props", r'^\{"k": (\d)\d*\}$', "$1").alias("k")
    return (
        ev.filter(F.col("props") != "")
        .groupBy(carved)
        .agg(
            (F.sum(F.length("props")).cast("double") / F.count(F.lit(1))).alias("l"),
            F.count(F.lit(1)).alias("c"),
            F.min("props").alias("m"),
        )
        .filter(F.col("c") > 50)
        .orderBy(F.desc("l"), "k")
        .limit(25)
    )


@register(
    "cb_arith_group_keys",
    """
    SELECT user_id, user_id - 1 AS u1, user_id - 2 AS u2, user_id - 3 AS u3,
           COUNT(*) AS c
    FROM events
    GROUP BY user_id, u1, u2, u3
    ORDER BY c DESC, user_id LIMIT 10
    """,
    tags=("harness", "clickbench"),
)
def cb_arith_group_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench Q35 (`GROUP BY ClientIP, ClientIP - 1, ...`):
    arithmetic-derived group keys. Catalyst folds the derived keys into
    the same exchange as the base key (they are functionally dependent),
    so the shuffle width is one key, not four."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            (F.col("user_id") - 1).alias("u1"),
            (F.col("user_id") - 2).alias("u2"),
            (F.col("user_id") - 3).alias("u3"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "user_id")
        .limit(10)
    )


@register(
    "cb_in_list_date_group",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS d, COUNT(*) AS pv
    FROM events
    WHERE event_type IN ('click', 'view')
      AND user_id % 7 = 0
      AND ts >= TIMESTAMP '2024-01-03 00:00:00'
      AND ts <  TIMESTAMP '2024-01-10 00:00:00'
    GROUP BY d ORDER BY pv DESC, d LIMIT 10 OFFSET 2
    """,
    tags=("harness", "clickbench"),
)
def cb_in_list_date_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench Q40 (`TraficSourceID IN (-1, 6) AND RefererHash = ...`
    + date window + OFFSET pagination): IN-list + modulus predicates
    with a time-range scan filter, daily rollup, deep-paged top-N. The
    IN and range predicates are pushed to the parquet scan."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(
            F.col("event_type").isin("click", "view")
            & (F.col("user_id") % 7 == 0)
            & (F.col("ts") >= F.lit("2024-01-03 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-10 00:00:00").cast("timestamp"))
        )
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("pv"))
        .orderBy(F.desc("pv"), "d")
        .offset(2)
        .limit(10)
    )


@register(
    "cb_global_minmax_avg",
    """
    SELECT MIN(ts) AS first_ts, MAX(ts) AS last_ts,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_v,
           COUNT(*) AS n
    FROM events
    """,
    tags=("harness", "clickbench"),
)
def cb_global_minmax_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench Q2/Q3/Q6 (`SELECT MIN(EventDate), MAX(EventDate)` /
    global AVG): whole-table min/max/avg without grouping — pure
    map-side partial aggregation, four scalars cross the exchange. Mean
    as exact decimal SUM / COUNT division."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        (F.sum(dec2("value")).cast("double") / F.count(F.lit(1))).alias("avg_v"),
        F.count(F.lit(1)).alias("n"),
    )


# --- H2O db-benchmark depth (round 4): the three groupby-task shapes
# beyond g1/g4 (h2o_groupby_highcard) and the join task
# (h2o_join_bigsmall) — reference benchmarks/src/bin/h2o.rs:104-113. ----

@register(
    "h2o_top2_per_group",
    """
    SELECT event_type, user_id, value FROM (
      SELECT event_type, user_id, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id) AS order_v
      FROM events WHERE value IS NOT NULL) sub
    WHERE order_v <= 2
    """,
    tags=("harness", "h2o"),
)
def h2o_top2_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2O groupby q8 (h2o.rs:111): largest-2 values per key via a
    row_number window over non-null rows. Same TakeOrdered-per-group
    shape as topk_per_group but with the benchmark's exact NULL-filter +
    window formulation; event_id tie-break pins determinism."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.col("event_id"))
    return (
        ev.withColumn("order_v", F.row_number().over(w))
        .filter(F.col("order_v") <= 2)
        .select("event_type", "user_id", "value")
    )


@register(
    "h2o_corr_r2",
    """
    SELECT event_type, user_id % 10 AS bucket,
           round(pow(corr(value, CAST(event_id % 1000 AS DOUBLE)), 2), 9) AS r2
    FROM events GROUP BY event_type, user_id % 10
    """,
    tags=("harness", "h2o"),
)
def h2o_corr_r2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2O groupby q9 (h2o.rs:112): pow(corr(v1, v2), 2) over a two-key
    group. Rounded to 9 places — corr is the one intrinsically
    order-dependent float aggregate family (see agg_stats)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", (F.col("user_id") % 10).alias("bucket")
    ).agg(
        F.round(
            F.pow(F.corr("value", (F.col("event_id") % 1000).cast("double")), 2), 9
        ).alias("r2")
    )


@register(
    "h2o_groupby_allkeys",
    """
    SELECT event_type, user_id % 4 AS k2, user_id % 9 AS k3,
           CAST(ts AS DATE) AS day, length(props) % 3 AS k5,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v,
           COUNT(*) AS count
    FROM events
    GROUP BY event_type, user_id % 4, user_id % 9, CAST(ts AS DATE),
             length(props) % 3
    """,
    tags=("harness", "h2o"),
)
def h2o_groupby_allkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2O groupby q10 (h2o.rs:113): sum + count grouped by EVERY key
    column at once — the widest-key, highest-cardinality aggregation of
    the task; partial aggregation degrades gracefully (near-unique keys)
    and the single hash exchange carries the composite key."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        (F.col("user_id") % 4).alias("k2"),
        (F.col("user_id") % 9).alias("k3"),
        F.to_date("ts").alias("day"),
        (F.length("props") % 3).alias("k5"),
    ).agg(
        F.sum(dec2("value")).cast("double").alias("v"),
        F.count(F.lit(1)).alias("count"),
    )


@register(
    "h2o_join_medium",
    """
    WITH dim AS (
      SELECT user_id, min(event_type) AS seg
      FROM events WHERE user_id % 2 = 0 GROUP BY user_id
    )
    SELECT d.seg, e.event_type, COUNT(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS v
    FROM events e JOIN dim d ON e.user_id = d.user_id
    GROUP BY d.seg, e.event_type
    """,
    tags=("harness", "h2o"),
)
def h2o_join_medium(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2O join task, medium-cardinality dim (50% of users — at real
    scale this side is fact-proportional, NOT broadcastable, so the
    plan is a shuffled hash/SMJ on the key; the broadcast-off fuzz
    permutation exercises exactly that path). Completes the h2o join
    family beside the small-dim (`h2o_join_bigsmall`) and string-key
    (`h2o_join_string`) variants (benchmarks/src/bin/h2o.rs join
    suite)."""
    ev = load_table(spark, sf_dir, "events")
    dim = (
        ev.filter(F.col("user_id") % 2 == 0)
        .groupBy("user_id")
        .agg(F.min("event_type").alias("seg"))
    )
    return (
        ev.join(dim, "user_id")
        .groupBy("seg", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec2("value")).cast("double").alias("v"),
        )
    )


@register(
    "h2o_join_string",
    """
    WITH fact AS (
      SELECT 'u' || CAST(user_id % 1000 AS VARCHAR) AS k, value FROM events
    ), dim AS (
      SELECT DISTINCT 'u' || CAST(user_id % 1000 AS VARCHAR) AS k
      FROM events WHERE user_id % 3 = 0
    )
    SELECT substr(f.k, 2, 1) AS bucket, COUNT(*) AS n,
           CAST(SUM(CAST(f.value AS DECIMAL(12,2))) AS DOUBLE) AS v
    FROM fact f JOIN dim d ON f.k = d.k
    GROUP BY substr(f.k, 2, 1)
    """,
    tags=("harness", "h2o"),
)
def h2o_join_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2O join task on a STRING key (the id4/id5 string-key joins of
    benchmarks/src/bin/h2o.rs): derived 'u<bucket>' keys on both sides,
    semi-selective dim, re-aggregated by a carved key prefix — string
    hashing/compare in the join hot path instead of int64."""
    ev = load_table(spark, sf_dir, "events")
    k = F.concat(F.lit("u"), (F.col("user_id") % 1000).cast("string"))
    fact = ev.select(k.alias("k"), "value")
    dim = (
        ev.filter(F.col("user_id") % 3 == 0)
        .select(k.alias("k"))
        .distinct()
    )
    return (
        fact.join(dim, "k")
        .groupBy(F.substring("k", 2, 1).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec2("value")).cast("double").alias("v"),
        )
    )
