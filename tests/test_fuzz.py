"""Fuzz / property tests, mirroring the reference's fuzz corpus
(`core/tests/fuzz_cases/`: aggregate_fuzz.rs, join_fuzz.rs,
sort_fuzz.rs, …): (a) results must be invariant under execution-mode
permutations (AQE on/off, broadcast on/off, shuffle partitions 1 vs N —
the Spark analog of the reference's spill-vs-not / partition-order
permutations), and (b) randomized data through join+agg must agree with
the DuckDB oracle.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rust_query_engine_greatest_spark.queries import REGISTRY

from tests.conftest import SF_DIR

REPRESENTATIVE = [
    "tpch_q3",          # join + agg + top-k
    "tpch_q18",         # semi-join on agg subquery
    "join_full",        # outer join null-matching
    "agg_grouping_sets",
    "window_frames",
    "setop_except_all",
    "events_top_users",
    "subq_not_in_null_aware",   # NAAJ is broadcast-only: must stay correct broadcast-off
    "subq_lateral_topk",        # WindowGroupLimit under every mode
    "text_repetition",          # zero-exchange fold: partitioning-independent
    # Pipeline ops (r8): at 100 TB a dedup/ANN result that depends on
    # partition count or join strategy is a correctness bug — the
    # banding/bucketing keys are value-derived, so the emitted sets
    # must be invariant under every execution mode.
    "dedup_exact",
    "dedup_minhash",            # LSH banding + hot-bucket cap
    "dedup_simhash",            # sub-banding + pair-array Hamming
    "sim_topk_bruteforce",      # exact top-k ties broken by id
    "dedup_bloom_incremental",  # distributed bit_or bitmap + probe
    "multimodal_audio_stats",   # mapInPandas decode: batch-shape-independent
    "text_span_scrub",          # rewrite: (id,pos) first-occurrence rule must
                                # hold under every partitioning/join mode
]

PERMUTATIONS = [
    {"spark.sql.adaptive.enabled": "false"},
    {"spark.sql.autoBroadcastJoinThreshold": "-1"},
    {"spark.sql.shuffle.partitions": "1"},
    {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "7",
    },
    # Forced-spill permutation (the reference's spill-vs-not fuzz axis,
    # aggregate_fuzz.rs / sort_merge_join spilling): 2-row in-memory
    # buffers push every window partition and SMJ buffer through the
    # spill file path; results must not change.
    {
        "spark.sql.windowExecBufferSpillThreshold": "2",
        "spark.sql.sortMergeJoinExecBufferSpillThreshold": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    },
]


def _row_multiset(df):
    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(round(v, 9))
        if isinstance(v, list):
            return "[" + ",".join(norm(x) for x in v) + "]"
        return repr(v)

    return sorted("|".join(norm(v) for v in row) for row in (tuple(r) for r in df.collect()))


_UNSET = object()


@pytest.fixture
def conf_sandbox(spark):
    touched = {}

    def set_conf(d):
        for k, v in d.items():
            if k not in touched:
                try:
                    touched[k] = spark.conf.get(k)
                except Exception:  # never-set conf (no session value)
                    touched[k] = _UNSET
            spark.conf.set(k, v)

    yield set_conf
    for k, v in touched.items():
        if v is _UNSET:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_result_invariant_under_execution_modes(name, spark, sf_dir, conf_sandbox):
    baseline = _row_multiset(REGISTRY[name].build(spark, sf_dir))
    assert baseline, f"{name} returned 0 rows — vacuous invariance"
    for conf in PERMUTATIONS:
        conf_sandbox(conf)
        got = _row_multiset(REGISTRY[name].build(spark, sf_dir))
        assert got == baseline, f"{name} changed results under {conf}"


# ---- randomized-data differential fuzz (join_fuzz / aggregate_fuzz) --------

row_st = st.tuples(
    st.integers(min_value=0, max_value=9),                      # join/group key
    st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),
    st.one_of(st.none(), st.sampled_from(["x", "y", "z"])),
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=st.lists(row_st, min_size=0, max_size=25), right=st.lists(row_st, min_size=0, max_size=25))
def test_join_agg_fuzz_vs_duckdb(spark_global, left, right):
    """Random tiny tables through LEFT JOIN + GROUP BY must agree with
    DuckDB bit-for-bit (integer aggregates only — no float ordering)."""
    spark = spark_global
    ldf = spark.createDataFrame(left, "k int, v int, s string") if left else spark.createDataFrame([], "k int, v int, s string")
    rdf = spark.createDataFrame(right, "k int, w int, t string") if right else spark.createDataFrame([], "k int, w int, t string")
    got = (
        ldf.join(rdf, "k", "left")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sv"),
            F.sum("w").alias("sw"),
            F.max("s").alias("ms"),
            F.min("t").alias("mt"),
        )
    )
    con = duckdb.connect()
    import pandas as pd

    con.register("l", pd.DataFrame(left, columns=["k", "v", "s"]).astype({"k": "int32"}) if left else pd.DataFrame({"k": pd.Series(dtype="int32"), "v": pd.Series(dtype="float64"), "s": pd.Series(dtype="object")}))
    con.register("r", pd.DataFrame(right, columns=["k", "w", "t"]).astype({"k": "int32"}) if right else pd.DataFrame({"k": pd.Series(dtype="int32"), "w": pd.Series(dtype="float64"), "t": pd.Series(dtype="object")}))
    want = con.sql(
        """
        SELECT l.k, COUNT(*) AS n, SUM(l.v) AS sv, SUM(r.w) AS sw,
               MAX(l.s) AS ms, MIN(r.t) AS mt
        FROM l LEFT JOIN r ON l.k = r.k
        GROUP BY l.k
        """
    ).fetchall()

    def norm(rows):
        return sorted(
            "|".join("NULL" if v is None else str(int(v)) if isinstance(v, float) and not math.isnan(v) and v == int(v) else str(v) for v in row)
            for row in rows
        )

    assert norm([tuple(r) for r in got.collect()]) == norm([tuple(r) for r in want])
    con.close()


@pytest.fixture(scope="session")
def spark_global(spark):
    return spark


# ---- greatest randomized differential (greatest.rs:422-450 stress) ---------

g_row = st.tuples(
    st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000)),
    st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000)),
    st.one_of(st.none(), st.floats(min_value=-1e6, max_value=1e6,
                                   allow_nan=False, allow_infinity=False)),
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=st.lists(g_row, min_size=1, max_size=30), use_nan=st.booleans())
def test_greatest_fuzz_vs_duckdb(spark_global, rows, use_nan):
    """Randomized greatest over mixed int/double columns with NULLs (and
    optionally NaN injected into one column) must agree with DuckDB's
    GREATEST — the same differential method as the reference's
    many-arg/random tests (tests/greatest_test.py:422-450), with DuckDB
    replacing 'Spark as oracle' since our engine IS Spark. Both engines
    skip NULLs and rank NaN above any number."""
    spark = spark_global
    sdf = spark.createDataFrame(rows, "a long, b long, c double")
    if use_nan:
        cexpr = F.when(F.col("c") < 0, F.lit(float("nan"))).otherwise(F.col("c"))
    else:
        cexpr = F.col("c")
    got = sorted(
        ("NaN" if r.g is not None and math.isnan(r.g) else ("NULL" if r.g is None else round(r.g, 9))
         for r in sdf.select(F.greatest(F.col("a"), F.col("b"), cexpr).alias("g")).collect()),
        key=str)
    con = duckdb.connect()
    import pandas as pd

    con.register("t", pd.DataFrame(rows, columns=["a", "b", "c"]))
    nan_c = "CASE WHEN c < 0 THEN CAST('nan' AS DOUBLE) ELSE c END" if use_nan else "c"
    want = sorted(
        ("NaN" if v[0] is not None and math.isnan(v[0]) else ("NULL" if v[0] is None else round(v[0], 9))
         for v in con.sql(f"SELECT greatest(CAST(a AS DOUBLE), CAST(b AS DOUBLE), {nan_c}) FROM t").fetchall()),
        key=str)
    assert got == want


# ---- sort / limit / distinct-string / window fuzz (sort_fuzz.rs,
# limit_fuzz.rs, distinct_count_string_fuzz.rs, window coverage) -------------

s_row = st.tuples(
    st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
    st.one_of(st.none(), st.sampled_from(["", "a", "b", "ab", "é", "Z"])),
    st.integers(min_value=0, max_value=10**6),  # unique-ish tiebreak
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=st.lists(s_row, min_size=0, max_size=30),
       limit=st.integers(min_value=0, max_value=10),
       offset=st.integers(min_value=0, max_value=5))
def test_sort_limit_offset_fuzz_vs_duckdb(spark_global, rows, limit, offset):
    """Random multi-key ORDER BY (mixed asc/desc, NULLS FIRST/LAST) +
    LIMIT/OFFSET must produce the IDENTICAL row sequence as DuckDB —
    the reference's sort_fuzz + limit_fuzz, engine-differential. The
    trailing id column makes the order total, so the comparison is
    order-SENSITIVE (unlike the multiset checks above)."""
    spark = spark_global
    sdf = spark.createDataFrame(rows, "k int, s string, id long") if rows else \
        spark.createDataFrame([], "k int, s string, id long")
    got = [
        tuple(r) for r in sdf.orderBy(
            F.asc_nulls_first("k"), F.desc_nulls_last("s"), F.asc("id")
        ).offset(offset).limit(limit).collect()
    ]
    con = duckdb.connect()
    import pandas as pd

    con.register("t", pd.DataFrame(rows, columns=["k", "s", "id"]) if rows else
                 pd.DataFrame({"k": pd.Series(dtype="float64"),
                               "s": pd.Series(dtype="object"),
                               "id": pd.Series(dtype="int64")}))
    want = [
        (None if v[0] is None or (isinstance(v[0], float) and math.isnan(v[0])) else int(v[0]),
         v[1], int(v[2]))
        for v in con.sql(
            "SELECT k, s, id FROM t ORDER BY k ASC NULLS FIRST, s DESC NULLS LAST, id "
            f"LIMIT {limit} OFFSET {offset}").fetchall()
    ]
    con.close()
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=st.lists(st.one_of(st.none(), st.text(
    alphabet="abé □\t0", min_size=0, max_size=4)), min_size=0, max_size=40))
def test_distinct_count_string_fuzz_vs_duckdb(spark_global, rows):
    """COUNT(DISTINCT s) and the distinct set itself over random short
    strings (unicode, whitespace, empty, NULL) must agree with DuckDB
    (distinct_count_string_fuzz.rs). NULL is excluded from COUNT but
    kept by DISTINCT-the-operator in both engines."""
    spark = spark_global
    data = [(s,) for s in rows]
    sdf = spark.createDataFrame(data, "s string") if data else spark.createDataFrame([], "s string")
    got_n = sdf.agg(F.count_distinct("s")).collect()[0][0]
    got_set = sorted((r.s if r.s is not None else "\x00NULL") for r in sdf.distinct().collect())
    con = duckdb.connect()
    import pandas as pd

    con.register("t", pd.DataFrame({"s": pd.Series(rows, dtype="object")}))
    want_n = con.sql("SELECT COUNT(DISTINCT s) FROM t").fetchone()[0]
    want_set = sorted((v[0] if v[0] is not None else "\x00NULL")
                      for v in con.sql("SELECT DISTINCT s FROM t").fetchall())
    con.close()
    assert got_n == want_n
    assert got_set == want_set


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=st.lists(st.tuples(
    st.integers(min_value=0, max_value=3),
    st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
    st.integers(min_value=0, max_value=10**6),
), min_size=1, max_size=30))
def test_window_fuzz_vs_duckdb(spark_global, rows):
    """row_number + running SUM + lag over random partitions/orders must
    agree with DuckDB bit-for-bit (the window analog of aggregate_fuzz:
    integer measures only, total order via the id tiebreak)."""
    from pyspark.sql.window import Window

    spark = spark_global
    sdf = spark.createDataFrame(rows, "k int, v int, id long")
    w = Window.partitionBy("k").orderBy("id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    got = sorted(tuple(r) for r in sdf.select(
        "k", "id",
        F.row_number().over(w).alias("rn"),
        F.sum("v").over(wrun).alias("run"),
        F.lag("v", 1).over(w).alias("prev"),
    ).collect())
    con = duckdb.connect()
    import pandas as pd

    con.register("t", pd.DataFrame(rows, columns=["k", "v", "id"]))
    want = sorted(
        (int(r[0]), int(r[1]), int(r[2]),
         None if r[3] is None or (isinstance(r[3], float) and math.isnan(r[3])) else int(r[3]),
         None if r[4] is None or (isinstance(r[4], float) and math.isnan(r[4])) else int(r[4]))
        for r in con.sql(
            """
            SELECT k, id, row_number() OVER w AS rn,
                   sum(v) OVER (PARTITION BY k ORDER BY id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run,
                   lag(v, 1) OVER w AS prev
            FROM t WINDOW w AS (PARTITION BY k ORDER BY id)
            """).fetchall())
    con.close()
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=st.lists(st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
                  min_size=0, max_size=25),
    right=st.lists(st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
                   min_size=0, max_size=25),
)
def test_setop_multiset_fuzz_vs_duckdb(spark_global, left, right):
    """INTERSECT ALL / EXCEPT ALL / UNION over random multisets with
    NULLs must agree with DuckDB on the exact result MULTISET —
    bag-semantics min/difference counting and NULL-equality-for-setops
    are classic divergence points (reference intersection.slt /
    union.slt breadth, fuzzed)."""
    spark = spark_global
    sl = spark.createDataFrame([(v,) for v in left], "v int") if left else \
        spark.createDataFrame([], "v int")
    sr = spark.createDataFrame([(v,) for v in right], "v int") if right else \
        spark.createDataFrame([], "v int")
    con = duckdb.connect()
    import pandas as pd

    con.register("l", pd.DataFrame({"v": pd.Series(left, dtype="object")}))
    con.register("r", pd.DataFrame({"v": pd.Series(right, dtype="object")}))

    def multiset(rows):
        from collections import Counter

        return Counter("N" if v is None or (isinstance(v, float) and math.isnan(v))
                       else int(v) for (v,) in rows)

    for op, sdf in (
        ("INTERSECT ALL", sl.intersectAll(sr)),
        ("EXCEPT ALL", sl.exceptAll(sr)),
        ("UNION", sl.union(sr).distinct()),
    ):
        got = multiset((r.v,) for r in sdf.collect())
        want = multiset(con.sql(
            f"SELECT CAST(v AS INT) FROM l {op} SELECT CAST(v AS INT) FROM r"
        ).fetchall())
        assert got == want, (op, got, want)
    con.close()


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    outer=st.lists(st.one_of(st.none(), st.integers(min_value=0, max_value=4)),
                   min_size=0, max_size=20),
    inner=st.lists(st.one_of(st.none(), st.integers(min_value=0, max_value=4)),
                   min_size=0, max_size=20),
)
def test_not_in_three_valued_fuzz_vs_duckdb(spark_global, outer, inner):
    """`x NOT IN (subquery)` under random NULLs on BOTH sides must
    agree with DuckDB row-for-row — the 3-valued-logic edge
    (subq_not_in_null_aware pins the shape; this fuzzes the value
    space: NULL in the subquery → empty result, NULL outer x → never
    kept, empty subquery → everything kept)."""
    spark = spark_global
    so = spark.createDataFrame([(v,) for v in outer], "v int") if outer else \
        spark.createDataFrame([], "v int")
    so.createOrReplaceTempView("fuzz_outer")
    si = spark.createDataFrame([(v,) for v in inner], "v int") if inner else \
        spark.createDataFrame([], "v int")
    si.createOrReplaceTempView("fuzz_inner")
    def norm(v):
        # NULL survives an empty-subquery NOT IN (nothing to compare) —
        # normalize it so the multiset compare covers that edge too
        return "N" if v is None or (isinstance(v, float) and math.isnan(v)) else int(v)

    got = sorted(
        (norm(r.v) for r in spark.sql(
            "SELECT v FROM fuzz_outer WHERE v NOT IN (SELECT v FROM fuzz_inner)"
        ).collect()),
        key=str,
    )
    con = duckdb.connect()
    import pandas as pd

    con.register("o", pd.DataFrame({"v": pd.Series(outer, dtype="object")}))
    con.register("i", pd.DataFrame({"v": pd.Series(inner, dtype="object")}))
    want = sorted(
        (norm(v[0]) for v in con.sql(
            "SELECT CAST(v AS INT) FROM o WHERE v NOT IN (SELECT v FROM i)"
        ).fetchall()),
        key=str,
    )
    con.close()
    assert got == want


PIPELINE_LIB_OPS = ["minhash", "simhash", "jaccard"]


@pytest.mark.parametrize("op", PIPELINE_LIB_OPS)
def test_library_dedup_pair_set_invariant(op, spark, sf_dir, conf_sandbox):
    """The REAL library dedup operators (the bench path — the registry
    twins above run constructive fixtures) over the documents table:
    the emitted pair set must be identical under AQE off, broadcast
    off, and 1/7 shuffle partitions. Banding keys are value-derived
    (xxhash64 of content), and hot-bucket capping/sub-banding is
    keyed on bucket SIZE (a value property), so nothing may depend on
    physical partitioning."""
    from rust_query_engine_greatest_spark.pipeline import dedup
    from rust_query_engine_greatest_spark.sources.catalog import load_table

    def build():
        d = load_table(spark, sf_dir, "documents")
        if op == "minhash":
            df = dedup.minhash_lsh_pairs(d, "doc_id", "text", threshold=0.8)
        elif op == "simhash":
            df = dedup.simhash_pairs(d, "doc_id", "text", max_hamming=3)
        else:
            df = dedup.jaccard_pairs(d, "doc_id", "text", threshold=0.8)
        return {tuple(r[:2]) for r in df.collect()}

    baseline = build()
    assert baseline, f"{op} emitted 0 pairs — vacuous invariance"
    for conf in PERMUTATIONS:
        conf_sandbox(conf)
        assert build() == baseline, f"{op} pair set changed under {conf}"


# ---- randomized window FRAME fuzz (window frames are the classic
# edge-bug surface: empty frames, offset frames at partition edges,
# RANGE peer groups, NULL order keys, DESC order) -----------------------------

_frame_bound = st.one_of(st.none(), st.integers(min_value=0, max_value=4))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(st.tuples(
        st.integers(min_value=0, max_value=2),                       # k
        st.one_of(st.none(), st.integers(min_value=-9, max_value=9)),  # o
        st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),  # v
        st.integers(min_value=0, max_value=10**6),                   # id
    ), min_size=1, max_size=30),
    lo=_frame_bound, hi=_frame_bound,       # None = UNBOUNDED
    desc=st.booleans(), use_range=st.booleans(),
)
def test_window_frame_bounds_fuzz_vs_duckdb(spark_global, rows, lo, hi,
                                            desc, use_range):
    """Random ROWS/RANGE frames with random PRECEDING/FOLLOWING offsets
    (including empty frames at partition edges and frames whose start
    exceeds their end → NULL aggregates), ASC/DESC order, NULL order
    keys (RANGE: the NULL peer group frames itself), must agree with
    DuckDB bit-for-bit. ROWS frames get a TOTAL order via the unique id
    tiebreak — with duplicate sort keys a ROWS frame is underdetermined
    across engines; RANGE frames are peer-based so ties are fine and
    the single numeric sort key keeps Spark's RANGE-offset rule."""
    spark = spark_global
    ids = {r[3] for r in rows}
    if len(ids) != len(rows):  # ROWS needs the id tiebreak to be unique
        rows = [(k, o, v, i) for i, (k, o, v, _) in enumerate(rows)]
    frame_kind = "RANGE" if use_range else "ROWS"
    lo_s = "UNBOUNDED PRECEDING" if lo is None else f"{lo} PRECEDING"
    hi_s = "UNBOUNDED FOLLOWING" if hi is None else f"{hi} FOLLOWING"
    # explicit NULL ordering: Spark defaults ASC→NULLS FIRST, DuckDB
    # (Postgres-style) ASC→NULLS LAST — an engine-default difference,
    # not a frame bug; the frame semantics under test need one total
    # convention spelled out in the shared SQL text
    o_key = "o DESC NULLS LAST" if desc else "o ASC NULLS FIRST"
    order = o_key if use_range else \
        (f"{o_key}, id DESC" if desc else f"{o_key}, id")
    q = (f"SELECT k, id, sum(v) OVER (PARTITION BY k ORDER BY {order} "
         f"{frame_kind} BETWEEN {lo_s} AND {hi_s}) AS s, "
         f"count(v) OVER (PARTITION BY k ORDER BY {order} "
         f"{frame_kind} BETWEEN {lo_s} AND {hi_s}) AS c FROM t")
    sdf = spark_global.createDataFrame(rows, "k int, o int, v int, id long")
    sdf.createOrReplaceTempView("t")
    got = sorted(
        (r[0], r[1], None if r[2] is None else int(r[2]), int(r[3]))
        for r in spark.sql(q).collect())
    con = duckdb.connect()
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["k", "o", "v", "id"])
    con.register("t", pdf.astype({"k": "int32", "o": "Int32", "v": "Int32"}))
    want = sorted(
        (int(r[0]), int(r[1]),
         None if r[2] is None or (isinstance(r[2], float) and math.isnan(r[2]))
         else int(r[2]), int(r[3]))
        for r in con.sql(q).fetchall())
    con.close()
    assert got == want, f"frame {frame_kind} [{lo_s}, {hi_s}] order={order}"


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=2)),   # k1
        st.one_of(st.none(), st.sampled_from(["x", "y"])),             # k2
        st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),  # v
    ), min_size=1, max_size=30),
    op=st.sampled_from(["ROLLUP (k1, k2)", "CUBE (k1, k2)",
                        "GROUPING SETS ((k1), (k2), ())"]),
)
def test_grouping_sets_null_keys_fuzz_vs_duckdb(spark_global, rows, op):
    """ROLLUP/CUBE/GROUPING SETS over data whose group keys are
    THEMSELVES NULL — the classic ambiguity (a NULL key group vs the
    super-aggregate NULL) disambiguated by GROUPING(); multisets must
    agree with DuckDB bit-for-bit on the same SQL text."""
    spark = spark_global
    sdf = spark.createDataFrame(rows, "k1 int, k2 string, v int")
    sdf.createOrReplaceTempView("gt")
    q = (f"SELECT k1, k2, grouping(k1) AS g1, grouping(k2) AS g2, "
         f"sum(v) AS s, count(*) AS c FROM gt GROUP BY {op}")
    def norm(r):
        return "|".join((
            "NULL" if r[0] is None else str(int(r[0])),
            "NULL" if r[1] is None else str(r[1]),
            str(int(r[2])), str(int(r[3])),
            "NULL" if r[4] is None or (isinstance(r[4], float)
                                       and math.isnan(r[4]))
            else str(int(r[4])),
            str(int(r[5])),
        ))

    got = sorted(norm(tuple(r)) for r in spark.sql(q).collect())
    con = duckdb.connect()
    import pandas as pd

    con.register("gt", pd.DataFrame(rows, columns=["k1", "k2", "v"])
                 .astype({"k1": "Int32", "v": "Int32"}))
    want = sorted(norm(r) for r in con.sql(q).fetchall())
    con.close()
    assert got == want, op


_special_key = st.sampled_from(
    [float("nan"), 0.0, -0.0, float("inf"), float("-inf"), 1.5, -1.5, None])


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=st.lists(st.tuples(_special_key,
                            st.integers(min_value=-50, max_value=50)),
                  min_size=1, max_size=25),
    right=st.lists(st.tuples(_special_key,
                             st.integers(min_value=-50, max_value=50)),
                   min_size=0, max_size=25),
)
def test_float_special_key_group_join_fuzz_vs_duckdb(spark_global, left, right):
    """Randomized GROUP BY + equi-JOIN over IEEE special keys (NaN,
    ±0.0, ±Inf, NULL) — the fuzz extension of the fixed
    agg_float_special_keys / join_float_special_keys pins: both engines
    group/match the two NaN patterns together and ±0.0 together, and
    NULL keys never join. Keys are re-emitted as k + 0.0 so the zero
    sign canonicalizes in the comparison text."""
    spark = spark_global

    def norm_key(k):
        if k is None:
            return "NULL"
        if math.isnan(k):
            return "NaN"
        return repr(k + 0.0)

    ldf = spark.createDataFrame(left, "k double, v int")
    rdf = spark.createDataFrame(right, "k double, w int") if right else \
        spark.createDataFrame([], "k double, w int")
    got_g = sorted(
        f"{norm_key(r[0])}|{r[1]}|{r[2]}"
        for r in ldf.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")).collect())
    got_j = sorted(
        f"{norm_key(r[0])}|{r[1]}|{r[2]}"
        for r in ldf.join(rdf, ldf["k"] == rdf["k"])
        .select(ldf["k"], "v", "w").collect())
    con = duckdb.connect()

    # DuckDB's pandas scan maps NaN -> NULL (documented), which would
    # fake a divergence — ship the fixtures as literal VALUES instead
    def duck_lit(k):
        if k is None:
            return "NULL::DOUBLE"
        if math.isnan(k):
            return "'nan'::DOUBLE"
        return f"'{k!r}'::DOUBLE"  # string cast keeps -0.0 / inf signs

    def duck_table(name, rows, second):
        if rows:
            vals = ", ".join(f"({duck_lit(k)}, {n})" for k, n in rows)
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                        f"(VALUES {vals}) t(k, {second})")
        else:
            con.execute(f"CREATE VIEW {name} AS SELECT NULL::DOUBLE AS k, "
                        f"NULL::BIGINT AS {second} WHERE false")

    duck_table("fl", left, "v")
    duck_table("fr", right, "w")
    want_g = sorted(
        f"{norm_key(r[0])}|{int(r[1])}|{int(r[2])}"
        for r in con.sql(
            "SELECT k, COUNT(*), SUM(v) FROM fl GROUP BY k").fetchall())
    want_j = sorted(
        f"{norm_key(r[0])}|{int(r[1])}|{int(r[2])}"
        for r in con.sql(
            "SELECT fl.k, v, w FROM fl JOIN fr ON fl.k = fr.k").fetchall())
    con.close()
    assert got_g == want_g, "GROUP BY over special keys diverged"
    assert got_j == want_j, "equi-join over special keys diverged"


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=st.lists(st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=3)),  # k
        st.integers(min_value=0, max_value=20),                       # ts
        st.integers(min_value=0, max_value=99),                       # lv
    ), min_size=1, max_size=25),
    right=st.lists(st.tuples(
        st.integers(min_value=0, max_value=3),                        # k
        st.integers(min_value=0, max_value=20),                       # rts
        st.integers(min_value=0, max_value=99),                       # rv
    ), min_size=0, max_size=25),
)
def test_asof_join_fuzz_vs_duckdb_asof(spark_global, left, right):
    """Randomized as-of join (operators.asof_join — the union-merge
    single-exchange formulation) vs DuckDB's NATIVE ASOF LEFT JOIN:
    per left row, the latest right row with rts <= ts on the same key;
    NULL left keys never match; duplicate left rows allowed. Right
    (k, rts) is deduped in generation — with right-side ties both
    engines pick arbitrarily, which is the one underdetermined cell of
    the contract (documented in asof_join's docstring)."""
    from rust_query_engine_greatest_spark.operators.joins import asof_join

    spark = spark_global
    seen, runiq = set(), []
    for k, rts, rv in right:
        if (k, rts) not in seen:
            seen.add((k, rts))
            runiq.append((k, rts, rv))
    ldf = spark.createDataFrame(left, "k int, ts int, lv int")
    rdf = (spark.createDataFrame(runiq, "k int, rts int, rv int")
           if runiq else spark.createDataFrame([], "k int, rts int, rv int"))
    got = sorted(
        "|".join("NULL" if v is None else str(v) for v in r)
        for r in asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="rts")
        .select("k", "ts", "lv", "rts", "rv").collect())
    con = duckdb.connect()
    import pandas as pd

    con.register("al", pd.DataFrame(left, columns=["k", "ts", "lv"])
                 .astype({"k": "Int32"}))
    con.register("ar", pd.DataFrame(runiq, columns=["k", "rts", "rv"])
                 if runiq else pd.DataFrame({"k": pd.Series(dtype="int32"),
                                             "rts": pd.Series(dtype="int64"),
                                             "rv": pd.Series(dtype="int64")}))
    want = sorted(
        "|".join("NULL" if v is None or (isinstance(v, float) and math.isnan(v))
                 else str(int(v)) for v in r)
        for r in con.sql(
            "SELECT al.k, al.ts, al.lv, ar.rts, ar.rv FROM al "
            "ASOF LEFT JOIN ar ON al.k = ar.k AND al.ts >= ar.rts"
        ).fetchall())
    con.close()
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    outer=st.lists(st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=4)),   # k
        st.one_of(st.none(), st.integers(min_value=-20, max_value=20)),  # v
    ), min_size=1, max_size=25),
    inner=st.lists(st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=4)),   # k
        st.one_of(st.none(), st.integers(min_value=-20, max_value=20)),  # w
    ), min_size=0, max_size=25),
)
def test_correlated_subquery_fuzz_vs_duckdb(spark_global, outer, inner):
    """Randomized correlated scalar subquery + EXISTS / NOT EXISTS over
    NULL-bearing keys and values — the decorrelation surface (Spark
    rewrites these to aggregated left-outer / semi / anti joins; the
    fixed subq_* registry entries pin the plan shapes, this pins the
    SEMANTICS under random data): NULL correlation keys never match
    (mx NULL, exists false, not-exists true), empty inner → the same,
    and the scalar MAX sees only the matching slice."""
    spark = spark_global
    odf = spark.createDataFrame(outer, "k int, v int")
    idf = (spark.createDataFrame(inner, "k int, w int")
           if inner else spark.createDataFrame([], "k int, w int"))
    odf.createOrReplaceTempView("fz_o")
    idf.createOrReplaceTempView("fz_i")
    q = """
        SELECT o.k, o.v,
               (SELECT MAX(i.w) FROM fz_i i WHERE i.k = o.k) AS mx,
               EXISTS(SELECT 1 FROM fz_i i
                      WHERE i.k = o.k AND i.w > o.v) AS ex,
               NOT EXISTS(SELECT 1 FROM fz_i i WHERE i.k = o.k) AS nx
        FROM fz_o o
    """
    def norm(r):
        return "|".join("NULL" if v is None
                        else str(int(v)) if not isinstance(v, bool) and isinstance(v, (int, float))
                        else str(bool(v)) for v in r)

    got = sorted(norm(tuple(r)) for r in spark.sql(q).collect())
    con = duckdb.connect()
    import pandas as pd

    con.register("fz_o", pd.DataFrame(outer, columns=["k", "v"])
                 .astype({"k": "Int32", "v": "Int32"}))
    con.register("fz_i", pd.DataFrame(inner, columns=["k", "w"])
                 .astype({"k": "Int32", "w": "Int32"})
                 if inner else pd.DataFrame({"k": pd.Series(dtype="Int32"),
                                             "w": pd.Series(dtype="Int32")}))
    want = sorted(
        norm(tuple(None if x is None or (isinstance(x, float) and math.isnan(x))
                   else x for x in r))
        for r in con.sql(q).fetchall())
    con.close()
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=st.lists(
    st.one_of(
        st.none(),
        st.lists(st.sampled_from(["a", "b", "ab"]), min_size=0, max_size=25)
        .map(" ".join),
    ),
    min_size=0, max_size=15,
))
def test_span_scrub_fuzz_vs_duckdb(spark_global, docs):
    """The exact-substring rewrite over random tiny-alphabet documents
    (chunk collisions are dense by construction: 3 token kinds, 0-25
    tokens against the 10-token chunk width) must agree with the
    registry oracle row-for-row — n_spans, n_cut, AND the rebuilt text.
    NULL/empty documents and sub-chunk-width documents included."""
    from rust_query_engine_greatest_spark.pipeline import dedup
    from rust_query_engine_greatest_spark.queries import REGISTRY

    spark = spark_global
    rows = [(i, t) for i, t in enumerate(docs)]
    sdf = (spark.createDataFrame(rows, "doc_id long, text string")
           if rows else spark.createDataFrame([], "doc_id long, text string"))
    got = sorted(tuple(r) for r in
                 dedup.span_scrub(sdf, "doc_id", "text").collect())
    con = duckdb.connect()
    import pandas as pd

    con.register("documents", pd.DataFrame(
        {"doc_id": pd.Series([r[0] for r in rows], dtype="int64"),
         "text": pd.Series([r[1] for r in rows], dtype="object")}))
    want = sorted((int(r[0]), int(r[1]), int(r[2]), r[3])
                  for r in con.sql(REGISTRY["text_span_scrub"].oracle)
                  .fetchall())
    con.close()
    assert got == want
