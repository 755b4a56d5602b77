"""Unit pins for the slt harness's DataFusion-edge-semantics layer
(tools/slt_runner.py: _rewrite_df_fn_semantics + the df_* SQL UDF
shims). The parity suite proves these end-to-end on the corpus; this
module pins each edge in isolation so a harness refactor that breaks
one family fails HERE with a named semantic, not as an anonymous
census drift.

Every expected value cites the reference implementation it mirrors
(datafusion/functions/src/...), checked against the corpus's own
expected outputs in sqllogictest/test_files/{scalar,functions,expr,
regexp,aggregate}.slt.
"""

from __future__ import annotations

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from slt_runner import (  # noqa: E402
    _rewrite_df_fn_semantics,
    _rewrite_fn_calls,
    register_df_semantics,
)


@pytest.fixture(scope="module")
def dfspark(spark):
    register_df_semantics(spark)
    return spark


def one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0][0]


# --- pure rewrite layer (no Spark) -----------------------------------

def test_rewrite_log_family():
    out = _rewrite_df_fn_semantics("SELECT log(x), log(2, x), ln(x)")
    assert "df_log10(x)" in out
    assert "df_log_base(2, x)" in out
    assert "df_ln(x)" in out


def test_rewrite_substring_from_for():
    out = _rewrite_df_fn_semantics("SELECT substring('alphabet' FROM 3 FOR 2)")
    assert "df_substr3('alphabet', 3, 2)" in out


def test_rewrite_overlay_placing():
    out = _rewrite_df_fn_semantics(
        "SELECT overlay('Txxxxas' PLACING 'hom' FROM 2 FOR 4)")
    assert "df_overlay4('Txxxxas', 'hom', 2, 4)" in out


def test_rewrite_regexp_replace_flags():
    # no flag -> first-match shim (inlined: body references
    # regexp_instr); 'g' -> stays a plain global regexp_replace
    out = _rewrite_fn_calls("SELECT regexp_replace(s, 'a', 'b')")
    assert "regexp_instr" in out
    out = _rewrite_fn_calls("SELECT regexp_replace(s, 'a', 'b', 'g')")
    assert "regexp_replace(s, 'a', 'b')" in out and "regexp_instr" not in out
    # 'i' composes as (?i) prefix on a literal pattern
    out = _rewrite_fn_calls("SELECT regexp_replace(s, 'a', 'b', 'gi')")
    assert "regexp_replace(s, '(?i)a', 'b')" in out
    # Postgres \N backrefs in the replacement -> Spark $N
    out = _rewrite_fn_calls(r"SELECT regexp_replace(s, '(a)', 'X\\1Y', 'g')")
    assert "'X$1Y'" in out


def test_float_literal_typing():
    from slt_runner import _type_float_literals
    # bare float literals retype as DOUBLE (DataFusion/Arrow Float64)
    assert _type_float_literals("select 2.0/3") == "select 2.0e0/3"
    assert _type_float_literals("select .5 + 1") == "select .5e0 + 1"
    # inside strings, already-scientific, and >15-digit literals stay
    assert _type_float_literals("select '1.5', x") == "select '1.5', x"
    assert _type_float_literals("select 1.5e3") == "select 1.5e3"
    long = "select 12345678901234.5678"
    assert _type_float_literals(long) == long
    # qualified refs untouched
    assert _type_float_literals("select t1.c1 from t1") == \
        "select t1.c1 from t1"
    # float +/- float constant-folds decimal-exact BEFORE retyping, as
    # DataFusion's planner does (tpch q6.slt.part:47: the 0.05 bound
    # must be exact, not double 0.049999...)
    assert _type_float_literals("between 0.06 - 0.01 and 0.06 + 0.01") \
        == "between 0.05e0 and 0.07e0"
    # a tighter-binding neighbor blocks the fold (regrouping hazard)
    assert _type_float_literals("select 2 * 0.06 - 0.01") == \
        "select 2 * 0.06e0 - 0.01e0"
    assert _type_float_literals("select 0.06 - 0.01 * 2") == \
        "select 0.06e0 - 0.01e0 * 2"


def test_interval_plural_is_alias():
    from slt_runner import _rewrite_dialect
    # sqlparser-rs: plural unit word = column alias, literal is PG
    # bare-seconds (interval.slt:38-49)
    out = _rewrite_dialect("select interval '5' years")
    assert "interval '5' second" in out
    # singular stays a real unit
    out = _rewrite_dialect("select interval '5' year")
    assert "year" in out.lower() and "second" not in out.lower()


def test_xor_shift_precedence():
    from slt_runner import _bind_xor_tight
    # DataFusion: additive > ^ > shift; Spark: shift > ^. Only the
    # shift-adjacent pair needs parens (scalar.slt:1059 groupings
    # verified against the file's expected values)
    out = _bind_xor_tight("select 2 * c - 1 ^ 856 + d + 3, d ^ 7 >> 4")
    assert "2 * c - 1 ^ 856 + d + 3" in out
    assert "(d ^ 7) >> 4" in out
    assert _bind_xor_tight("select c # 856") == "select c ^ 856"
    # regex-pattern strings are protected
    assert _bind_xor_tight("select regexp_like(s, '^a # b')") == \
        "select regexp_like(s, '^a # b')"


def test_inline_expansion_leaves_no_udf_calls():
    # Spark forbids SQL UDFs in Sort and grouped-expression ORDER BY
    # resolution (UNSUPPORTED_SQL_UDF_USAGE) — every df_* call must be
    # textually expanded by the time translation finishes
    out = _rewrite_fn_calls(
        "SELECT substr(c1, 1, 1), avg(c12) FROM t "
        "GROUP BY substr(c1, 1, 1) ORDER BY substr(c1, 1, 1)")
    assert "df_" not in out
    assert out.count("CASE WHEN") >= 3  # one expansion per call site


def test_rewrite_translate_last_wins():
    # duplicate source char: DataFusion maps through the LAST pair
    out = _rewrite_df_fn_semantics("SELECT translate(s, 'aba', 'xyz')")
    # 'a' maps through its LAST pair (-> 'z'); 'b' keeps 'y'
    assert "@TR@(s, 'ab', 'zy')" in out
    # no duplicates -> untouched (Spark built-in identical)
    out = _rewrite_df_fn_semantics("SELECT translate(s, 'ab', 'xy')")
    assert "translate(s, 'ab', 'xy')" in out


def test_rewrite_array_agg_null_keeping():
    out = _rewrite_fn_calls("SELECT array_agg(c1) FROM t")
    assert "collect_list(named_struct('__f', c1))" in out or \
        "collect_list(struct(c1 AS __f))" in out
    assert "if(size(" in out  # empty input -> NULL, not []


# --- executed edge semantics (Spark, df_* shims installed) -----------

def test_ieee_log_edges(dfspark):
    # datafusion/functions/src/math/log.rs: f64::ln IEEE edges
    assert one(dfspark, "df_ln(0D)") == float("-inf")
    assert math.isnan(one(dfspark, "df_ln(-1D)"))
    assert one(dfspark, "df_log10(0D)") == float("-inf")
    assert one(dfspark, "df_log_base(1D, 64D)") == float("inf")
    assert one(dfspark, "df_ln(CAST(NULL AS DOUBLE))") is None


def test_isnan_nanvl_null_propagation(dfspark):
    # math/nanvl.rs: NULL in -> NULL out (Spark: isnan(NULL)=false)
    assert one(dfspark, "df_isnan(CAST(NULL AS DOUBLE))") is None
    assert one(dfspark, "df_nanvl(2D, CAST(NULL AS DOUBLE))") is None
    assert one(dfspark, "df_nanvl(double('NaN'), 3D)") == 3.0


def test_chr_any_codepoint(dfspark):
    # string/chr.rs: full Unicode (Spark's chr wraps at Latin-1)
    assert one(dfspark, "df_chr(128640)") == "\U0001F680"
    assert one(dfspark, "df_chr(65)") == "A"


def test_left_right_negative(dfspark):
    # unicode/left.rs: negative n drops |n| from the other end (PG)
    assert one(dfspark, "df_left('abcde', -2)") == "abc"
    assert one(dfspark, "df_right('abcde', -2)") == "cde"
    assert one(dfspark, "df_left('ab', -5)") == ""


def test_substr_pg_window(dfspark):
    # unicode/substr.rs: start<=0 eats into the length (PG window)
    assert one(dfspark, "df_substr3('alphabet', -3, 6)") == "al"
    assert one(dfspark, "df_substr3('alphabet', 0, 2)") == "a"
    assert one(dfspark, "df_substr2('alphabet', -2)") == "alphabet"


def test_overlay_semantics(dfspark):
    # string/overlay.rs: corpus functions.slt expected outputs
    assert one(dfspark, "df_overlay4('Txxxxas', 'hom', 2, 4)") == "Thomas"
    assert one(dfspark, "df_overlay3('Txxxxas', 'hom', 2)") == "Thomxas"
    # replace_len clamps at char_length(s): no tail resurrection
    assert one(dfspark, "df_overlay4('abc', 'XY', 2, 99)") == "aXY"


def test_regexp_replace_first_match_only(dfspark):
    # regexp/regexpreplace.rs: no 'g' flag -> first match only (PG)
    assert one(dfspark, "df_rr_first('aaa', 'a', 'b')") == "baa"
    assert one(dfspark, "df_rr_first('foobar', '(o)+', '[$1]')") == "f[o]bar"
    assert one(dfspark, "df_rr_first('xyz', 'q', 'b')") == "xyz"


def test_null_ordering_translation():
    """DataFusion defaults ORDER BY to NULLS LAST (ASC) / NULLS FIRST
    (DESC) — the Postgres convention; Spark defaults to the opposite.
    The translation pins the reference's default explicitly so LIMIT
    boundaries keep the same row set (aggregates_topk.slt, ddl.slt)."""
    from slt_runner import _rewrite_null_ordering as no

    assert no("select * from t order by a") == \
        "select * from t order by a NULLS LAST "
    assert no("select * from t order by a desc limit 3") == \
        "select * from t order by a desc NULLS FIRST limit 3"
    # explicit NULLS clauses are never rewritten
    assert no("select * from t order by a nulls first, b") == \
        "select * from t order by a nulls first, b NULLS LAST "
    # window-internal ORDER BY sits at depth > 0: untouched
    s = "select a, row_number() over (order by b) from t"
    assert no(s) == s
    # commas inside function args don't split the item
    assert no("select * from t order by coalesce(a, b) desc, c asc") == \
        ("select * from t order by coalesce(a, b) desc NULLS FIRST, "
         "c asc NULLS LAST ")
    # no ORDER BY: untouched
    assert no("select 1") == "select 1"


def test_slt_options_parser_unquoted_values():
    """The corpus mixes quoted and unquoted OPTIONS values
    (copy.slt: 'format.has_header' false, 'format.compression' gzip)."""
    from slt_runner import _parse_slt_options as po

    assert po("OPTIONS ('format.has_header' 'true')") == {
        "format.has_header": "true"}
    assert po("STORED AS CSV OPTIONS ('format.has_header' false, "
              "'format.compression' gzip)") == {
        "format.has_header": "false", "format.compression": "gzip"}
    assert po("OPTIONS ('format.delimiter' ';', "
              "'format.datetime_format' '%FT%H:%M:%S.%9f', "
              "'format.null_value' 'NULLVAL')") == {
        "format.delimiter": ";",
        "format.datetime_format": "%FT%H:%M:%S.%9f",
        "format.null_value": "NULLVAL"}
    assert po("no options here") == {}


def test_tdigest_port_matches_reference_goldens():
    """The df_tdigest alternative reading (family 17) is bit-exact:
    the Python port (tools/tdigest_df.py) of DataFusion's t-digest
    (functions-aggregate-common/src/tdigest.rs) reproduces the
    reference's RECORDED .slt answers on the corpus fixture —
    aggregate.slt:594-606 (approx_median over int/bigint/double) and
    aggregate.slt:1633-1645 (grouped approx_percentile_cont p95)."""
    import duckdb

    from tdigest_df import tdigest_quantile

    fixture = ("/root/reference/datafusion-greatest/datafusion/core/"
               "tests/data/aggregate_test_100_order_by_c1_asc.csv")
    if not os.path.exists(fixture):
        pytest.skip("reference fixture not present")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_csv_auto('{fixture}')")

    def col(sql):
        return [float(r[0]) for r in con.execute(sql).fetchall()]

    # evaluate()'s `q as i64` truncates toward zero = Python int() here
    assert int(tdigest_quantile(col("SELECT c2 FROM t"), 0.5)) == 3
    assert (int(tdigest_quantile(col("SELECT c6 FROM t"), 0.5))
            == 1146409980542786560)
    assert math.isclose(tdigest_quantile(col("SELECT c12 FROM t"), 0.5),
                        0.555006541052, rel_tol=1e-9)
    for g, exp in zip("abcde", (73, 68, 122, 124, 115)):
        vals = col(f"SELECT c3 FROM t WHERE c1='{g}'")
        assert int(tdigest_quantile(vals, 0.95)) == exp, g
    # NaN values digest to NaN (nulls are dropped UPSTREAM via the
    # xnull flag; a genuine NaN poisons the centroid means)
    assert math.isnan(tdigest_quantile([1.0, float("nan"), 2.0], 0.5))
    # empty input -> NULL
    assert tdigest_quantile([], 0.5) is None


def test_tracked_typeof_fold():
    """Family 18's cross-statement half: declared column types tracked
    from executed CREATEs fold later arrow_typeof reads (unsigned
    widths, arrow_cast CTAS bodies, statement-local CTE casts and
    integer-literal subqueries), through type-preserving aggregates,
    sum widening and avg→Float64. Pure rewrite logic — the live gate
    runs in test_slt_parity."""
    from slt_runner import SltRunner

    class Bare(SltRunner):
        def __init__(self):
            self._init_rewrite_state()

    r = Bare()
    r._track_decl_types("create table t (c int unsigned) as values (1)")
    assert r._decl_types == {("t", "c"): "UInt32"}
    out = r._alt_tracked_typeof(
        "Select bit_xor(DISTINCT c), arrow_typeof(bit_xor(DISTINCT c)) from t")
    assert "'UInt32'" in out and "arrow_typeof" not in out
    out = r._alt_tracked_typeof(
        "select sum(distinct c), arrow_typeof(sum(distinct c)) from t")
    assert "'UInt64'" in out
    r._track_decl_types("CREATE TABLE vd AS SELECT arrow_cast(x, "
                        "'Dictionary(Int64, Int32)') AS x_dict FROM v")
    assert r._decl_types[("vd", "x_dict")] == "Dictionary(Int64, Int32)"
    out = r._alt_tracked_typeof(
        "select arrow_typeof(lag(a) over ()) from (select 1 a)")
    assert "'Int64'" in out
    out = r._alt_tracked_typeof(
        "WITH d AS (SELECT arrow_cast(1, 'Float16') AS f) "
        "SELECT arrow_typeof(MIN(f)) FROM d")
    assert "'Float16'" in out
    r._track_decl_types("drop table t")
    assert ("t", "c") not in r._decl_types


def test_deviation_and_typing_alts():
    """Pure rewrite logic of the r6-s2 gated alternatives (live gates
    run in test_slt_parity): searched-CASE NULL-condition, NOT-IN
    null-outer, per-unit truncation, literal typing by magnitude and
    parser flag, corr zero-variance."""
    from slt_runner import SltRunner

    class Bare(SltRunner):
        def __init__(self):
            self._init_rewrite_state()

    r = Bare()
    out = r._alt_case_null_then("SELECT CASE WHEN a > 2 THEN b END FROM f")
    assert "IS NOT FALSE THEN b" in out
    out = r._alt_not_in_null_outer(
        "SELECT t1_id FROM l WHERE t1_id NOT IN (SELECT t2_id FROM r)")
    assert "t1_id IS NULL OR t1_id NOT IN" in out
    r._track_decl_types(
        "create table t as select arrow_cast(c1, "
        "'Timestamp(Millisecond, None)') as millis, arrow_cast(c1, "
        "'Timestamp(Second, None)') as secs from src")
    out = r._alt_unit_trunc("SELECT min(millis), max(secs) FROM t")
    assert "date_trunc('MILLISECOND', millis)" in out
    assert "date_trunc('SECOND', secs)" in out
    # literal typing: i64 / u64 / beyond, with and without the flag
    assert r._df_literal_type("3") == "Int64"
    assert r._df_literal_type("9223372036854775808") == "UInt64"
    assert r._df_literal_type("18446744073709551616") == "Float64"
    assert r._df_literal_type("-9223372036854775809") == "Float64"
    assert r._df_literal_type(".0") == "Float64"
    r._parse_float_as_decimal = True
    assert r._df_literal_type("18446744073709551616") == "Decimal128(20, 0)"
    assert r._df_literal_type("-9223372036854775809") == "Decimal128(19, 0)"
    assert r._df_literal_type("9223372036854775808") == "UInt64"
    assert r._df_literal_type(".0") == "Decimal128(1, 1)"
    assert r._df_literal_type("00000.00") == "Decimal128(2, 2)"
    assert (r._df_literal_type("00009999999999999999999999999999999999.9999")
            == "Decimal128(38, 4)")
    out = r._alt_corr_zero("select corr(a, b) from t")
    assert "coalesce(corr(a, b), cast(0 as double))" in out
