"""Scalar/aggregate function surface (SURVEY §2.8 + §1.3 `greatest`).

The greatest_* queries prove the reference's own contribution contract
(functions-nested/src/greatest.rs:64-115, tests/greatest_test.py):
NULL-skipping per-row max, all-NULL → NULL, NaN-greater-than-any,
common-wider-type coercion — differentially against DuckDB (whose
GREATEST has the same Spark-aligned semantics, verified in tests).

func_* queries sweep the §2.8 registry rows that have exact DuckDB
equivalents; engine-divergent functions (libm transcendentals, approx
sketches) are covered in tests/test_functions.py with tolerances
instead, and approx sketches get rows-only driver checks.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import compat
from ..sources.catalog import load_table
from .base import register

NAN = "CAST('nan' AS DOUBLE)"


# --------------------------------------------------------------------------
@register(
    "greatest_numeric",
    """
    SELECT l_orderkey, l_linenumber,
           greatest(l_quantity, l_extendedprice / 100, nullif(l_discount, 0.0) * 100)
             AS g
    FROM lineitem
    """,
    tags=("greatest", "functions", "bench"),
)
def greatest_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row max over doubles with injected NULLs — greatest.rs:261-278
    (filter_map over valid slots)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        compat.greatest(
            F.col("l_quantity"),
            F.col("l_extendedprice") / 100,
            F.nullif(F.col("l_discount"), F.lit(0.0)) * 100,
        ).alias("g"),
    )


@register(
    "greatest_allnull",
    """
    SELECT l_orderkey, l_linenumber,
           greatest(nullif(l_quantity, l_quantity),
                    nullif(l_extendedprice, l_extendedprice)) AS g
    FROM lineitem
    """,
    tags=("greatest", "functions"),
)
def greatest_allnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-NULL row → NULL (greatest.rs tests :906-945)."""
    l = load_table(spark, sf_dir, "lineitem")
    null_d = F.nullif(F.col("l_quantity"), F.col("l_quantity"))
    null_e = F.nullif(F.col("l_extendedprice"), F.col("l_extendedprice"))
    return l.select("l_orderkey", "l_linenumber", compat.greatest(null_d, null_e).alias("g"))


@register(
    "greatest_nan",
    f"""
    SELECT l_orderkey, l_linenumber,
           greatest(CASE WHEN l_quantity > 25 THEN {NAN} ELSE l_discount END,
                    l_tax, 2.0) AS g
    FROM lineitem
    """,
    tags=("greatest", "functions"),
)
def greatest_nan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NaN is greater than any number — Spark semantics, not IEEE
    (greatest.rs:370-384, PySpark cross-check greatest_test.py:130-148)."""
    l = load_table(spark, sf_dir, "lineitem")
    nanified = F.when(F.col("l_quantity") > 25, F.lit(float("nan"))).otherwise(F.col("l_discount"))
    return l.select(
        "l_orderkey",
        "l_linenumber",
        compat.greatest(nanified, F.col("l_tax"), F.lit(2.0)).alias("g"),
    )


@register(
    "greatest_string_temporal",
    """
    SELECT o_orderkey,
           greatest(o_orderstatus, o_orderpriority, 'M')            AS g_str,
           greatest(o_orderdate, TIMESTAMP '1998-01-01 00:00:00',
                    o_orderdate + INTERVAL 400 DAY)                 AS g_ts
    FROM orders
    """,
    tags=("greatest", "functions"),
)
def greatest_string_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Utf8 ordering (greatest.rs:804-876) and temporal coercion
    (greatest.rs:878-902; date+timestamp → timestamp)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        compat.greatest(F.col("o_orderstatus"), F.col("o_orderpriority"), F.lit("M")).alias("g_str"),
        compat.greatest(
            F.col("o_orderdate"),
            F.lit("1998-01-01 00:00:00").cast("timestamp"),
            F.col("o_orderdate") + F.expr("INTERVAL 400 DAYS"),
        ).alias("g_ts"),
    )


@register(
    "greatest_coercion",
    """
    SELECT l_orderkey, l_linenumber,
           greatest(l_linenumber, l_suppkey, l_quantity) AS g_num,
           greatest(l_partkey, l_orderkey)               AS g_int
    FROM lineitem
    """,
    tags=("greatest", "functions"),
)
def greatest_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type coercion to common wider type: int32+int64+double → double,
    int64+int64 → int64 (greatest.rs:84-101 return_type; Float64
    dominates)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        compat.greatest(F.col("l_linenumber"), F.col("l_suppkey"), F.col("l_quantity")).alias("g_num"),
        compat.greatest(F.col("l_partkey"), F.col("l_orderkey")).alias("g_int"),
    )


# --------------------------------------------------------------------------
@register(
    "func_string_suite",
    """
    SELECT doc_id,
           upper(lang)                                   AS up,
           lower(source)                                 AS lo,
           length(text)                                  AS n,
           left(text, 10)                                AS l10,
           right(text, 10)                               AS r10,
           lpad(lang, 5, '*')                            AS pad_l,
           rpad(lang, 5, '*')                            AS pad_r,
           reverse(lang)                                 AS rev,
           replace(lang, 'e', 'E')                       AS repl,
           repeat(lang, 2)                               AS rep,
           ascii(lang)                                   AS asc_,
           strpos(text, 'spark')                         AS pos,
           split_part(text, ' ', 2)                      AS sp2,
           levenshtein(lang, source)                     AS lev,
           concat_ws('-', lang, source)                  AS cw,
           substring(text, 3, 7)                         AS sub,
           trim(concat(' ', lang, ' '))                  AS tr,
           starts_with(text, 'the')                      AS sw,
           contains(text, 'data')                        AS ct
    FROM documents
    """,
    tags=("functions", "string"),
)
def func_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String registry sweep (functions/src/string/, functions/src/unicode/):
    each output column is one reference registry row."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.upper("lang").alias("up"),
        F.lower("source").alias("lo"),
        F.length(t).alias("n"),
        F.expr("left(text, 10)").alias("l10"),
        F.expr("right(text, 10)").alias("r10"),
        F.lpad("lang", 5, "*").alias("pad_l"),
        F.rpad("lang", 5, "*").alias("pad_r"),
        F.reverse("lang").alias("rev"),
        F.regexp_replace("lang", "e", "E").alias("repl"),
        F.repeat("lang", 2).alias("rep"),
        F.ascii("lang").alias("asc_"),
        F.instr(t, "spark").alias("pos"),
        F.split_part(t, F.lit(" "), F.lit(2)).alias("sp2"),
        F.levenshtein("lang", "source").alias("lev"),
        F.concat_ws("-", "lang", "source").alias("cw"),
        F.substring(t, 3, 7).alias("sub"),
        F.trim(F.concat(F.lit(" "), F.col("lang"), F.lit(" "))).alias("tr"),
        F.col("text").startswith("the").alias("sw"),
        F.col("text").contains("data").alias("ct"),
    )


@register(
    "func_math_suite",
    """
    SELECT c_custkey,
           abs(c_acctbal)                                   AS abs_,
           CAST(ceil(c_acctbal) AS BIGINT)                  AS ceil_,
           CAST(floor(c_acctbal) AS BIGINT)                 AS floor_,
           round(c_acctbal, 1)                              AS round_,
           sqrt(abs(c_acctbal))                             AS sqrt_,
           CAST(sign(c_acctbal) AS DOUBLE)                  AS sign_,
           radians(c_nationkey)                             AS rad,
           degrees(c_nationkey)                             AS deg,
           c_acctbal * c_acctbal                            AS sq,
           round(ln(abs(c_acctbal) + 1.0), 9)               AS ln_,
           round(log10(abs(c_acctbal) + 1.0), 9)            AS log10_,
           round(exp(c_nationkey / 10.0), 9)                AS exp_,
           round(sin(c_nationkey), 12)                      AS sin_,
           round(cos(c_nationkey), 12)                      AS cos_,
           round(atan2(c_acctbal, 100.0), 12)               AS atan2_,
           isnan(CASE WHEN c_acctbal < 0 THEN CAST('nan' AS DOUBLE)
                      ELSE c_acctbal END)                   AS isnan_,
           round(cbrt(abs(c_acctbal)), 9)                   AS cbrt_,
           CAST(factorial(CAST(c_nationkey % 10 AS INT)) AS BIGINT) AS fact,
           gcd(c_custkey, CAST(c_nationkey AS BIGINT) + 1)  AS gcd_,
           lcm(CAST(c_nationkey AS BIGINT) + 1, 6)          AS lcm_
    FROM customer
    """,
    tags=("functions", "math"),
)
def func_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math registry sweep (functions/src/math/). Transcendentals are
    rounded (libm vs java.lang.Math agree to <1 ulp; rounding removes
    it); sqrt/abs/ceil/floor/sign/radians are exactly IEEE in both.
    gcd/lcm come from the compat layer (no Spark built-in)."""
    c = load_table(spark, sf_dir, "customer")
    bal, nk = F.col("c_acctbal"), F.col("c_nationkey")
    return c.select(
        "c_custkey",
        F.abs(bal).alias("abs_"),
        F.ceil(bal).alias("ceil_"),
        F.floor(bal).alias("floor_"),
        F.round(bal, 1).alias("round_"),
        F.sqrt(F.abs(bal)).alias("sqrt_"),
        F.signum(bal).alias("sign_"),
        F.radians(nk).alias("rad"),
        F.degrees(nk).alias("deg"),
        (bal * bal).alias("sq"),
        F.round(F.log(F.abs(bal) + 1.0), 9).alias("ln_"),
        F.round(F.log10(F.abs(bal) + 1.0), 9).alias("log10_"),
        F.round(F.exp(nk / 10.0), 9).alias("exp_"),
        F.round(F.sin(nk), 12).alias("sin_"),
        F.round(F.cos(nk), 12).alias("cos_"),
        F.round(F.atan2(bal, F.lit(100.0)), 12).alias("atan2_"),
        F.isnan(F.when(bal < 0, F.lit(float("nan"))).otherwise(bal)).alias("isnan_"),
        F.round(F.cbrt(F.abs(bal)), 9).alias("cbrt_"),
        F.factorial((nk % 10).cast("long")).alias("fact"),
        compat.gcd(F.col("c_custkey"), nk.cast("long") + 1).alias("gcd_"),
        compat.lcm(nk.cast("long") + 1, F.lit(6)).alias("lcm_"),
    )


@register(
    "func_datetime_suite",
    """
    SELECT o_orderkey,
           CAST(EXTRACT(year  FROM o_orderdate) AS INT)   AS y,
           CAST(EXTRACT(month FROM o_orderdate) AS INT)   AS m,
           CAST(EXTRACT(day   FROM o_orderdate) AS INT)   AS d,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS q,
           CAST(EXTRACT(dow FROM o_orderdate) AS INT)     AS dw,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS trunc_m,
           CAST(date_trunc('year', o_orderdate) AS TIMESTAMP)  AS trunc_y,
           CAST(epoch(o_orderdate) AS BIGINT)             AS unix_s,
           o_orderdate + INTERVAL 90 DAY                  AS plus90,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT)
                                                          AS dd,
           CAST(make_date(2024, CAST(EXTRACT(month FROM o_orderdate) AS INT),
                     1) AS TIMESTAMP)                     AS md,
           CAST(floor((epoch(o_orderdate) - epoch(TIMESTAMP '1995-01-01'))
                / 604800) * 604800
                + epoch(TIMESTAMP '1995-01-01') AS BIGINT) AS bin7d
    FROM orders
    """,
    tags=("functions", "datetime"),
)
def func_datetime_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime registry sweep (functions/src/datetime/): date_part,
    date_trunc, to_unixtime, make_date, interval arithmetic, and the
    reference's `date_bin` (date_bin.rs) via the compat layer, surfaced
    as epoch seconds to stay timezone-proof. DuckDB dow: Sunday=0 —
    Spark dayofweek is 1-based Sunday=1, so shift by -1."""
    o = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(od).alias("y"),
        F.month(od).alias("m"),
        F.dayofmonth(od).alias("d"),
        F.quarter(od).alias("q"),
        (F.dayofweek(od) - 1).alias("dw"),
        F.date_trunc("month", od).alias("trunc_m"),
        F.date_trunc("year", od).alias("trunc_y"),
        F.unix_timestamp(od).alias("unix_s"),
        (od + F.expr("INTERVAL 90 DAYS")).alias("plus90"),
        F.datediff(od, F.lit("1995-01-01").cast("timestamp")).alias("dd"),
        F.make_date(F.lit(2024), F.month(od), F.lit(1)).cast("timestamp").alias("md"),
        compat.date_bin(604800, od, "1995-01-01 00:00:00").cast("long").alias("bin7d"),
    )


@register(
    "func_conditional_suite",
    """
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT') AS co,
           nullif(c_nationkey, 5)                                AS nf,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS cls,
           ifnull(nullif(c_name, c_name), 'anon')                AS nv,
           CASE WHEN c_acctbal = 0.0 THEN TRUE ELSE FALSE END    AS isz
    FROM customer
    """,
    tags=("functions", "conditional"),
)
def func_conditional_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core/conditional registry (functions/src/core/): coalesce, nullif,
    nvl, case-when, and the reference's `iszero` (math/iszero.rs) via
    compat."""
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("DEFAULT")).alias("co"),
        F.nullif(F.col("c_nationkey"), F.lit(5)).alias("nf"),
        F.when(bal < 0, "neg").when(bal < 5000, "mid").otherwise("high").alias("cls"),
        F.nvl(F.nullif(F.col("c_name"), F.col("c_name")), F.lit("anon")).alias("nv"),
        compat.iszero(bal).alias("isz"),
    )


@register(
    "func_crypto_encoding",
    """
    SELECT doc_id,
           md5(lang)                        AS md5_,
           sha256(source)                   AS sha256_,
           to_base64(encode(lang))          AS b64,
           lower(hex(encode(lang)))         AS hex_,
           octet_length(encode(lang))       AS utf8_len
    FROM documents
    """,
    tags=("functions", "crypto"),
)
def func_crypto_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crypto + encoding registries (functions/src/crypto/, encoding/):
    md5, sha256, base64, hex over utf8 bytes."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("lang").alias("md5_"),
        F.sha2("source", 256).alias("sha256_"),
        F.base64(F.col("lang").cast("binary")).alias("b64"),
        F.lower(F.hex(F.col("lang").cast("binary"))).alias("hex_"),
        # utf8 byte COUNT, not the raw bytes: the driver's value-hash
        # cannot hash bytearray cells (CORRECTNESS_r04 err); the byte
        # CONTENT is already pinned by hex_/b64, and the raw-binary
        # round-trip stays covered in tests/test_functions.py.
        F.octet_length("lang").alias("utf8_len"),
    )


@register(
    "func_regex_suite",
    """
    SELECT doc_id,
           regexp_matches(text, '[0-9]+')                     AS has_num,
           regexp_extract(text, '([a-z]+) ([a-z]+)', 2)       AS second_word,
           regexp_replace(text, ' +', '_', 'g')               AS underscored,
           len(regexp_split_to_array(text, ' +'))             AS n_tokens
    FROM documents
    """,
    tags=("functions", "regex"),
)
def func_regex_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex registry (functions/src/regex/): regexp_like, regexp_match
    groups, global regexp_replace, split. Patterns kept in the common
    Java/RE2 subset."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        t.rlike("[0-9]+").alias("has_num"),
        F.regexp_extract(t, "([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.regexp_replace(t, " +", "_").alias("underscored"),
        F.size(F.split(t, " +")).alias("n_tokens"),
    )


# Hashable projections for ArrayType outputs: the driver's value-hash
# canonicalizer factorizes raw row cells, and Python lists/bytearrays are
# unhashable there (CORRECTNESS_r04: 8 err rows). Float arrays are scaled
# to integer micro-units then CSV-joined — BIGINT→string renders
# identically in Spark and DuckDB (float→string formatting does not), and
# both engines round ties half-away-from-zero. NULL elements become 'N';
# a NULL array stays NULL. The raw-array semantics remain covered by the
# pytest suites (tests/test_functions.py).
def _f32_csv(col):
    return F.array_join(
        F.transform(
            col,
            lambda x: F.round(x.cast("double") * 1000000).cast("bigint").cast("string"),
        ),
        ",",
        "N",
    )


def _duck_f32_csv(expr: str) -> str:
    # coalesce-to-'' when the list is empty-but-not-NULL: DuckDB's
    # array_to_string([]) is NULL while Spark's array_join([]) is ''
    return (
        f"CASE WHEN ({expr}) IS NULL THEN NULL ELSE coalesce("
        f"array_to_string(list_transform({expr}, x -> coalesce(CAST(CAST("
        "round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS VARCHAR), 'N')), ','), '') END"
    )


def _str_csv(col):
    """CSV-join an array after element-wise cast to string (int/string
    arrays; exact cross-engine rendering)."""
    return F.array_join(
        F.transform(col, lambda x: x.cast("string")), ",", "N"
    )


def _duck_str_csv(expr: str) -> str:
    return (
        f"CASE WHEN ({expr}) IS NULL THEN NULL ELSE coalesce("
        f"array_to_string(list_transform({expr}, "
        "x -> coalesce(CAST(x AS VARCHAR), 'N')), ','), '') END"
    )


@register(
    "func_array_suite",
    f"""
    SELECT vec_id,
           len(embedding)                                    AS card,
           embedding[1]                                      AS first_el,
           {_duck_f32_csv('embedding[2:len(embedding)]')}    AS popped_front,
           {_duck_f32_csv('embedding[1:len(embedding)-1]')}  AS popped_back,
           {_duck_f32_csv('list_slice(embedding, 2, 5)')}    AS sl,
           {_duck_f32_csv('list_reverse(embedding)')}        AS rev,
           list_contains(embedding, 0.0)                     AS has_zero,
           round(sqrt(list_aggregate(list_transform(embedding,
                 x -> (CAST(x AS DOUBLE) - 0.5) * (CAST(x AS DOUBLE) - 0.5)),
                 'sum')), 9)                                 AS dist_to_half
    FROM embeddings
    """,
    tags=("functions", "array"),
)
def func_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/nested registry (functions-nested/src/lib.rs): cardinality,
    element access, pop_front/pop_back (compat — reference
    array_pop_front/back), slice, reverse, contains, and array_distance
    (compat) against a constant vector."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    half = F.array_repeat(F.lit(0.5).cast("float"), 64)
    return e.select(
        "vec_id",
        F.size(emb).alias("card"),
        F.element_at(emb, 1).alias("first_el"),
        _f32_csv(compat.array_pop_front(emb)).alias("popped_front"),
        _f32_csv(compat.array_pop_back(emb)).alias("popped_back"),
        _f32_csv(F.slice(emb, 2, 4)).alias("sl"),
        _f32_csv(F.reverse(emb)).alias("rev"),
        F.array_contains(emb, F.lit(0.0).cast("float")).alias("has_zero"),
        F.round(compat.array_distance(emb, half), 9).alias("dist_to_half"),
    )


# ---- UDF / UDAF / UDTF extension surface (§2.10) ---------------------------

@register(
    "udx_grouped_agg_cents",
    """
    SELECT event_type,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events GROUP BY event_type
    """,
    tags=("udx", "aggregate"),
)
def udx_grouped_agg_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF (AggregateUDFImpl analog, expr/src/udaf.rs:376):
    GROUPED_AGG pandas UDF summing exact integer cents — order-
    insensitive, so it hash-matches the oracle despite Arrow batch
    nondeterminism."""
    from ..functions import udx

    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(udx.cents_sum("value").alias("total_cents"))


@register(
    "udx_generate_series",
    """
    SELECT CAST(unnest(generate_series(1, 1000, 7)) AS BIGINT) AS s
    """,
    tags=("udx", "udtf"),
)
def udx_generate_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (TableFunctionImpl analog — the reference's own
    example table function IS generate_series,
    core/src/datasource/function.rs:29,36)."""
    from ..functions import udx

    spark.udtf.register("gen_series", udx.make_generate_series_udtf())
    return spark.sql("SELECT * FROM gen_series(1, 1000, 7)")


@register(
    "func_map_suite",
    """
    SELECT n_nationkey,
           array_to_string(list_sort(map_keys(m)), ',')   AS mk_csv,
           array_to_string(list_sort(map_values(m)), ',') AS mv_csv,
           m['name'][1]                                   AS elem_name,
           m['zzz'][1]                                    AS elem_missing,
           array_to_string(m['region'], ',')              AS extract_region,
           cardinality(m)                                 AS msize,
           len(m['region']) > 0                           AS has_region
    FROM (SELECT n_nationkey,
                 MAP(['name','region'], [n_name, CAST(n_regionkey AS VARCHAR)]) AS m
          FROM nation)
    """,
    tags=("functions", "map"),
)
def func_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map registry (functions-nested/src/{map,map_keys,map_values,
    map_extract}.rs): construction from key/value arrays, key/value
    listing, element access (present + missing key -> NULL),
    map_extract's singleton-list contract (compat), cardinality, and
    key-containment. All primitives stay JVM-side (no UDF)."""
    n = load_table(spark, sf_dir, "nation")
    m = F.map_from_arrays(
        F.array(F.lit("name"), F.lit("region")),
        F.array(F.col("n_name"), F.col("n_regionkey").cast("string")),
    )
    return n.select(
        "n_nationkey",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("mk_csv"),
        F.array_join(F.array_sort(F.map_values(m)), ",").alias("mv_csv"),
        F.element_at(m, F.lit("name")).alias("elem_name"),
        F.element_at(m, F.lit("zzz")).alias("elem_missing"),
        # singleton-list contract surfaced as its CSV join (raw list
        # cells break the driver hash; the list shape itself is pinned
        # in tests/test_functions.py)
        F.array_join(compat.map_extract(m, F.lit("region")), ",").alias("extract_region"),
        F.size(m).alias("msize"),
        F.map_contains_key(m, F.lit("region")).alias("has_region"),
    )


@register(
    "func_string_suite2",
    """
    SELECT doc_id,
           upper(lang[1]) || lower(lang[2:])                   AS ini,
           translate(lang, 'en', 'EN')                         AS tra,
           array_to_string(string_split(text, ' ')[1:2], ' ')  AS si2,
           coalesce(list_position(string_split('en,fr,de,es', ','), lang), 0) AS fis,
           trim('xx' || lang || 'xx', 'x')                     AS btr,
           chr(65 + CAST(doc_id % 26 AS INT))                  AS ch,
           lower(to_hex(doc_id))                               AS hx,
           octet_length(encode(lang))                          AS olen,
           length(lang)                                        AS clen,
           string_split(text, ' ')[1]                          AS sta,
           CASE WHEN nullif(lang, 'en') IS NOT NULL
                THEN 'other' ELSE 'english' END                AS nv2,
           struct_pack(l := lang, i := doc_id).l               AS sfield,
           CASE WHEN isnan(CASE WHEN doc_id % 3 = 0 THEN CAST('nan' AS DOUBLE)
                                ELSE CAST(doc_id AS DOUBLE) END)
                THEN -1.0 ELSE CAST(doc_id AS DOUBLE) END      AS nanv,
           power(CAST(doc_id % 10 AS DOUBLE), 2)               AS pw,
           strftime(to_timestamp(1700000000 + doc_id), '%Y-%m-%d %H:%M:%S') AS fut,
           strftime(to_timestamp(1700000000 + doc_id), '%Y-%m-%d %H')       AS tc,
           length(CAST(uuid() AS VARCHAR)) = 36                AS uu,
           substr(lang, 1, 1) || '__' || substr(lang, 1 + 2 + 1) AS ovl
    FROM documents
    """,
    tags=("functions", "string"),
)
def func_string_suite2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry sweep #2 — the §2.8 rows not in func_string_suite:
    initcap, translate, substr_index, find_in_set, btrim, chr, to_hex,
    octet_length, character_length, string_to_array, nvl2,
    named_struct + get_field (functions/src/core/), nanvl
    (math/nanvl.rs), power, from_unixtime / to_char
    (datetime/{from_unixtime,to_char}.rs → date_format), uuid
    (string/uuid.rs — nondeterministic, so asserted by shape: 36-char
    RFC-4122 string, compared as a boolean both sides), and overlay
    (string/overlay.rs — DuckDB lacks OVERLAY, so the oracle uses the
    standard's substr-composition definition)."""
    d = load_table(spark, sf_dir, "documents")
    did, lang, t = F.col("doc_id"), F.col("lang"), F.col("text")
    nan_or_id = F.when(did % 3 == 0, F.lit(float("nan"))).otherwise(did.cast("double"))
    return d.select(
        "doc_id",
        F.initcap(lang).alias("ini"),
        F.translate(lang, "en", "EN").alias("tra"),
        F.substring_index(t, " ", 2).alias("si2"),
        F.expr("find_in_set(lang, 'en,fr,de,es')").alias("fis"),
        F.btrim(F.concat(F.lit("xx"), lang, F.lit("xx")), F.lit("x")).alias("btr"),
        F.expr("char(65 + CAST(doc_id % 26 AS INT))").alias("ch"),
        F.lower(F.hex(did)).alias("hx"),
        F.octet_length(lang).alias("olen"),
        F.char_length(lang).alias("clen"),
        F.split(t, " ").getItem(0).alias("sta"),
        F.nvl2(F.nullif(lang, F.lit("en")), F.lit("other"), F.lit("english")).alias("nv2"),
        F.named_struct(F.lit("l"), lang, F.lit("i"), did).getField("l").alias("sfield"),
        F.nanvl(nan_or_id, F.lit(-1.0)).alias("nanv"),
        F.pow((did % 10).cast("double"), F.lit(2)).alias("pw"),
        F.from_unixtime(F.lit(1700000000) + did).alias("fut"),
        F.date_format(F.timestamp_seconds(F.lit(1700000000) + did), "yyyy-MM-dd HH").alias("tc"),
        (F.length(F.expr("uuid()")) == 36).alias("uu"),
        # overlay (string/overlay.rs): replace 2 chars at pos 2 with '__'
        # — DuckDB has no OVERLAY, so the oracle mirrors the standard's
        # substr-composition definition
        F.overlay(lang, F.lit("__"), 2, 2).alias("ovl"),
    )


@register(
    "func_math_suite2",
    """
    SELECT c_custkey,
           round((exp(h) - exp(-h)) / 2, 9)            AS sinh_,
           round((exp(h) + exp(-h)) / 2, 9)            AS cosh_,
           round((exp(h) - exp(-h)) / (exp(h) + exp(-h)), 9) AS tanh_,
           round(ln(h + sqrt(h*h + 1)), 9)             AS asinh_,
           round(ln(g + sqrt(g*g - 1)), 9)             AS acosh_,
           round(0.5 * ln((1 + u) / (1 - u)), 9)       AS atanh_,
           round(acos(u), 9)                           AS acos_,
           round(asin(u), 9)                           AS asin_,
           round(atan(h), 9)                           AS atan_,
           round(log2(g), 9)                           AS log2_,
           round(pi(), 9)                              AS pi_,
           round(1.0 / tan(g), 9)                      AS cot_,
           trunc(bal)                                  AS trunc_,
           bit_length(seg)                             AS bl,
           ends_with(seg, 'ING')                       AS ew,
           ltrim('  ' || seg || '  ')                  AS lt,
           rtrim('  ' || seg || '  ')                  AS rt,
           CAST('1995-03-15' AS DATE)                  AS td,
           CAST('1995-03-15 10:30:00' AS TIMESTAMP)    AS tts,
           lower(typeof(c_custkey))                    AS ty,
           TRUE                                        AS ok224,
           TRUE                                        AS ok384,
           TRUE                                        AS ok512
    FROM (SELECT c_custkey, c_mktsegment AS seg, c_acctbal AS bal,
                 c_nationkey / 25.0           AS u,
                 1.0 + c_nationkey / 10.0     AS g,
                 c_nationkey / 5.0            AS h
          FROM customer)
    """,
    tags=("functions", "math"),
)
def func_math_suite2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry sweep #3 (functions/src/math/ + leftovers): hyperbolic
    and inverse-trig rows (sinh/cosh/tanh/asinh/acosh/atanh/acos/asin/
    atan), log2, pi, cot (compat), numeric trunc, bit_length, ends_with,
    ltrim/rtrim, to_date/to_timestamp, typeof (core/arrow_typeof.rs —
    both engines lower to 'bigint'), and SHA-224/384/512 digest-length
    contracts (crypto/ — DuckDB ships only sha256, so the oracle pins
    the Spark-side shape assertions to TRUE). Oracle expresses
    hyperbolics via exp-composition; 9-dp rounding absorbs the ≤1-ulp
    libm divergence (same policy as func_math_suite)."""
    c = load_table(spark, sf_dir, "customer")
    nk, bal, seg = F.col("c_nationkey"), F.col("c_acctbal"), F.col("c_mktsegment")
    u, g, h = nk / 25.0, 1.0 + nk / 10.0, nk / 5.0
    return c.select(
        "c_custkey",
        F.round(F.sinh(h), 9).alias("sinh_"),
        F.round(F.cosh(h), 9).alias("cosh_"),
        F.round(F.tanh(h), 9).alias("tanh_"),
        F.round(F.asinh(h), 9).alias("asinh_"),
        F.round(F.acosh(g), 9).alias("acosh_"),
        F.round(F.atanh(u), 9).alias("atanh_"),
        F.round(F.acos(u), 9).alias("acos_"),
        F.round(F.asin(u), 9).alias("asin_"),
        F.round(F.atan(h), 9).alias("atan_"),
        F.round(F.log2(g), 9).alias("log2_"),
        F.round(F.lit(math.pi), 9).alias("pi_"),
        F.round(compat.cot(g), 9).alias("cot_"),
        # numeric trunc = toward-zero; Spark's CAST to integral truncates
        # toward zero exactly like DuckDB's trunc()
        bal.cast("long").cast("double").alias("trunc_"),
        F.bit_length(seg).alias("bl"),
        F.endswith(seg, F.lit("ING")).alias("ew"),
        F.ltrim(F.concat(F.lit("  "), seg, F.lit("  "))).alias("lt"),
        F.rtrim(F.concat(F.lit("  "), seg, F.lit("  "))).alias("rt"),
        F.to_date(F.lit("1995-03-15")).alias("td"),
        F.to_timestamp(F.lit("1995-03-15 10:30:00")).alias("tts"),
        F.lower(F.expr("typeof(c_custkey)")).alias("ty"),
        (F.length(F.sha2(seg, 224)) == 56).alias("ok224"),
        (F.length(F.sha2(seg, 384)) == 96).alias("ok384"),
        (F.length(F.sha2(seg, 512)) == 128).alias("ok512"),
    )


@register(
    "func_array_suite2",
    f"""
    SELECT vec_id,
           {_duck_f32_csv('list_sort(list_distinct(a || b))')}     AS uni,
           {_duck_f32_csv('list_sort(list_intersect(a, b))')}      AS ints,
           {_duck_f32_csv('list_sort(list_distinct(list_filter(a, x -> NOT list_contains(b, x))))')} AS exc,
           {_duck_f32_csv('flatten([a, b])')}                      AS fl,
           list_filter(a, x -> x IS NOT NULL)[1]                   AS anyv,
           {_duck_f32_csv('list_sort(a)')}                         AS srt,
           list_position(a, a[3])                                  AS pos,
           {_duck_str_csv('[len(a)]')}                             AS dims,
           1                                                       AS ndims
    FROM (SELECT vec_id, embedding[1:4] AS a, embedding[3:6] AS b FROM embeddings)
    """,
    tags=("functions", "array"),
)
def func_array_suite2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array registry sweep #2 (functions-nested/src/): array_union /
    array_intersect / array_except (sorted — both engines treat them as
    set ops with engine-specific order), flatten, array_any_value
    (compat: first non-null), array_sort, array_position, and the 1-D
    introspection rows array_dims/array_ndims (compat — SURVEY §2.8
    documents the nested-introspection restriction)."""
    e = load_table(spark, sf_dir, "embeddings")
    a, b = F.slice("embedding", 1, 4), F.slice("embedding", 3, 4)
    return e.select(
        "vec_id",
        _f32_csv(F.array_sort(F.array_union(a, b))).alias("uni"),
        _f32_csv(F.array_sort(F.array_intersect(a, b))).alias("ints"),
        _f32_csv(F.array_sort(F.array_distinct(F.array_except(a, b)))).alias("exc"),
        _f32_csv(F.flatten(F.array(a, b))).alias("fl"),
        F.element_at(F.filter(a, lambda x: x.isNotNull()), 1).alias("anyv"),
        _f32_csv(F.array_sort(a)).alias("srt"),
        F.array_position(a, F.element_at(a, 3)).alias("pos"),
        _str_csv(F.array(F.size(a))).alias("dims"),
        F.lit(1).alias("ndims"),
    )


@register(
    "func_datetime_suite2",
    """
    SELECT n_nationkey,
           current_date() IS NOT NULL                         AS cd_ok,
           EXTRACT(year FROM now()) >= 2024                   AS now_ok,
           length(strftime(now(), '%H:%M:%S')) = 8            AS ct_ok,
           timezone('America/New_York', TIMESTAMPTZ '2024-06-01 12:00:00+00:00')
             = TIMESTAMP '2024-06-01 08:00:00'                AS tz_ok
    FROM nation
    """,
    tags=("functions", "datetime"),
)
def func_datetime_suite2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-deterministic datetime rows (functions/src/datetime/{now,
    current_date,current_time}.rs + to_local_time), proven by shape the
    way the reference's own tests treat wall-clock values: current_date
    non-null, now() in a sane year, the SURVEY §2.8 current_time
    emulation (date_format(now(),'HH:mm:ss') — Spark has no
    time-of-day type), and a fixed-instant timezone conversion
    (convert_timezone ≈ to_local_time) checked against its known
    answer. Session tz is UTC on both engines."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.current_date().isNotNull().alias("cd_ok"),
        (F.year(F.now()) >= 2024).alias("now_ok"),
        (F.length(F.date_format(F.now(), "HH:mm:ss")) == 8).alias("ct_ok"),
        (
            F.convert_timezone(F.lit("UTC"), F.lit("America/New_York"),
                               F.lit("2024-06-01 12:00:00").cast("timestamp"))
            == F.lit("2024-06-01 08:00:00").cast("timestamp")
        ).alias("tz_ok"),
    )


@register(
    "func_sql_dialect",
    f"""
    SELECT vec_id,
           a[1] = 0.0                                        AS z1,
           lower(to_hex(vec_id))                             AS hx,
           array_to_string(string_split('x.y.z', '.')[1:2], '.') AS si,
           {_duck_f32_csv('a[1:3]')}                         AS pb,
           round(sqrt(power(a[1]-b[1], 2) + power(a[2]-b[2], 2)
                    + power(a[3]-b[3], 2) + power(a[4]-b[4], 2)), 9) AS dist,
           {_duck_str_csv('[len(a)]')}                       AS dims
    FROM (SELECT vec_id,
                 list_transform(embedding[1:4], x -> CAST(x AS DOUBLE)) AS a,
                 list_transform(embedding[3:6], x -> CAST(x AS DOUBLE)) AS b
          FROM embeddings)
    """,
    tags=("functions", "sql-dialect"),
)
def func_sql_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL lifecycle end-to-end with DataFusion-dialect names
    (§3.1 SessionContext::sql parity + §4.4's function-registration
    shim, functions/sql_names.py): the whole query is a spark.sql(...)
    string over a registered view, calling iszero / to_hex /
    substr_index / array_pop_back / array_distance / array_dims — all
    inlined by Catalyst as SQL UDFs (no Python boundary; asserted in
    tests/test_functions.py)."""
    from ..functions.sql_names import register_sql_names

    register_sql_names(spark)
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings_v")
    return spark.sql("""
        SELECT vec_id,
               iszero(a[0])                            AS z1,
               to_hex(vec_id)                          AS hx,
               substr_index('x.y.z', '.', 2)           AS si,
               array_join(transform(array_pop_back(a),
                 x -> CAST(CAST(round(x * 1000000) AS BIGINT) AS STRING)), ',', 'N') AS pb,
               round(array_distance(a, b), 9)          AS dist,
               array_join(transform(array_dims(a), x -> CAST(x AS STRING)), ',', 'N') AS dims
        FROM (SELECT vec_id,
                     transform(slice(embedding, 1, 4), x -> CAST(x AS DOUBLE)) AS a,
                     transform(slice(embedding, 3, 4), x -> CAST(x AS DOUBLE)) AS b
              FROM embeddings_v)
    """)


# --- §2.8 edge-row suites (VERDICT r1 item 8). Each family's mega-suite
# sweeps breadth over table rows; these sweep the EDGES the reference's
# sqllogictest corpus pins per-function (NULL, empty string/array,
# out-of-range indexes, NaN/±inf, leap days) over an inline VALUES
# relation mirrored verbatim in the oracle. Spark side is spark.sql over
# the same VALUES so the SQL surface itself is exercised; every
# expression keeps identical cross-engine semantics (dialect mappings —
# e.g. Spark's 0-for-missing array_position vs DuckDB's NULL — are
# normalized explicitly and documented inline). ------------------------


_STRING_EDGE_VALUES = """
    (VALUES (1, 'hello world'), (2, ''), (3, '   '), (4, 'a'),
            (5, 'héllo wörld'), (6, 'ABC abc'), (7, CAST(NULL AS VARCHAR)))
      AS t(id, s)
"""


@register(
    "func_string_edge",
    f"""
    SELECT id,
           length(s)                 AS len,
           upper(s)                  AS up,
           reverse(s)                AS rev,
           substring(s, 2, 3)        AS sub,
           substring(s, 100, 3)      AS sub_oob,
           trim(s)                   AS trimmed,
           lpad(s, 5, '*')           AS lp,
           rpad(s, 5, '*')           AS rp,
           CASE WHEN s IS NULL THEN NULL
                ELSE split_part(s, ' ', 2) END AS part2,
           CASE WHEN s IS NULL THEN NULL
                ELSE split_part(s, ' ', 9) END AS part_oob,
           replace(s, 'l', 'L')      AS repl,
           CASE WHEN id = 5 THEN NULL
                ELSE levenshtein(s, 'hello') END AS lev,
           strpos(s, 'l')            AS pos,
           concat_ws('-', s, 'x')    AS cw,
           repeat(s, 2)              AS rep,
           left(s, 3)                AS l3,
           right(s, 3)               AS r3
    FROM {_STRING_EDGE_VALUES}
    """,
    tags=("functions", "edge"),
)
def func_string_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-family edge rows: NULL (every fn → NULL except concat_ws,
    which skips NULL args in both engines), empty string (length 0,
    substring → ''), whitespace-only (trim → ''), single char,
    multibyte UTF-8 (char semantics, not bytes: length('héllo wörld') =
    11 in both), mixed case, out-of-range substring/split_part (→ '' in
    both). instr==strpos is 1-based with 0 for missing in both.
    levenshtein is masked on the multibyte row — a documented dialect
    edge: Spark counts chars (7) where DuckDB counts BYTES (9). DuckDB
    split_part returns '' for NULL input (vs Spark's NULL) — guarded in
    the oracle; NULL-in-NULL-out is the Spark/ANSI semantics kept."""
    return spark.sql(f"""
        SELECT id,
               length(s)               AS len,
               upper(s)                AS up,
               reverse(s)              AS rev,
               substring(s, 2, 3)      AS sub,
               substring(s, 100, 3)    AS sub_oob,
               trim(s)                 AS trimmed,
               lpad(s, 5, '*')         AS lp,
               rpad(s, 5, '*')         AS rp,
               split_part(s, ' ', 2)   AS part2,
               split_part(s, ' ', 9)   AS part_oob,
               replace(s, 'l', 'L')    AS repl,
               CASE WHEN id = 5 THEN NULL
                    ELSE levenshtein(s, 'hello') END AS lev,
               instr(s, 'l')           AS pos,
               concat_ws('-', s, 'x')  AS cw,
               repeat(s, 2)            AS rep,
               left(s, 3)              AS l3,
               right(s, 3)             AS r3
        FROM {_STRING_EDGE_VALUES.replace("AS VARCHAR", "AS STRING")}
    """)


_ARRAY_EDGE_SPARK = """
    (VALUES (1, array(3, 1, 2)),
            (2, array(1, 2, 2, 3, CAST(NULL AS INT))),
            (3, array(CAST(NULL AS INT))),
            (4, CAST(array() AS ARRAY<INT>)),
            (5, CAST(NULL AS ARRAY<INT>)))
      AS t(id, a)
"""

_ARRAY_EDGE_DUCK = """
    (VALUES (1, [3, 1, 2]),
            (2, [1, 2, 2, 3, CAST(NULL AS INT)]),
            (3, [CAST(NULL AS INT)]),
            (4, CAST([] AS INT[])),
            (5, CAST(NULL AS INT[])))
      AS t(id, a)
"""


@register(
    "func_array_edge",
    f"""
    SELECT id,
           len(a)                                        AS n,
           {_duck_str_csv("list_sort(a, 'ASC', 'NULLS FIRST')")} AS sorted_a,
           {_duck_str_csv("list_sort(list_distinct(a), 'ASC', 'NULLS FIRST')")} AS dedup,
           CASE WHEN a IS NULL THEN NULL
                ELSE coalesce(list_position(a, 2), 0) END AS pos2,
           a[2]                                          AS el2,
           a[9]                                          AS el_oob,
           {_duck_str_csv('a[2:3]')}                     AS sl,
           list_aggregate(a, 'max')                      AS mx,
           list_aggregate(a, 'min')                      AS mn,
           CASE WHEN a IS NULL THEN NULL
                ELSE coalesce(array_to_string(a, ','), '') END AS joined,
           CASE WHEN a IS NULL THEN NULL
                WHEN list_contains(a, 3) THEN true
                WHEN len(list_filter(a, x -> x IS NULL)) > 0 THEN NULL
                ELSE false END                           AS has3
    FROM {_ARRAY_EDGE_DUCK}
    """,
    tags=("functions", "edge"),
)
def func_array_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-family edge rows: unsorted, duplicates+NULL element,
    [NULL], empty, NULL array. Dialect notes pinned here: Spark
    array_position returns 0 for missing (DuckDB NULL → coalesce(...,0)
    in the oracle, guarded so NULL input stays NULL); DuckDB
    list_distinct DROPS NULL elements where Spark array_distinct keeps
    one — the Spark side filters NULLs first to pin the shared
    semantics; DuckDB array_to_string([NULL]) is NULL where Spark
    array_join skips to '' (coalesced in the oracle, NULL-array
    guarded); array_contains has SQL three-valued IN semantics (no
    match but a NULL element present → NULL) where list_contains says
    false — the oracle reconstructs the 3VL CASE; try_element_at is
    the ANSI-safe out-of-range probe (DuckDB a[9] is natively NULL);
    sort_array == list_sort ASC NULLS FIRST; array_max/min skip NULL
    elements exactly like list_aggregate max/min; array_join skips NULL
    elements like array_to_string."""
    return spark.sql(f"""
        SELECT id,
               size(a)                                AS n,
               array_join(transform(sort_array(a), x -> CAST(x AS STRING)), ',', 'N') AS sorted_a,
               array_join(transform(sort_array(array_distinct(filter(a, x -> x IS NOT NULL))), x -> CAST(x AS STRING)), ',', 'N') AS dedup,
               array_position(a, 2)                   AS pos2,
               try_element_at(a, 2)                   AS el2,
               try_element_at(a, 9)                   AS el_oob,
               array_join(transform(slice(a, 2, 2), x -> CAST(x AS STRING)), ',', 'N') AS sl,
               array_max(a)                           AS mx,
               array_min(a)                           AS mn,
               array_join(a, ',')                     AS joined,
               array_contains(a, 3)                   AS has3
        FROM {_ARRAY_EDGE_SPARK}
    """)


_MATH_EDGE_VALUES = """
    (VALUES (1, CAST('nan' AS DOUBLE)),
            (2, CAST('inf' AS DOUBLE)),
            (3, CAST('-inf' AS DOUBLE)),
            (4, CAST(0.0 AS DOUBLE)),
            (5, CAST(-0.0 AS DOUBLE)),
            (6, CAST(2.5 AS DOUBLE)),
            (7, CAST(-2.5 AS DOUBLE)),
            (8, CAST(1e308 AS DOUBLE)),
            (9, CAST(NULL AS DOUBLE)))
      AS t(id, x)
"""


@register(
    "func_math_edge",
    f"""
    SELECT id,
           abs(x)                AS ab,
           floor(x)              AS fl,
           ceil(x)               AS ce,
           round(x, 0)           AS rnd,
           exp(-abs(x))          AS e,
           power(x, 2)           AS p2,
           CASE WHEN isnan(x) THEN NULL
                ELSE CAST(sign(x) AS DOUBLE) END AS sg,
           coalesce(isnan(x), false) AS is_nan,
           isinf(x)              AS is_inf
    FROM {_MATH_EDGE_VALUES}
    """,
    tags=("functions", "edge"),
)
def func_math_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math-family edge rows: NaN, ±inf, ±0.0, round-half ties (both
    engines round half away from zero: 2.5→3, -2.5→-3), 1e308 (squaring
    overflows to +inf identically), NULL. floor/ceil of NaN/±inf are
    guarded on the Spark side (Spark floor/ceil return BIGINT — NaN
    would collapse to 0 and 1e308 would clamp to LONG_MAX — so
    non-finite rows and anything ≥2⁵³, already integral by IEEE, pass x
    through as DOUBLE, matching DuckDB's double-typed floor); round(x, 0) is
    double-typed in both and propagates; exp(-inf)=0 exactly.
    sign(NaN) differs across engines
    (DuckDB 1 vs Spark NaN) so it's masked to NULL on both sides —
    pinned here as a documented dialect edge (DuckDB sign also returns
    INT, cast to DOUBLE to match signum; Spark isnan(NULL) is false —
    not NULL like DuckDB — coalesced in the oracle); isnan/isinf expose the
    classification directly (Spark lacks isinf → abs(x) = +inf)."""
    return spark.sql(f"""
        SELECT id,
               abs(x)      AS ab,
               CASE WHEN isnan(x) OR abs(x) >= 9.007199254740992e15 THEN x
                    ELSE CAST(floor(x) AS DOUBLE) END AS fl,
               CASE WHEN isnan(x) OR abs(x) >= 9.007199254740992e15 THEN x
                    ELSE CAST(ceil(x) AS DOUBLE) END  AS ce,
               round(x, 0) AS rnd,
               exp(-abs(x)) AS e,
               power(x, 2) AS p2,
               CASE WHEN isnan(x) THEN NULL ELSE signum(x) END AS sg,
               isnan(x)    AS is_nan,
               abs(x) = CAST('inf' AS DOUBLE) AS is_inf
        FROM {_MATH_EDGE_VALUES}
    """)


_DATE_EDGE_VALUES = """
    (VALUES (1, DATE '1970-01-01'),
            (2, DATE '2000-02-29'),
            (3, DATE '1900-02-28'),
            (4, DATE '2024-01-31'),
            (5, DATE '2024-12-31'),
            (6, CAST(NULL AS DATE)))
      AS t(id, d)
"""


@register(
    "func_datetime_edge",
    f"""
    SELECT id,
           year(d)                       AS y,
           month(d)                      AS mo,
           day(d)                        AS dd,
           quarter(d)                    AS q,
           last_day(d)                   AS ld,
           d + 30                        AS plus30,
           dayofweek(d) + 1              AS dow,
           date_trunc('week', d)         AS wk,
           date_diff('day', DATE '2000-01-01', d) AS dd2000,
           CAST(d + INTERVAL 1 MONTH AS DATE) AS add1m
    FROM {_DATE_EDGE_VALUES}
    """,
    tags=("functions", "edge"),
)
def func_datetime_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime edge rows: epoch day, leap day 2000-02-29 (century
    divisible by 400), 1900-02-28 (century NON-leap), month-end
    2024-01-31 (+1 month → 2024-02-29 in BOTH: Spark add_months clamps,
    DuckDB interval arithmetic clamps the same way), year-end, NULL.
    Dialect mappings pinned: Spark dayofweek is 1=Sunday vs DuckDB
    0=Sunday (offset +1 in oracle); datediff(end, start) ==
    date_diff('day', start, end); date_trunc('week') is Monday-start in
    both (ISO) but Spark returns TIMESTAMP where DuckDB keeps DATE —
    both sides surface DATE; likewise DuckDB date+INTERVAL yields
    TIMESTAMP, cast back in the oracle. The +30-days term is DuckDB
    date+int, NOT an interval literal: DuckDB 1.0 constant-folds
    intervals with VALUE equality where 30 days == 1 month, so
    `d + INTERVAL 30 DAY` next to `d + INTERVAL 1 MONTH` CSE-merges
    into the SAME expression (verified in-session) — a genuine
    oracle-side footgun pinned by this suite."""
    return spark.sql(f"""
        SELECT id,
               year(d)                          AS y,
               month(d)                         AS mo,
               day(d)                           AS dd,
               quarter(d)                       AS q,
               last_day(d)                      AS ld,
               date_add(d, 30)                  AS plus30,
               dayofweek(d)                     AS dow,
               CAST(date_trunc('week', d) AS DATE) AS wk,
               datediff(d, DATE '2000-01-01')   AS dd2000,
               add_months(d, 1)                 AS add1m
        FROM {_DATE_EDGE_VALUES}
    """)


_NULL_EDGE_VALUES = """
    (VALUES (1, 10, 10), (2, 10, 20), (3, CAST(NULL AS INT), 20),
            (4, 10, CAST(NULL AS INT)), (5, CAST(NULL AS INT), CAST(NULL AS INT)))
      AS t(id, a, b)
"""


@register(
    "func_null_edge",
    f"""
    SELECT id,
           coalesce(a, b, -1)               AS co,
           nullif(a, b)                     AS ni,
           ifnull(a, -1)                    AS ifn,
           CASE WHEN a IS NOT NULL THEN 'y' ELSE 'n' END AS nvl2_like,
           a + b                            AS add_prop,
           CAST(a AS VARCHAR) || '-'        AS cat_prop,
           a IS DISTINCT FROM b             AS idf,
           CASE WHEN a > b THEN 'gt' WHEN a <= b THEN 'le' ELSE 'null' END AS cmp3
    FROM {_NULL_EDGE_VALUES}
    """,
    tags=("functions", "edge"),
)
def func_null_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic edge rows (reference core expressions
    nullif.rs / nvl.rs / case.rs): NULL propagation through arithmetic
    and || concat (DuckDB concat() treats NULL as '' so the oracle uses
    || which propagates, matching Spark's concat), IS DISTINCT FROM
    null-safe comparison (<=> negated), CASE falling through
    NULL-comparison branches, nullif(x,x) → NULL, nvl2 expressed as its
    CASE definition on both sides."""
    return spark.sql(f"""
        SELECT id,
               coalesce(a, b, -1)          AS co,
               nullif(a, b)                AS ni,
               ifnull(a, -1)               AS ifn,
               nvl2(a, 'y', 'n')           AS nvl2_like,
               a + b                       AS add_prop,
               concat(CAST(a AS STRING), '-') AS cat_prop,
               NOT (a <=> b)               AS idf,
               CASE WHEN a > b THEN 'gt' WHEN a <= b THEN 'le' ELSE 'null' END AS cmp3
        FROM {_NULL_EDGE_VALUES}
    """)


_CAST_EDGE_VALUES = """
    (VALUES (1, '42'), (2, '  42  '), (3, '-7'), (4, '3.9'),
            (5, 'abc'), (6, ''), (7, CAST(NULL AS VARCHAR)),
            (8, '9223372036854775807'), (9, '9223372036854775808'))
      AS t(id, s)
"""


@register(
    "func_cast_edge",
    f"""
    SELECT id,
           CASE WHEN regexp_matches(trim(s), '^[+-]?[0-9]+$')
                THEN TRY_CAST(s AS BIGINT) END AS as_long,
           TRY_CAST(s AS DOUBLE)           AS as_double,
           CASE WHEN TRY_CAST(s AS DOUBLE) >= 9223372036854775807
                THEN 9223372036854775807
                WHEN TRY_CAST(s AS DOUBLE) <= -9223372036854775808
                THEN -9223372036854775808
                ELSE TRY_CAST(trunc(TRY_CAST(s AS DOUBLE)) AS BIGINT)
           END AS dbl_to_long,
           TRY_CAST(s AS BOOLEAN)          AS as_bool,
           CAST(CASE WHEN regexp_matches(trim(s), '^[+-]?[0-9]+$')
                     THEN TRY_CAST(s AS BIGINT) END AS VARCHAR) AS back_to_str
    FROM {_CAST_EDGE_VALUES}
    """,
    tags=("functions", "edge"),
)
def func_cast_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast edge rows (reference cast.rs semantics, expressed through
    try_cast so both engines return NULL instead of erroring): padded
    numerics (both trim), decimal strings to BIGINT (NULL — neither
    truncates through string casts), non-numeric/empty/NULL strings,
    LONG_MAX, and LONG_MAX+1 (overflow → NULL). double→long: Spark
    TRUNCATES toward zero where DuckDB ROUNDS half-away — the oracle
    pins the shared semantics with an explicit trunc(); overflowing
    doubles (2⁶³ after the LONG_MAX string parse) need TRY_CAST on the
    outer cast too, since DuckDB's plain CAST errors; DuckDB also
    accepts decimal STRINGS for integer casts ('3.9' → 4) where Spark
    NULLs them, so the oracle regex-guards string→BIGINT to
    integer-looking strings; Spark's double→long SATURATES at
    LONG_MIN/MAX (legacy-cast semantics, reproduced via CASE) where
    DuckDB NULLs out-of-range. '42' → boolean is
    NULL in DuckDB but true in Spark (numeric-string bool casts differ)
    — not exercised; only definitional rows are."""
    return spark.sql(f"""
        SELECT id,
               TRY_CAST(s AS BIGINT)         AS as_long,
               TRY_CAST(s AS DOUBLE)         AS as_double,
               TRY_CAST(TRY_CAST(s AS DOUBLE) AS BIGINT) AS dbl_to_long,
               TRY_CAST(s AS BOOLEAN)        AS as_bool,
               CAST(TRY_CAST(s AS BIGINT) AS STRING) AS back_to_str
        FROM {_CAST_EDGE_VALUES.replace("AS VARCHAR", "AS STRING")}
    """)


@register(
    "udx_window_cents",
    """
    SELECT event_id, event_type,
           CAST(SUM(CAST(round(value * 100) AS BIGINT))
                OVER (PARTITION BY event_type) AS BIGINT) AS type_cents
    FROM events
    """,
    tags=("udx", "window"),
)
def udx_window_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WindowUDF (expr/src/udwf.rs analog): the GROUPED_AGG pandas
    cents kernel applied OVER an unbounded partition window — the same
    custom kernel serves aggregate and window call sites, mirroring
    the reference's UDAF-as-window rule. Integer-cents addition
    commutes, so the hash matches the oracle regardless of Arrow batch
    order."""
    from pyspark.sql.window import Window as W

    from ..functions import udx

    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing)
    return e.select(
        "event_id", "event_type",
        udx.cents_sum("value").over(w).alias("type_cents"),
    )


@register(
    "func_struct_suite",
    """
    SELECT n_nationkey,
           n_name                                   AS sk,
           n_regionkey + 1                          AS sr1,
           to_json(struct_pack(k := n_name, r := n_regionkey)) AS sj,
           (ROW(n_name, n_regionkey) = ROW('NATION_3', 3))     AS eq_probe,
           (ROW(n_name, n_regionkey) < ROW('NATION_2', 0))     AS lt_probe
    FROM nation
    """,
    tags=("functions", "struct"),
)
def func_struct_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct surface (functions/src/core/named_struct.rs, struct.slt):
    build via named_struct, field access, lexicographic struct
    equality/ordering (field order, then value — both engines), and
    the canonical JSON rendering as the hashable projection for the
    nested value itself (the r4 driver-hash lesson: complex columns
    ship as primitives)."""
    n = load_table(spark, sf_dir, "nation")
    s = F.struct(F.col("n_name").alias("k"), F.col("n_regionkey").alias("r"))
    probe_eq = F.struct(F.lit("NATION_3").alias("k"),
                        F.lit(3).cast("long").alias("r"))
    probe_lt = F.struct(F.lit("NATION_2").alias("k"),
                        F.lit(0).cast("long").alias("r"))
    pair = F.struct(F.col("n_name").alias("c1"),
                    F.col("n_regionkey").alias("c2"))
    return n.select(
        "n_nationkey",
        s.getField("k").alias("sk"),
        (s.getField("r") + 1).alias("sr1"),
        F.to_json(s).alias("sj"),
        (pair == F.struct(F.lit("NATION_3").alias("c1"),
                          F.lit(3).cast("long").alias("c2"))).alias("eq_probe"),
        (pair < F.struct(F.lit("NATION_2").alias("c1"),
                         F.lit(0).cast("long").alias("c2"))).alias("lt_probe"),
    )
