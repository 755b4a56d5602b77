"""SQL-dialect shim: DataFusion-only function names callable from
`spark.sql(...)`.

SURVEY §4.4 verdict: no custom Catalyst rule is needed for parity — the
only dialect work is "a thin function-registration shim" for the §2.8
registry rows whose names Spark SQL lacks. Spark 4's SQL UDFs
(`CREATE TEMPORARY FUNCTION ... RETURNS ... RETURN <expr>`) are the
right tool: the body is an expression, so Catalyst inlines it into the
plan — no Python boundary, full codegen (asserted in
tests/test_functions.py::test_sql_dialect_names_stay_jvm_side).

Monomorphization note: SQL UDFs are typed, so array functions are
registered for ARRAY<DOUBLE> (the repo's embedding element family,
widened per the §1.2 policy); other element types use the Python-side
compat layer (functions/compat.py), which is polymorphic.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Each entry mirrors one reference registry row (file under
# datafusion/functions*/src/). Bodies are pure Catalyst expressions.
_DDL = {
    # math/iszero.rs
    "iszero": "CREATE OR REPLACE TEMPORARY FUNCTION iszero(x DOUBLE) "
              "RETURNS BOOLEAN RETURN x = 0.0",
    # math/cot.rs needs no shim: Spark SQL ships `cot` natively (≥3.3)
    # — attempting to shadow a built-in raises CANNOT_REPLACE_NON_SQL_UDF.
    # string/to_hex.rs (lowercase, like the reference)
    "to_hex": "CREATE OR REPLACE TEMPORARY FUNCTION to_hex(x BIGINT) "
              "RETURNS STRING RETURN lower(hex(x))",
    # unicode/substrindex.rs alias
    "substr_index": "CREATE OR REPLACE TEMPORARY FUNCTION substr_index"
                    "(s STRING, d STRING, n INT) RETURNS STRING "
                    "RETURN substring_index(s, d, n)",
    # functions-nested string_to_array — Postgres edge semantics
    # (functions-nested/src/string.rs): NULL delimiter splits into
    # characters; empty delimiter returns the whole string as one
    # element; empty INPUT returns an empty array (PG 9.1+ — Spark's
    # split('', d) would yield [''], one empty element).
    "string_to_array": "CREATE OR REPLACE TEMPORARY FUNCTION string_to_array"
                       "(s STRING, d STRING) RETURNS ARRAY<STRING> "
                       "RETURN CASE WHEN s IS NULL THEN NULL "
                       "WHEN s = '' AND d IS NOT NULL AND d != '' "
                       "THEN array() "
                       "WHEN d IS NULL THEN split(s, '') "
                       "WHEN d = '' THEN array(s) "
                       "ELSE split(s, regexp_replace(d, "
                       r"'([\\^$.|?*+()\\[\\]{}])', '\\\\$1')) END",
    # functions-nested array_pop_back / array_pop_front
    "array_pop_back": "CREATE OR REPLACE TEMPORARY FUNCTION array_pop_back"
                      "(a ARRAY<DOUBLE>) RETURNS ARRAY<DOUBLE> "
                      "RETURN slice(a, 1, greatest(size(a) - 1, 0))",
    "array_pop_front": "CREATE OR REPLACE TEMPORARY FUNCTION array_pop_front"
                       "(a ARRAY<DOUBLE>) RETURNS ARRAY<DOUBLE> "
                       "RETURN CASE WHEN size(a) <= 1 THEN array() "
                       "ELSE slice(a, 2, size(a) - 1) END",
    # functions-nested array_distance (euclidean)
    "array_distance": "CREATE OR REPLACE TEMPORARY FUNCTION array_distance"
                      "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE "
                      "RETURN sqrt(aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), "
                      "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))",
    # functions-nested array_any_value (first non-null)
    "array_any_value": "CREATE OR REPLACE TEMPORARY FUNCTION array_any_value"
                       "(a ARRAY<DOUBLE>) RETURNS DOUBLE "
                       "RETURN element_at(filter(a, x -> x IS NOT NULL), 1)",
    # functions-nested array_dims / array_ndims (1-D per §2.8 note)
    "array_dims": "CREATE OR REPLACE TEMPORARY FUNCTION array_dims"
                  "(a ARRAY<DOUBLE>) RETURNS ARRAY<INT> RETURN array(size(a))",
    "array_ndims": "CREATE OR REPLACE TEMPORARY FUNCTION array_ndims"
                   "(a ARRAY<DOUBLE>) RETURNS INT RETURN 1",
    # datetime/date_bin.rs — stride in seconds, epoch-anchored origin
    "date_bin": "CREATE OR REPLACE TEMPORARY FUNCTION date_bin"
                "(stride_s BIGINT, ts TIMESTAMP, origin TIMESTAMP) "
                "RETURNS TIMESTAMP RETURN timestamp_seconds("
                "floor((unix_timestamp(ts) - unix_timestamp(origin)) / stride_s) "
                "* stride_s + unix_timestamp(origin))",
}


def register_sql_names(spark: SparkSession) -> list[str]:
    """Install every dialect name into the current session. Idempotent
    (CREATE OR REPLACE). Returns the registered names."""
    for ddl in _DDL.values():
        spark.sql(ddl)
    return sorted(_DDL)
