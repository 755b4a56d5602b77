"""Compat layer for reference scalar functions Spark lacks as built-ins
(SURVEY §2.8 gap list). Everything here is a *composition of JVM-side
built-ins* (pyspark.sql.functions / higher-order lambda expressions) —
no Python UDFs — so every function stays inside whole-stage codegen and
is safe in a 100 TB hot path.

Reference citations are per-function; the registry the reference uses is
`functions*/src/*/mod.rs::functions()` under
`/root/reference/datafusion-greatest/datafusion/`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# The contribution: greatest (functions-nested/src/greatest.rs:64-115).
# Spark's F.greatest is the contract the reference itself tests against
# (tests/greatest_test.py:34-39): per-row max skipping NULLs, all-NULL →
# NULL, NaN greater than any number, common-wider-type coercion, error on
# <2 args or incompatible types.  Re-exported so engine users import it
# from this package; parity is proven differentially in
# tests/test_functions.py and queries/functions_q.py.
greatest = F.greatest


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# -- array functions (functions-nested/src/lib.rs::all_default_nested_functions)

def array_pop_back(arr: Column | str) -> Column:
    """Reference `array_pop_back` (functions-nested/src/array_has.rs
    registry peer). slice(arr, 1, size-1); empty/NULL-safe."""
    a = _c(arr)
    return F.when(a.isNull(), F.lit(None)).otherwise(
        F.slice(a, 1, F.greatest(F.size(a) - 1, F.lit(0)))
    )


def array_pop_front(arr: Column | str) -> Column:
    """Reference `array_pop_front` → slice(arr, 2, size-1)."""
    a = _c(arr)
    return F.when(a.isNull(), F.lit(None)).otherwise(
        F.slice(a, 2, F.greatest(F.size(a) - 1, F.lit(0)))
    )


def array_distance(a: Column | str, b: Column | str) -> Column:
    """Reference `array_distance` (Euclidean; functions-nested registry).
    sqrt(Σ (a[i]-b[i])²) via zip_with + aggregate — sequential fold, so
    the result is deterministic regardless of partitioning."""
    a, b = _c(a), _c(b)
    # (x-y)*(x-y), not pow(x-y, 2): multiplication is correctly rounded
    # IEEE in every engine, pow() is libm-dependent — keeps results
    # bit-identical to the DuckDB oracle.
    sq = F.zip_with(
        a, b,
        lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double")),
    )
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def array_resize(arr: Column | str, new_size: int, fill: Column | None = None) -> Column:
    """Reference `array_resize(arr, size, value)`: truncate or pad."""
    a = _c(arr)
    fill = fill if fill is not None else F.lit(None)
    pad = F.array_repeat(fill, F.greatest(F.lit(new_size) - F.size(a), F.lit(0)))
    return F.slice(F.concat(a, pad), 1, new_size)


def array_remove_first(arr: Column | str, value) -> Column:
    """Reference `array_remove` removes the FIRST occurrence (Spark's
    F.array_remove removes all, so filter on running occurrence count)."""
    return array_remove_n(arr, value, 1)


def array_remove_n(arr: Column | str, value, n: int) -> Column:
    """Reference `array_remove_n`: drop the first n occurrences. Uses the
    (element, index) filter lambda; the running count is the number of
    matches in the prefix."""
    a = _c(arr)
    v = F.lit(value)
    def keep(x, i):
        prefix_matches = F.size(F.filter(F.slice(a, 1, i + 1), lambda y: y.eqNullSafe(v)))
        return ~(x.eqNullSafe(v) & (prefix_matches <= F.lit(n)))
    return F.filter(a, keep)


def array_remove_all(arr: Column | str, value) -> Column:
    """Reference `array_remove_all` == Spark's F.array_remove."""
    return F.array_remove(_c(arr), value)


def array_replace_first(arr: Column | str, from_v, to_v) -> Column:
    """Reference `array_replace`: replace first occurrence only."""
    a = _c(arr)
    fv, tv = F.lit(from_v), F.lit(to_v)
    pos = F.array_position(a, fv)  # 1-based, 0 if absent
    def repl(x, i):
        return F.when((i + 1 == pos) & x.eqNullSafe(fv), tv).otherwise(x)
    return F.transform(a, repl)


def array_replace_all(arr: Column | str, from_v, to_v) -> Column:
    """Reference `array_replace_all`: replace every occurrence."""
    fv, tv = F.lit(from_v), F.lit(to_v)
    return F.transform(_c(arr), lambda x: F.when(x.eqNullSafe(fv), tv).otherwise(x))


def map_extract(m: Column | str, key) -> Column:
    """Reference `map_extract(map, key)` → singleton list of the value
    (functions-nested/src/map_extract.rs)."""
    return F.array(F.element_at(_c(m), key))


# -- math (functions/src/math/)

def iszero(c: Column | str) -> Column:
    """Reference `iszero` (functions/src/math/iszero.rs)."""
    return _c(c).cast("double") == 0.0


def cot(c: Column | str) -> Column:
    """Reference `cot` (functions/src/math/cot.rs) = cos/sin."""
    return F.cos(_c(c)) / F.sin(_c(c))


def gcd(a: Column | str, b: Column | str) -> Column:
    """Reference `gcd` (functions/src/math/gcd.rs). Closed-form via
    Euclid is iterative; bounded 64-bit ints need ≤ ~92 iterations —
    expressed as an unrolled aggregate over a constant sequence to stay
    JVM-side (no Python UDF)."""
    a, b = F.abs(_c(a).cast("long")), F.abs(_c(b).cast("long"))
    pair = F.struct(a.alias("x"), b.alias("y"))
    def step(acc, _):
        x, y = acc["x"], acc["y"]
        return F.when(y == 0, acc).otherwise(F.struct(y.alias("x"), (x % y).alias("y")))
    out = F.aggregate(F.sequence(F.lit(1), F.lit(92)), pair, step)
    return out["x"]


def lcm(a: Column | str, b: Column | str) -> Column:
    """Reference `lcm` = (|a| / gcd) · |b|, 0 when either is 0.

    Integral-exact: |a|/g is computed in DECIMAL (exact — g divides a)
    and multiplied before any long cast, so products up to 2⁶³ keep full
    precision (naive |a·b|/g loses exactness ≥2⁵³ through double
    division and can overflow a·b even when the lcm itself fits).
    Results beyond the long range overflow as in the reference."""
    a, b = _c(a).cast("long"), _c(b).cast("long")
    g = gcd(a, b)
    q = F.abs(a).cast("decimal(38,0)") / g.cast("decimal(38,0)")
    return F.when((a == 0) | (b == 0), F.lit(0).cast("long")).otherwise(
        (q * F.abs(b).cast("decimal(38,0)")).cast("long")
    )


def factorial_int(c: Column | str) -> Column:
    """Reference `factorial` (functions/src/math/factorial.rs) — Spark has
    SQL factorial for 0..20."""
    return F.factorial(_c(c))


def trunc_numeric(c: Column | str, scale: int = 0) -> Column:
    """Reference numeric `trunc(x, s)` — round toward zero at scale s."""
    x = _c(c)
    factor = float(10 ** scale)
    return (
        F.when(x >= 0, F.floor(x * factor) / factor).otherwise(F.ceil(x * factor) / factor)
    )


# -- datetime (functions/src/datetime/)

def date_bin(width_seconds: int, ts: Column | str, origin: str = "1970-01-01 00:00:00") -> Column:
    """Reference `date_bin(interval, ts, origin)`
    (functions/src/datetime/date_bin.rs): floor ts into fixed-width bins
    anchored at origin. Spark analog of tumbling F.window but returning
    the bin start as a timestamp column (usable in any expression)."""
    # normalize TIMESTAMP_NTZ (how Spark 4 reads parquet ms-timestamps)
    # to session-tz timestamp before epoch arithmetic
    t = _c(ts).cast("timestamp")
    o = F.lit(origin).cast("timestamp")
    delta = t.cast("double") - o.cast("double")  # seconds, exact for µs values
    binned = F.floor(delta / F.lit(float(width_seconds))) * F.lit(float(width_seconds))
    return F.timestamp_seconds(o.cast("double") + binned)


# -- string/aggregate

def string_agg(c: Column | str, sep: str, order_by: Column | None = None) -> Column:
    """Reference `string_agg` (functions-aggregate/src/string_agg.rs) —
    aggregate expression: concat_ws over collect_list. Deterministic only
    when the caller supplies order_by (collect_list order is partition-
    dependent); pass order_by to sort elements before joining."""
    col = _c(c)
    lst = F.collect_list(col)
    if order_by is not None:
        lst = F.sort_array(F.collect_list(F.struct(order_by.alias("k"), col.alias("v"))))
        return F.concat_ws(sep, F.transform(lst, lambda s: s["v"]))
    return F.concat_ws(sep, lst)
