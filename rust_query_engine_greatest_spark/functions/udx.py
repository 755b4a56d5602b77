"""User-defined extension surface (SURVEY §2.10) — one working artifact
per reference extension point:

| Reference extension point                     | Here |
|---|---|
| `ScalarUDFImpl` (expr/src/udf.rs:369)         | `greatest_udf` — Arrow-vectorized scalar UDF |
| `AggregateUDFImpl` (expr/src/udaf.rs:376)     | `cents_sum` — GROUPED_AGG pandas UDF |
| `WindowUDFImpl` (expr/src/udwf.rs:291)        | `cents_sum` applied `.over(Window...)` (tests) |
| `TableFunctionImpl` (core/src/datasource/function.rs:29) | `GenerateSeries` Python UDTF |

`greatest_udf` is the thematic one: the reference implements a native
`greatest` kernel and proves it equals PySpark's built-in by
differential test (`tests/greatest_test.py:29-90`); here the kernel is a
vectorized pandas UDF proven against `F.greatest` the same way
(tests/test_functions.py). Spark's NaN/NULL contract
(functions-nested/src/greatest.rs:261-278, :370-384): per-row max
skipping NULLs, all-NULL → NULL, NaN greater than any number.

UDFs are the slow path (SURVEY north star): everything here exists to
prove the extension surface; the engine's registered queries use
built-in expressions wherever one exists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType


@pandas_udf(DoubleType())
def _greatest_kernel(*args: pd.Series) -> pd.Series:
    """Variadic kernel over (value..., validity...) column pairs.

    Arrow→pandas conversion renders SQL NULL as NaN in float64 Series,
    conflating it with a genuine NaN *value* — whose semantics differ
    (NULL is skipped, NaN wins). So the wrapper ships an explicit
    validity mask per input, the same values+validity shape an Arrow
    kernel sees (the reference kernel iterates valid slots the same way,
    greatest.rs:261-278)."""
    n = len(args) // 2
    vals = np.vstack([v.to_numpy(dtype=np.float64, na_value=np.nan) for v in args[:n]]).T
    valid = ~np.vstack([m.to_numpy(dtype=bool) for m in args[n:]]).T
    has_nan_value = (valid & np.isnan(vals)).any(axis=1)
    best = np.where(valid & ~np.isnan(vals), vals, -np.inf).max(axis=1)
    best = np.where(has_nan_value, np.nan, best)  # NaN beats any number
    any_valid = valid.any(axis=1)
    # FloatingArray with an explicit mask keeps NULL distinct from a NaN
    # *value* on the way back through Arrow (pd.array() would coerce
    # NaN→NA and lose the distinction)
    return pd.Series(pd.arrays.FloatingArray(best, mask=~any_valid))


def greatest_udf(*cols: str | Column) -> Column:
    """Spark-semantics GREATEST as a scalar pandas UDF. The wrapper
    coerces inputs to double (the reference coerces to a common wide
    type first, greatest.rs:84-101) and requires ≥2 args — the same
    arity rule (greatest.rs:78-81, matched against Spark's error in the
    reference's own tests)."""
    if len(cols) < 2:
        raise ValueError("greatest requires at least 2 arguments")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    vals = [c.cast("double") for c in cs]
    masks = [c.isNull() for c in cs]
    return _greatest_kernel(*vals, *masks)


@pandas_udf(LongType())
def cents_sum(v: pd.Series) -> int:
    """GROUPED_AGG UDAF: exact integer-cents sum of a 2-dp monetary
    double — order-insensitive (integer addition commutes), so it
    hash-matches a DuckDB oracle regardless of partitioning. Also usable
    as a window function (`cents_sum(col).over(w)`) — the WindowUDF
    extension point."""
    arr = v.to_numpy(dtype=np.float64, na_value=np.nan)
    cents = arr[~np.isnan(arr)] * 100
    # half-AWAY-from-zero to match SQL round() (DuckDB/Spark); np.round
    # is half-to-even, a latent tie mismatch on exact .5 cents
    return int((np.sign(cents) * np.floor(np.abs(cents) + 0.5)).astype(np.int64).sum())


def make_generate_series_udtf():
    """Python UDTF mirroring the reference's `generate_series` table
    function (core/src/datasource/function.rs:29,36 — the UDTF
    surface). Built lazily so importing this module never needs a
    running session."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="s: bigint")
    class GenerateSeries:
        def eval(self, start: int, stop: int, step: int = 1):
            if step == 0:
                raise ValueError("generate_series: step must not be zero")
            s = start
            if step > 0:
                while s <= stop:
                    yield (s,)
                    s += step
            else:
                while s >= stop:
                    yield (s,)
                    s += step

    return GenerateSeries
