"""Registry plumbing + numeric-parity helpers.

Oracle-parity discipline: the driver hash-compares Spark and DuckDB
values, so float aggregation order must not leak into results. Policy:
monetary/quantity doubles in TESTDATA carry ≤2 decimal places, so we
cast them to exact DECIMAL *before* aggregating (sum order then cannot
change the value) and cast the final aggregate back to DOUBLE. Both
engines perform the identical exact-decimal computation → identical
doubles. Helpers below encode that recipe for the Spark side; oracle
SQL strings mirror it with explicit CASTs.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over pre-registered views; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = ()


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable:
    """Decorator: register a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, build=fn, oracle=oracle, doc=doc or fn.__doc__ or "", tags=tags)
        return fn

    return deco


# ---- exact-decimal helpers (Spark side) ------------------------------------

def dec2(c: str | Column) -> Column:
    """Exact decimal view of a 2-dp monetary double (l_extendedprice &c)."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("decimal(12,2)")


def one_minus(c: str) -> Column:
    """(1 - rate) as exact DECIMAL(4,2) — rate columns are 2-dp in [0,1)."""
    return (F.lit(1.0) - F.col(c)).cast("decimal(4,2)")


def one_plus(c: str) -> Column:
    return (F.lit(1.0) + F.col(c)).cast("decimal(4,2)")


def dsum(col: Column, alias: str) -> Column:
    """Exact decimal sum surfaced as double."""
    return F.sum(col).cast("double").alias(alias)


def davg(col: Column, alias: str) -> Column:
    """Order-independent average: exact decimal sum / count, in double."""
    return (F.sum(col).cast("double") / F.count(F.lit(1))).alias(alias)
