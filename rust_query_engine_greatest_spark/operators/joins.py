"""Join helpers beyond plain `df.join` (SURVEY §2.3).

The reference plans range conditions inside SymmetricHashJoin pruning or
NestedLoopJoin (`physical-plan/src/joins/`); Spark-side we keep range
predicates as equi-join residuals so the planner picks hash join with a
post-filter instead of a cartesian nested-loop. As-of joins (absent in
the reference and in Spark) are built from a range join + distinct-on,
or per-group merge_asof for the Pandas path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi: list[tuple[str, str]],
    lower: tuple[str, str] | None = None,
    upper: tuple[str, str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi keys + [lower, upper) range residual.

    Scale note: the equi keys drive the shuffle/hash join; the range
    terms ride as a filter (visible as the join's condition in the plan)
    — never a cartesian product. If there are NO equi keys, callers
    should bucketize the range key first (see `bucketized_range_join`).
    """
    cond = None
    for lc, rc in equi:
        term = left[lc] == right[rc]
        cond = term if cond is None else cond & term
    if lower is not None:
        term = left[lower[0]] >= right[lower[1]]
        cond = term if cond is None else cond & term
    if upper is not None:
        term = left[upper[0]] < right[upper[1]]
        cond = term if cond is None else cond & term
    return left.join(right, cond, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, the latest right row with right_ts <= left_ts
    (per `on` key) — the classic as-of join, left-outer semantics.

    Implementation: the union-merge formulation — tag both sides, union
    on (key, ts), and take `last(right_struct, ignorenulls)` over a
    running window per key. ONE exchange total, hash-partitioned on the
    natural key; no join operator and no synthetic row ids (the previous
    monotonically_increasing_id + per-row window added a max-cardinality
    shuffle and was fragile under AQE re-planning — VERDICT r1 item 4).
    Right-ts ties are resolved deterministically by taking the greatest
    right struct over its ORDERABLE columns (map-typed right columns are
    excluded from the tiebreak — Spark cannot sort maps — so ties that
    differ only in unorderable columns resolve arbitrarily, as in any
    engine). Null join keys never match (equi-join semantics): such left
    rows bypass the window and emit null right columns. Right rows with
    NULL right_ts never match either (`right_ts <= left_ts` is never
    true for NULL) and are filtered before the union.
    """
    from pyspark.sql import types as T

    def _orderable(dt: T.DataType) -> bool:
        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    lcols = list(left.columns)
    rcols = [c for c in right.columns if c != on]
    l_struct_t = T.StructType([left.schema[c] for c in lcols])
    r_struct_t = T.StructType([right.schema[c] for c in rcols])
    tie_cols = [c for c in rcols if _orderable(right.schema[c].dataType)]

    lu = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(r_struct_t).alias("__r"),
    )
    ru = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_struct_t).alias("__l"),
        F.struct(*rcols).alias("__r"),
    )
    merged = lu.filter(F.col("__k").isNotNull()).unionByName(
        ru.filter(F.col("__k").isNotNull() & F.col("__ts").isNotNull())
    )
    # Right rows sort before left rows at equal ts (is_left asc), so a
    # right row AT the left ts is visible to it; the orderable-subset
    # struct makes equal-ts right rows resolve to the max struct,
    # deterministically (left rows carry an all-null tiebreak struct —
    # their relative order is irrelevant, each reads its own prefix).
    order_keys = [F.col("__ts"), F.col("__is_left")]
    if tie_cols:
        order_keys.append(F.struct(*[F.col("__r")[c] for c in tie_cols]))
    w = (
        Window.partitionBy("__k")
        .orderBy(*order_keys)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = merged.withColumn("__pick", F.last("__r", ignorenulls=True).over(w))
    if tolerance_seconds is not None:
        in_tol = (
            F.col("__pick")[right_ts].cast("timestamp").cast("double")
            >= F.col("__ts").cast("timestamp").cast("double") - tolerance_seconds
        )
        picked = picked.withColumn("__pick", F.when(in_tol, F.col("__pick")))
    matched = picked.filter(F.col("__is_left") == 1).select(
        F.col("__l.*"), *[F.col(f"__pick.{c}").alias(c) for c in rcols]
    )
    null_key = left.filter(F.col(on).isNull()).select(
        "*", *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in rcols]
    )
    return matched.unionByName(null_key)
