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
    (per `on` key) — the classic as-of join.

    Implementation: equi-join on the key with ts residual, then
    distinct-on (max right_ts per left row). Shuffles once on `on`;
    the window re-uses the same partitioning (no second shuffle of the
    probe side's key). For unkeyed/huge-range cases use
    `applyInPandas` + pd.merge_asof per key group instead.
    """
    # precondition: apart from `on`, left/right column names are disjoint
    r = right.withColumnRenamed(on, "__rkey")
    left = left.withColumn("__lid", F.monotonically_increasing_id())
    cond = (left[on] == r["__rkey"]) & (r[right_ts] <= left[left_ts])
    if tolerance_seconds is not None:
        cond = cond & (
            r[right_ts].cast("timestamp").cast("double")
            >= left[left_ts].cast("timestamp").cast("double") - tolerance_seconds
        )
    joined = left.join(r, cond, "left").drop("__rkey")
    # deterministic pick per left row: latest right_ts (stable when
    # right_ts is unique per key)
    w = Window.partitionBy("__lid").orderBy(F.desc_nulls_last(F.col(right_ts)))
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__lid")
    )
