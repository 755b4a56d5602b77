"""Recursive CTE (reference `RecursiveQueryExec`,
physical-plan/src/recursive_query.rs:57; working table work_table.rs:97).

Spark SQL has no recursive CTE; the documented equivalent (SURVEY §7) is
a driver-side fixpoint loop over DataFrames: seed ∪ step(seed) ∪ ... with
an iteration cap. Each iteration is fully distributed; only the
*control* (emptiness check) touches the driver, via a cheap
`.isEmpty()`/`limit(1).count()` action.

Scale note: for deep recursions checkpoint/localCheckpoint every few
iterations to cut the growing lineage; `union` here is partition concat
(no shuffle), matching the reference's UnionExec.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def recursive_cte(
    seed: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    max_iterations: int = 100,
    distinct: bool = True,
    checkpoint_every: int = 8,
) -> DataFrame:
    """UNION [ALL] recursive CTE semantics: accumulate seed plus repeated
    `step(frontier)` until the frontier is empty or the cap hits.

    distinct=True mirrors `WITH RECURSIVE ... UNION` (dedup across
    iterations, frontier = new rows only); False mirrors UNION ALL.
    """
    acc = seed
    frontier = seed
    for i in range(max_iterations):
        nxt = step(frontier)
        if distinct:
            nxt = nxt.distinct().exceptAll(acc).cache()
        if nxt.isEmpty():
            break
        acc = acc.unionAll(nxt)
        frontier = nxt
        if (i + 1) % checkpoint_every == 0:
            acc = acc.localCheckpoint(eager=True)
    return acc
