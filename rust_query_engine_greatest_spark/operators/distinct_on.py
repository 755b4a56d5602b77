"""DISTINCT ON (Postgres-style), reference `Distinct::On`
(expr/src/logical_plan/plan.rs:2810).

Spark's dropDuplicates gives no tie-order guarantee (SURVEY §7 hazard),
so the deterministic implementation is the row_number window + rank=1
filter. Scale note: the window shuffles once on the distinct keys —
same cost as any groupBy on those keys; no driver involvement.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def distinct_on(df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]) -> DataFrame:
    """First row per distinct `keys`, "first" defined by `order_by`
    (must be a total order within key groups for determinism)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    rn = F.row_number().over(w)
    return df.withColumn("__rn", rn).filter(F.col("__rn") == 1).drop("__rn")
