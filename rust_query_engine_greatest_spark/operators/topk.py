"""Top-K operators.

Reference: fused sort+limit heap (`physical-plan/src/topk/mod.rs:75`) and
the TopK aggregation rule (`physical-optimizer/src/topk_aggregation.rs`).
Spark's planner already fuses orderBy+limit into TakeOrderedAndProject
(per-partition heaps + driver merge — the same algorithm, distributed),
so `top_k` is a declaration; `top_k_per_group` is the windowed variant
the reference lacks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (verified in plan tests)."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(df: DataFrame, keys: Sequence[str], order_by: Sequence[Column], k: int) -> DataFrame:
    """Top-k within each key group via rank window; one shuffle on keys."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k).drop("__rn")
