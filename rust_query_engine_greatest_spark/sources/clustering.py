"""Z-order (Morton-curve) clustered writes — multi-dimensional data
skipping for the scan layer.

The scale problem: `compact.py` range-clusters a table on ONE sort
prefix, so parquet row-group min/max stats prune scans filtered on that
prefix — but a second filter column's values stay scattered and its
stats span everything. Lakehouse engines solve this with OPTIMIZE
ZORDER (Delta, Iceberg); open-source Spark has no native spelling.
This module is that lever as a pure DataFrame recipe: bucket each
clustering column to a fixed-width integer, interleave the bucket bits
into one Morton key (all built-in shift/and/or expressions — codegen,
no UDFs), then `repartitionByRange` + `sortWithinPartitions` on the
key before writing. Rows near each other on the space-filling curve
land in the same row group, so min/max footer stats become tight for
EVERY clustered column at once and Spark's parquet reader prunes row
groups on any of them (predicate pushdown does the rest for free).

At 100 TB: the only costs are one O(k)-row min/max aggregate (plan
literals for the bucket scaling), the range exchange the rewrite needs
anyway, and a per-partition sort — the same shape as compact.activate.
Numeric / date / timestamp columns only: hashing strings would destroy
the range locality the curve exists to create (use bucketing.py for
string equality keys instead).

Reference analog: DataFusion's own parquet pruning reads the same
row-group statistics (`datafusion/pruning/src/pruning_predicate.rs`);
the reference repo ships no clustered-write command, so this row sits
in the beyond-the-reference at-scale surface with compact/bucketing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "write_zordered"]


def _bucket(col: Column, mn, mx, bits: int) -> Column:
    """Scale a numeric column into [0, 2^bits) as a long, min/max taken
    from plan literals. Degenerate range (mn == mx) → bucket 0; NULL →
    bucket 0 (sorts first, same convention as NULLS FIRST layouts)."""
    span = F.lit(float(mx) - float(mn))
    scaled = F.when(
        span > 0,
        ((col.cast("double") - F.lit(float(mn))) / span)
        * F.lit((1 << bits) - 1),
    ).otherwise(F.lit(0.0))
    return F.coalesce(
        F.least(
            F.greatest(scaled.cast("long"), F.lit(0)),
            F.lit((1 << bits) - 1),
        ),
        F.lit(0),
    )


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 12,
    ranges: dict[str, tuple] | None = None,
) -> tuple[Column, dict[str, tuple]]:
    """Morton key over `cols` as a single long Column, plus the
    (min, max) ranges used for bucket scaling (returned so callers can
    record / reuse them).

    When `ranges` is omitted, one O(k)-literal min/max aggregate runs
    over the input — at 100 TB pass catalog statistics instead (e.g.
    the ANALYZE min/max stats.py maintains, or the previous rewrite's
    returned ranges for incremental re-clustering) and the extra scan
    disappears; bucket scaling only needs APPROXIMATE bounds (values
    outside clamp to the edge buckets, costing locality, never
    correctness). The key itself is pure codegen arithmetic: bit j of
    column i's bucket lands at position j·k + i, so k·bits total bits
    (k·bits ≤ 62 enforced — fits a long with sign headroom)."""
    k = len(cols)
    if k == 0:
        raise ValueError("zorder_key needs at least one column")
    if k * bits > 62:
        raise ValueError(f"{k} cols × {bits} bits exceeds a long")
    if ranges is None:
        aggs = []
        for i, c in enumerate(cols):
            norm = F.col(c).cast("double")
            aggs += [F.min(norm).alias(f"mn{i}"),
                     F.max(norm).alias(f"mx{i}")]
        row = df.agg(*aggs).collect()[0]
        ranges = {c: (row[f"mn{i}"], row[f"mx{i}"])
                  for i, c in enumerate(cols)}
    missing = [c for c in cols if c not in ranges]
    if missing:
        raise ValueError(f"ranges missing for {missing}")
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        mn, mx = ranges[c]
        if mn is None or mx is None:  # all-NULL column: contributes 0
            continue
        b = _bucket(F.col(c), mn, mx, bits)
        for j in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftrightunsigned(b, j).bitwiseAND(F.lit(1)),
                    j * k + i,
                )
            )
    return key, ranges


def write_zordered(
    df: DataFrame,
    cols: list[str],
    path: str,
    bits: int = 12,
    partitions: int | None = None,
    mode: str = "overwrite",
    ranges: dict[str, tuple] | None = None,
) -> dict[str, tuple]:
    """Write `df` as parquet clustered along the Z-curve of `cols`.
    Returns the per-column (min, max) scaling ranges.

    Range-partition on the key (sampled bounds — the same mechanism an
    ORDER BY write uses), sort within each partition, then drop the
    key before writing so the on-disk schema is unchanged. Row-group
    size stays the writer default; the locality comes from the sort.
    Pass `ranges` (catalog stats / a previous rewrite's return) to
    skip the min/max scan — see zorder_key."""
    key, ranges = zorder_key(df, cols, bits, ranges=ranges)
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    (
        df.withColumn("__z", key)
        .repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
    return ranges
