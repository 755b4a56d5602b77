"""Skew mitigation: salted two-phase aggregation and salted replicate
joins.

AQE's runtime skew-join splitting (spark.sql.adaptive.skewJoin, on in
session.py) handles most skew transparently; salting is the explicit
plan-level tool for the cases AQE can't fix — a single hot grouping key
whose FINAL aggregation state is too large for one reducer, or a
non-broadcastable join against a skewed key distribution.

Reference parity: the reference has no skew handling at all (its hash
repartition `physical-plan/src/repartition/mod.rs:401` sends each key
to exactly one partition, hot or not) — this module is part of the
at-scale surface this engine adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial-aggregate, merge-aggregate) per supported op: the op must be
# decomposable so salt-bucket partials merge exactly.
_OPS = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over (keys + salt) then (keys).

    aggs: [(column, op, alias)] with op in {sum,count,min,max}
    (decomposable ops only — that's what makes the rewrite exact).

    The salt spreads each hot key over n_salts reducers in phase 1; the
    phase-2 input is ≤ n_salts rows per key regardless of how skewed
    the raw distribution is. Salt = xxhash64 of the whole row, so the
    rewrite is deterministic (no rand())."""
    for _, op, _ in aggs:
        if op not in _OPS:
            raise ValueError(f"non-decomposable op {op!r}; supported: {sorted(_OPS)}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[_OPS[op][0](c).alias(a) for c, op, a in aggs]
    )
    return partial.groupBy(*keys).agg(
        *[_OPS[op][1](a).alias(a) for _, op, a in aggs]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `left` is large and skewed on `on`, and `right`
    is too big to broadcast but small enough to replicate n_salts×.

    left rows get a deterministic salt in [0, n_salts); right rows are
    exploded once per salt value; the join key becomes (on, salt), so a
    hot key's rows spread across n_salts partitions instead of one.
    Cost: right side shuffles n_salts× its size — choose n_salts =
    (hot-key partition size / target partition size), not "big"."""
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l = left.withColumn("__salt", lsalt)
    r = right.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = l.join(r, on=[on, "__salt"], how=how)
    return out.drop("__salt")
