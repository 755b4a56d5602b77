"""Subquery decorrelation inventory (SURVEY §2.3/§4.2 — the reference
optimizes subqueries via DataFusion's
`optimizer/src/decorrelate_predicate_subquery.rs` (IN/EXISTS → semi,
NOT IN/NOT EXISTS → anti) and `optimizer/src/scalar_subquery_to_join.rs`
(scalar subqueries → aggregate + join), exercised across
`sqllogictest/test_files/subquery*.slt`).

On Spark the same rewrites are Catalyst's `RewritePredicateSubquery`
and `RewriteCorrelatedScalarSubquery`; each entry here is written as
`spark.sql(...)` over temp views precisely so the *optimizer path* is
what's under test, then hash-checked against DuckDB running the same
ANSI subquery form. Plan shapes (null-aware anti join, broadcast scalar,
no cartesian for LATERAL) are pinned in tests/test_plans.py.

Null-aware NOT IN is the classic engine-differentiating edge: one NULL
in the subquery result makes `x NOT IN (...)` never-true, while the
"same" NOT EXISTS keeps matching — `subq_not_in_null_aware` pins all
three behaviors in one result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.catalog import load_table
from .base import register

# Exact-decimal average so Spark and DuckDB compute the identical double
# regardless of row order (see base.py parity policy).
_AVG_PRICE = (
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)"
)


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


# --------------------------------------------------------------------------
_SCALAR_UNCORR_SQL = f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
    FROM orders
    WHERE o_totalprice > (SELECT {_AVG_PRICE} FROM orders)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@register(
    "subq_scalar_uncorrelated",
    _SCALAR_UNCORR_SQL,
    tags=("subquery",),
)
def subq_scalar_uncorrelated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in WHERE (above-global-average
    filter). Catalyst plans the one-row aggregate as a broadcast/subquery
    reuse — the same shape the reference's ScalarSubqueryToJoin emits
    (optimizer/src/scalar_subquery_to_join.rs)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_SCALAR_UNCORR_SQL)


# --------------------------------------------------------------------------
_SCALAR_CORR_SQL = """
    SELECT c.c_nationkey,
           COUNT(*) AS n_above_nation_avg
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
               / COUNT(*)
        FROM customer c2
        WHERE c2.c_nationkey = c.c_nationkey)
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
"""


@register(
    "subq_scalar_correlated",
    _SCALAR_CORR_SQL,
    tags=("subquery",),
)
def subq_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar aggregate subquery (per-group average compared
    row-by-row). Catalyst's RewriteCorrelatedScalarSubquery turns it
    into an aggregate-then-join — one exchange on the correlation key,
    no per-row re-execution (cf. reference
    optimizer/src/scalar_subquery_to_join.rs and tpch q17's shape)."""
    _views(spark, sf_dir, "customer")
    return spark.sql(_SCALAR_CORR_SQL)


# --------------------------------------------------------------------------
_IN_SEMI_SQL = """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@register(
    "subq_in_semi",
    _IN_SEMI_SQL,
    tags=("subquery",),
)
def subq_in_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated IN-subquery → LeftSemi join (Catalyst
    RewritePredicateSubquery ↔ reference
    decorrelate_predicate_subquery.rs IN→semi path)."""
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(_IN_SEMI_SQL)


# --------------------------------------------------------------------------
# The NULL-semantics triptych. `UNION ALL SELECT CAST(NULL AS BIGINT)`
# guarantees a NULL in the subquery regardless of data, so:
#   * NOT IN over it is never TRUE  → count 0 (null-aware anti join),
#   * the same set minus NULLs behaves normally,
#   * NOT EXISTS with the equivalent correlation ignores the NULL row
#     entirely (NULL = k is never TRUE) → plain anti-join count.
_NOT_IN_SQL = """
    SELECT 'not_in_with_null' AS variant, COUNT(*) AS n
    FROM orders
    WHERE o_custkey NOT IN (
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        UNION ALL SELECT CAST(NULL AS BIGINT))
    UNION ALL
    SELECT 'not_in_no_null' AS variant, COUNT(*) AS n
    FROM orders
    WHERE o_custkey NOT IN (
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    UNION ALL
    SELECT 'not_exists_with_null' AS variant, COUNT(*) AS n
    FROM orders o
    WHERE NOT EXISTS (
        SELECT 1 FROM (
            SELECT c_custkey FROM customer WHERE c_acctbal > 5000
            UNION ALL SELECT CAST(NULL AS BIGINT)) c
        WHERE c.c_custkey = o.o_custkey)
"""


@register(
    "subq_not_in_null_aware",
    _NOT_IN_SQL,
    tags=("subquery", "edge"),
)
def subq_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN vs NOT EXISTS under a guaranteed-NULL subquery row: the
    three-valued-logic edge every sqllogictest subquery corpus pins
    (reference sqllogictest/test_files/subquery*.slt). Spark plans the
    NOT IN branch as a null-aware anti join (NAAJ, broadcast-only by
    design) — pinned in tests/test_plans.py."""
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(_NOT_IN_SQL)


# --------------------------------------------------------------------------
_EXISTS_CORR_SQL = """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_totalprice > c.c_acctbal * 10)
    ORDER BY c.c_custkey
"""


@register(
    "subq_exists_correlated",
    _EXISTS_CORR_SQL,
    tags=("subquery",),
)
def subq_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with a non-equi correlated predicate
    (o_totalprice > c_acctbal * 10): decorrelates to a semi join whose
    condition mixes the equality key with the inequality — the
    decorrelate_predicate_subquery.rs EXISTS path with extra filters."""
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(_EXISTS_CORR_SQL)


# --------------------------------------------------------------------------
_LATERAL_SPARK_SQL = """
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n,
    LATERAL (
        SELECT c_name, c_acctbal
        FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_name
        LIMIT 2) t
    ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
"""

# DuckDB mirror via row_number — same semantics (deterministic: the
# ORDER BY key (c_acctbal DESC, c_name) is unique per nation).
_LATERAL_ORACLE_SQL = """
    SELECT n.n_name, r.c_name, r.c_acctbal
    FROM nation n
    JOIN (
        SELECT c_nationkey, c_name, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_name) AS rn
        FROM customer) r
      ON r.c_nationkey = n.n_nationkey AND r.rn <= 2
    ORDER BY n.n_name, r.c_acctbal DESC, r.c_name
"""


@register(
    "subq_lateral_topk",
    _LATERAL_ORACLE_SQL,
    tags=("subquery",),
)
def subq_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery with ORDER BY + LIMIT (top-2
    customers per nation). Spark's LateralJoin decorrelates the
    per-nation limit to a window+filter — equivalent to the
    row_number oracle form; no cartesian, pinned in test_plans."""
    _views(spark, sf_dir, "nation", "customer")
    return spark.sql(_LATERAL_SPARK_SQL)


# --------------------------------------------------------------------------
# Spark's parser has no quantified-comparison subqueries (`> ALL/ANY`),
# so the entry encodes the standard rewrite over a non-empty, NULL-free
# subquery (s_acctbal is NOT NULL in TESTDATA):
#   x > ALL (S) ⇔ x > (SELECT MAX(s) FROM S)
#   x > ANY (S) ⇔ x > (SELECT MIN(s) FROM S)
# (For empty S the rewrite would need COALESCE sentinels — documented
# limitation; DuckDB runs the native quantified form as the oracle.)
_QUANT_SPARK_SQL = """
    SELECT 'gt_all' AS variant, COUNT(*) AS n
    FROM orders
    WHERE o_totalprice > (SELECT MAX(s_acctbal) FROM supplier)
    UNION ALL
    SELECT 'gt_any' AS variant, COUNT(*) AS n
    FROM orders
    WHERE o_totalprice > (SELECT MIN(s_acctbal) FROM supplier)
"""

_QUANT_ORACLE_SQL = """
    SELECT 'gt_all' AS variant, COUNT(*) AS n
    FROM orders
    WHERE o_totalprice > ALL (SELECT s_acctbal FROM supplier)
    UNION ALL
    SELECT 'gt_any' AS variant, COUNT(*) AS n
    FROM orders
    WHERE o_totalprice > ANY (SELECT s_acctbal FROM supplier)
"""


@register(
    "subq_quantified_all_any",
    _QUANT_ORACLE_SQL,
    tags=("subquery", "edge"),
)
def subq_quantified_all_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparisons (`> ALL` / `> ANY`) via the standard
    MAX/MIN scalar rewrite, hash-checked against DuckDB executing the
    native quantified form (reference parses these through sqlparser-rs;
    sqllogictest subquery corpus covers them)."""
    _views(spark, sf_dir, "orders", "supplier")
    return spark.sql(_QUANT_SPARK_SQL)
