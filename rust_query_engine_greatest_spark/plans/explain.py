"""Plan introspection + scale-discipline assertions.

The reference's physical-optimizer guarantees (SURVEY §4.3) map to
observable properties of Spark's physical plan: predicate pushdown
(PruningPredicate/row_group_filter.rs ↔ PushedFilters), projection
pushdown (ProjectionPushdown ↔ ReadSchema), broadcast decisions
(JoinSelection/CollectLeft ↔ BroadcastHashJoin), top-k fusion
(TopKAggregation ↔ TakeOrderedAndProject), vectorized execution
(§4.4 ↔ WholeStageCodegen). These assertions are how the test suite
*proves* each optimization actually fires instead of trusting it.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def assert_pushed_filters(df: DataFrame, *fragments: str) -> str:
    """Every fragment must appear inside a PushedFilters: [...] list —
    i.e. the predicate reached the parquet scan."""
    plan = plan_string(df)
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    assert pushed, f"no PushedFilters in plan:\n{plan}"
    for frag in fragments:
        assert frag in pushed, f"filter {frag!r} not pushed; pushed={pushed}"
    return plan


def assert_read_schema_only(df: DataFrame, table_cols: dict[str, set[str]]) -> str:
    """Column pruning: each scan's ReadSchema must contain only the
    expected columns for that table (keyed by a column known unique to
    the table, e.g. 'l_orderkey' → lineitem's allowed set)."""
    plan = plan_string(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, f"no ReadSchema in plan:\n{plan}"
    for s in schemas:
        cols = {c.split(":")[0].strip() for c in s.split(",") if c.strip()}
        for marker, allowed in table_cols.items():
            if marker in cols:
                extra = cols - allowed
                assert not extra, f"scan reads unpruned columns {extra}; ReadSchema={cols}"
    return plan


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> str:
    plan = plan_string(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= min_count, f"expected ≥{min_count} broadcast joins, plan:\n{plan}"
    return plan


def assert_no_cartesian(df: DataFrame) -> str:
    plan = plan_string(df)
    assert "CartesianProduct" not in plan, f"unexpected CartesianProduct:\n{plan}"
    return plan


def assert_take_ordered(df: DataFrame) -> str:
    """orderBy+limit must fuse into TakeOrderedAndProject (per-partition
    heaps + driver merge — the reference's TopK operator, distributed)."""
    plan = plan_string(df)
    assert "TakeOrderedAndProject" in plan, f"no TakeOrderedAndProject:\n{plan}"
    return plan


def assert_whole_stage_codegen(df: DataFrame) -> str:
    """Codegen spans render as '*(n) Operator' in simple mode, and only
    once AQE has finalized the plan — so execute first (tests run at
    small SF), then inspect the final plan."""
    df.collect()
    plan = plan_string(df, "simple")
    assert re.search(r"\*\(\d+\)", plan) or "WholeStageCodegen" in plan, (
        f"no codegen spans:\n{plan}"
    )
    return plan


def count_shuffle_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators (hash/range/roundrobin) in
    the physical plan — BroadcastExchange excluded. The scale currency:
    each one is a full network redistribution of its input at 100 TB."""
    return len(re.findall(r"\(\d+\) Exchange\b", plan_string(df)))


def broadcast_subtrees(df: DataFrame) -> list[str]:
    """The text subtree under each BroadcastExchange in the simple-mode
    plan (tree glyphs ':-', '+-', ':', '   ' encode depth as marker
    column). Lets tests reason about WHAT is being broadcast."""
    lines = plan_string(df, "simple").splitlines()

    def depth(line: str) -> int:
        m = re.search(r"[+:]-", line)
        return m.start() if m else -1

    out = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        d = depth(line)
        sub = [line]
        for nxt in lines[i + 1:]:
            nd = depth(nxt)
            if 0 <= nd <= d:
                break
            sub.append(nxt)
        out.append("\n".join(sub))
    return out


def assert_broadcasts_are_dimension_bounded(
    df: DataFrame, fact_marker: str, dim_marker: str
) -> None:
    """Scale guard: any broadcast side that reads the fact table must
    have been reduced by a join/semi-join with the dimension first —
    broadcasting an unfiltered fact aggregate is the classic plan that
    works at sf0.1 and OOMs at 100× (VERDICT r1 item 3)."""
    subs = broadcast_subtrees(df)
    assert subs, "expected at least one BroadcastExchange"
    for sub in subs:
        if fact_marker in sub:
            assert dim_marker in sub, (
                f"broadcast side reads the fact ({fact_marker}) without the "
                f"dimension reduction ({dim_marker}):\n{sub}"
            )
