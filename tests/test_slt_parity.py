"""sqllogictest corpus parity (reference's primary correctness gate).

Executes the reference's own ``.slt`` files —
``datafusion-greatest/datafusion/sqllogictest/test_files/*.slt`` — against
Spark SQL via tools/slt_runner.py and pins the resulting census: exact
matched-block counts and the exact set of divergent blocks, each with a
named, verified cause. Mirrors the TPC-DS execution differential's
methodology (tests/test_tpcds_execution.py): the reference SQL is
consumed read-only at test time; parity is a measured number.

Census buckets (see tools/slt_runner.py docstring):
- match            — slt-exact (order-sensitive where the file demands)
- match_unordered  — same result multiset; ordering differs only where
                     the SQL leaves it underdetermined (ORDER BY ties,
                     engine default NULL ordering: DataFusion sorts
                     NULLS LAST for ASC, Spark NULLS FIRST — both are
                     implementation-defined per the standard)
- match_rowcount   — LIMIT without total order: which rows make the cut
                     is engine-defined; the count is the comparable part
- mismatch         — pinned named divergences, asserted EXACTLY (a new
                     mismatch, or one silently vanishing, fails the test)

Pinned divergences and their verified causes:

- joins.slt:833  — ns-precision collision: the fixture holds three
  timestamps distinct only in nanoseconds (…190213133/134/135); Spark
  timestamps are µs (repo-wide ns→µs truncation policy, SURVEY §1.2),
  so the self-join on time yields 9 rows, DataFusion's ns join 3.
- joins.slt:3605 — DataFusion v42 returns the NULL-keyed left row from
  ``x NOT IN (subquery whose result contains NULL)``; ANSI three-valued
  logic says no row qualifies. Spark returns the empty set, and DuckDB
  agrees (verified in-session) — the reference diverges from the
  standard here, not this engine.
"""

from __future__ import annotations

import os
import re
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from slt_runner import REF_SLT, SltRunner  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SLT), reason="reference slt corpus not present"
)

# file → exact census pins. "content_min" guards the three match buckets
# combined (exact counts for the buckets individually are pinned too —
# keep both so a regression names the bucket that moved).
PINNED = {
    "joins.slt": {
        "match": 82,
        "match_unordered": 19,
        "match_rowcount": 3,
        "mismatch": {"833", "3605"},
    },
}


@pytest.fixture(scope="module")
def slt_spark(spark):
    return spark


@pytest.mark.parametrize("fname", sorted(PINNED))
def test_slt_file_parity(slt_spark, fname):
    pins = PINNED[fname]
    db = "slt_" + re.sub(r"[^a-z0-9]", "_", fname.lower())
    runner = SltRunner(slt_spark, db=db)
    census = runner.run_file(os.path.join(REF_SLT, fname))
    assert set(census.mismatch) == pins["mismatch"], (
        f"{fname}: divergence set changed: {sorted(census.mismatch)} "
        f"(pinned {sorted(pins['mismatch'])})"
    )
    for bucket in ("match", "match_unordered", "match_rowcount"):
        assert getattr(census, bucket) == pins[bucket], (
            f"{fname}: {bucket} = {getattr(census, bucket)}, pinned {pins[bucket]} "
            f"(summary: {census.summary()})"
        )
