"""sqllogictest corpus parity (the reference's primary correctness gate).

Executes 46 of the reference's own ``.slt`` files —
``datafusion-greatest/datafusion/sqllogictest/test_files/*.slt`` — against
Spark SQL via tools/slt_runner.py and pins the census: **2,098
content-verified query blocks** and the exact set of **114 divergent
blocks**, each with a named, verified cause. Mirrors the TPC-DS
execution differential's methodology (tests/test_tpcds_execution.py):
the reference SQL is consumed read-only at test time; parity is a
measured number, not a claim.

Census buckets (tools/slt_runner.py): ``match`` (slt-exact),
``match_unordered`` (same multiset; order differs only where the SQL
leaves it underdetermined — ORDER BY ties, engine default NULL sort:
DataFusion NULLS LAST for ASC, Spark NULLS FIRST, both standard-legal),
``match_rowcount`` (LIMIT without total order — only the count is
cross-engine comparable), ``mismatch`` (pinned divergences).

Pinned divergence families (every pinned line belongs to one):

1.  **Integer division / numeric-literal typing** — DataFusion ``/`` on
    integers truncates (Arrow); Spark yields DOUBLE, and Spark types
    the literal ``2.0`` as DECIMAL where DataFusion uses f64.
    group_by 445/473/655/770/1329; select 1552; scalar 509/554/590/
    597/1461.
2.  **NaN sign & null totality** — Spark has no negative NaN and NaN
    sorts greatest; ``isnan(NULL)`` is false in Spark, NULL in
    DataFusion; ``nanvl`` NULL-propagates in DataFusion only.
    select 572; math 104/109; scalar 626/655/661; predicates
    324/338/352/357.
3.  **log domain** — Spark returns NULL for log/ln/log10/log2 of 0 or
    negatives; DataFusion returns -Infinity / NaN.
    scalar 467/473/516/531/561/567/603.
4.  **Nanosecond / per-unit timestamp precision** — Spark has a single
    µs-precision timestamp (repo ns→µs policy, SURVEY §1.2); Arrow has
    s/ms/µs/ns units with type-level truncation. joins 833 (ns-distinct
    values collide at µs in a self-join); aggregate 4112/4141/4146/
    4153/4158/4184 (ms/s lanes don't truncate at type level here).
5.  **Reference deviations from ANSI, verified against DuckDB** —
    joins 3605 (``x NOT IN (subquery with NULL)`` returns the
    NULL-keyed row in DataFusion; ANSI/Spark/DuckDB return empty);
    case 45/56 (DataFusion v42 takes the THEN branch on a NULL CASE
    condition; ANSI/Spark/DuckDB fall through to ELSE).
6.  **Collect-aggregate NULL/empty semantics** — Spark's
    array_agg/collect_list drop NULL inputs and return [] on empty
    input; DataFusion keeps NULLs and returns NULL.
    aggregate 213/2919-3014 block.
7.  **Integer median** — DataFusion returns the lower-middle integer;
    Spark interpolates. aggregate 783/795.
8.  **String-function edges** — negative-length LEFT/RIGHT/SUBSTR
    (Postgres drop-last-n semantics vs Spark's empty/from-end):
    functions 21/26/96/141, string files 142/527/547, string_literal
    18/66; OVERLAY length-edge handling: functions 623/635/648/660;
    TRANSLATE duplicate source char (last-wins vs first-wins): string
    files 260; ``chr`` beyond Latin-1: expr 402; regexp_replace
    replaces first match in DataFusion (PG), all in Spark: regexp 372.
9.  **Array-function semantics** — recursive cardinality/flatten vs
    Spark's top-level-only; array_remove first-occurrence vs Spark
    all; array_append/except/intersect NULL-operand handling and
    result element order; array_join's double→string rendering.
    array.slt set.
10. **Zone-embedded truncation** — Arrow timestamps carry a zone and
    date_trunc works in it; Spark timestamps are zoneless instants
    truncated in the session zone (UTC). timestamps 1332/1416.
11. **Parse/precedence dialect** — ``interval '5' hours`` (the suffix
    is an alias in DataFusion/PG, a unit in Spark): interval 83;
    ``^``/``>>`` operator precedence: scalar 1059; engine-default NULL
    ordering interacting with a LIMIT boundary (NULLS FIRST admits the
    all-NULL group into the top-k): aggregates_topk 78/201.
12. **Insertion-order-dependent results** (UNDERDETERMINED — the value
    depends on scan order neither engine promises; these blocks may
    match or mismatch run to run and are allowed either way):
    aggregate 3027/5436/5495 (array_agg/string_agg output order),
    group_by 3722/3737 (LAST_VALUE as a plain aggregate),
    window 4336/4343/4350/4476 (first/last_value over an unordered
    window).
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

# file → (content_floor, deterministic divergence lines).
# content = match + match_unordered + match_rowcount. The floor is the
# measured content minus the file's underdetermined-block count (an
# underdetermined block that flips to mismatch lowers content by 1).
PINNED = {
    "aggregate.slt": (194, {213, 783, 795, 2919, 2924, 2929, 2934, 2949,
                            2954, 2969, 2989, 2994, 2999, 3004, 3009, 3014,
                            4112, 4141, 4146, 4153, 4158, 4184}),
    "array.slt": (78, {2365, 4159, 4307, 4323, 4341, 4377, 4428, 4450,
                       4480, 4505, 4530, 4555, 5653, 5720, 5738, 6346,
                       6369, 6408, 6429, 6696}),
    "array_query.slt": (3, set()),
    "case.slt": (8, {45, 56}),
    "cast.slt": (8, set()),
    "coalesce.slt": (15, set()),
    "cte.slt": (13, set()),
    "dates.slt": (9, set()),
    "decimal.slt": (3, set()),
    "string/dictionary_utf8.slt": (32, {142, 260, 527, 547}),
    "expr.slt": (179, {402}),
    "functions.slt": (75, {21, 26, 96, 141, 623, 635, 648, 660}),
    "group.slt": (5, set()),
    "group_by.slt": (314, {445, 473, 655, 770, 1329}),
    "interval.slt": (27, {83}),
    "join.slt": (67, set()),
    "joins.slt": (104, {833, 3605}),
    "string/large_string.slt": (33, {142, 260, 527, 547}),
    "limit.slt": (19, set()),
    "math.slt": (21, {104, 109}),
    "nullif.slt": (8, set()),
    "order.slt": (27, set()),
    "predicates.slt": (29, {324, 338, 352, 357}),
    "regexp.slt": (29, {372}),
    "scalar.slt": (167, {467, 473, 509, 516, 531, 554, 561, 567, 590,
                         597, 603, 626, 655, 661, 1059, 1461}),
    "select.slt": (75, {572, 1552}),
    "sort_merge_join.slt": (45, set()),
    "string/string.slt": (32, {142, 260, 527, 547}),
    "string/string_literal.slt": (94, {18, 66}),
    "string/string_view.slt": (41, {142, 260, 527, 547}),
    "struct.slt": (24, set()),
    "subquery.slt": (28, set()),
    "timestamps.slt": (125, {1332, 1416}),
    "union.slt": (17, set()),
    "unnest.slt": (18, {209, 539}),
    "window.slt": (62, set()),
    # second tranche (surveyed after the initial 36)
    "type_coercion.slt": (7, set()),
    "binary.slt": (5, set()),
    "aggregates_topk.slt": (10, {78, 201}),
    "strings.slt": (10, set()),
    "projection.slt": (6, set()),
    "nvl.slt": (8, set()),
    "nvl2.slt": (8, set()),
    "topk.slt": (3, set()),
    "grouping.slt": (2, set()),
    "wildcard.slt": (2, set()),
}

# family 12 — blocks whose verdict legitimately varies run to run
UNDERDETERMINED = {
    "aggregate.slt": {3027, 5436, 5495},
    "group_by.slt": {3722, 3737},
    "window.slt": {4336, 4343, 4350, 4476},
}

# measured 2,098 content blocks / 114 divergences on the pinning run;
# the suite-level floor leaves room only for underdetermined flips
TOTAL_CONTENT_FLOOR = 2085


_totals = {"content": 0}


@pytest.mark.parametrize("fname", sorted(PINNED))
def test_slt_file_parity(spark, fname):
    floor, det = PINNED[fname]
    under = UNDERDETERMINED.get(fname, set())
    db = "slt_" + re.sub(r"[^a-z0-9]", "_", fname.lower())
    runner = SltRunner(spark, db=db)
    census = runner.run_file(os.path.join(REF_SLT, fname))
    observed = {int(x) for x in census.mismatch}
    unexpected = observed - det - under
    vanished = det - observed
    assert not unexpected, (
        f"{fname}: NEW divergences {sorted(unexpected)} — "
        f"summary {census.summary()}"
    )
    assert not vanished, (
        f"{fname}: pinned divergences no longer reproduce "
        f"{sorted(vanished)} — re-pin with the corrected census"
    )
    content = census.match + census.match_unordered + census.match_rowcount
    _totals["content"] += content
    assert content >= floor, (
        f"{fname}: content-verified blocks fell to {content} "
        f"(floor {floor}) — summary {census.summary()}"
    )


def test_slt_total_content_floor():
    # runs last (alphabetical param order precedes this plain test in
    # file order); only meaningful when the whole module ran
    if _totals["content"]:
        assert _totals["content"] >= TOTAL_CONTENT_FLOOR, _totals
