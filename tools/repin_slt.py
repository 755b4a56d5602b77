"""Regenerate tests/test_slt_parity.py's PINNED census from a
clean-scratch run of the whole corpus against HEAD's slt_runner.

Process (the one used at commits 4d88d3e/388a639): run every file in
the current PINNED table, record (content, deterministic mismatch
lines), subtract the UNDERDETERMINED blocks, and print

  * a ready-to-paste PINNED dict,
  * a per-file diff vs the currently-pinned values,
  * the new TOTAL_CONTENT_FLOOR.

Every HARNESS change (tools/slt_runner.py) must re-run this and land
the refreshed table in the same commit — r4's snapshot commit 9123426
skipped it and left 4 parity tests red at HEAD (VERDICT r4 #1).

Usage: python tools/repin_slt.py [file.slt ...]   (default: all pinned)
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rust_query_engine_greatest_spark.session import get_spark  # noqa: E402
from slt_runner import REF_SLT, SltRunner  # noqa: E402


def main() -> None:
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
    )
    from test_slt_parity import PINNED, UNDERDETERMINED

    spark = get_spark("slt-repin", cpus=8)
    only = sys.argv[1:]
    files = only or sorted(PINNED)
    new_pinned: dict[str, tuple[int, set[int]]] = {}
    total_floor = 0
    for fname in files:
        runner = SltRunner(
            spark, db="repin_" + re.sub(r"[^a-z0-9]", "_", fname.lower())
        )
        cen = runner.run_file(os.path.join(REF_SLT, fname))
        under = UNDERDETERMINED.get(fname, set())
        observed = {str(x) for x in cen.mismatch}
        det = observed - {str(u) for u in under}
        content = cen.match + cen.match_unordered + cen.match_rowcount
        floor = content - len(under & observed) - len(under - observed)
        # floor = measured content minus room for every underdetermined
        # block to flip to mismatch on a later run
        floor = content - len(under)
        new_pinned[fname] = (max(floor, 0), det)
        total_floor += max(floor, 0)
        old_floor, old_det = PINNED.get(fname, (None, set()))
        old_det = {str(x) for x in old_det}
        if old_floor != max(floor, 0) or old_det != det:
            print(
                f"# CHANGED {fname}: content {old_floor}->{max(floor,0)} "
                f"+lines {sorted(det - old_det)} -lines {sorted(old_det - det)}",
                flush=True,
            )
        print(json.dumps(cen.summary()), flush=True)

    print("\nPINNED = {")
    for fname in sorted(new_pinned):
        floor, det = new_pinned[fname]
        lines = ", ".join(
            x if x.isdigit() else repr(x)
            for x in sorted(det, key=lambda v: (not v.isdigit(),
                                                int(v) if v.isdigit() else 0,
                                                v)))
        print(f'    "{fname}": ({floor}, {{{lines}}}),' if det
              else f'    "{fname}": ({floor}, set()),')
    print("}")
    print(f"# TOTAL_CONTENT_FLOOR = {total_floor}")


if __name__ == "__main__":
    main()
