"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Mirrors the reference's bench protocol (`benchmarks/bench.sh run tpch`,
per-query wall ms, BASELINE.md) at the driver's TESTDATA scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

from rust_query_engine_greatest_spark.queries import REGISTRY
from rust_query_engine_greatest_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ITERS = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "2"))


def bench_names() -> list[str]:
    names = [n for n in sorted(REGISTRY) if n.startswith("tpch_")]
    extra = [n for n in sorted(REGISTRY) if REGISTRY[n].tags and "bench" in REGISTRY[n].tags]
    return names + [n for n in extra if n not in names]


def main() -> None:
    spark = get_spark(app_name="bench")
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    times: dict[str, float] = {}
    for name in bench_names():
        q = REGISTRY[name]
        try:
            q.build(spark, SF_DIR).count()  # warm (plan + file listing + JIT)
            best = float("inf")
            for _ in range(ITERS):
                t0 = time.perf_counter()
                q.build(spark, SF_DIR).collect()
                best = min(best, time.perf_counter() - t0)
            times[name.replace("tpch_", "")] = round(best, 4)
        except Exception as e:  # keep the bench line emitting even if one query breaks
            print(f"bench {name} failed: {e}", file=sys.stderr)
            times[name.replace("tpch_", "")] = -1.0
    total = round(sum(t for t in times.values() if t > 0), 4)
    print(json.dumps({
        "metric": "tpch_total_best",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
