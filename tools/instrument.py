"""Per-section wall / own-CPU / external-CPU / loadavg attribution for
the benchmark harnesses (bench.py grew this inline in r8; this module
is the same mechanism factored for tools/tpch_sf1.py and friends).

Why: every cross-round SF1 comparison so far has been re-litigated
because the artifact couldn't distinguish "the engine regressed" from
"the box was busy" (VERDICT r8 'what's wrong' #1: r8 re-records sat
7-24% above r7 at byte-identical plans). Per-section deltas of two
counters settle it in-artifact:

  own_cpu_s = CPU consumed by THIS process tree during the section
  ext_cpu_s = machine-wide busy CPU minus own — ≈ 0 means the section
              ran on an otherwise idle machine (idle-attributable),
              regardless of what loadavg says (loadavg mid-run is
              dominated by our own executors).

Linux /proc only; degrades to zeros anywhere it can't read.
"""

from __future__ import annotations

import os
import time


def cpu_snapshot() -> tuple[float, float]:
    """(machine busy cpu-sec, this process tree cpu-sec) since boot.

    Tree CPU sums utime+stime of live descendants PLUS cutime+cstime
    (already-reaped children) so subprocesses that exit inside a
    section (duckdb, dbgen, compact) stay attributed to us instead of
    inflating ext_cpu_s. A reaped child's time moves from its own
    utime (counted while alive) to the parent's cutime (counted
    after), so section deltas never double-count."""
    try:
        hz = float(os.sysconf("SC_CLK_TCK"))
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        busy = (sum(int(x) for x in parts)
                - int(parts[3]) - int(parts[4])) / hz  # − idle − iowait
        ppid_of: dict[int, int] = {}
        cpu_of: dict[int, float] = {}
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat") as f:
                    rest = f.read().rsplit(")", 1)[1].split()
                ppid_of[int(pid)] = int(rest[1])
                cpu_of[int(pid)] = (int(rest[11]) + int(rest[12])
                                    + int(rest[13]) + int(rest[14])) / hz
            except (OSError, IndexError, ValueError):
                continue
        me = os.getpid()
        own = 0.0
        for pid, cpu in cpu_of.items():
            p, hops = pid, 0
            while p > 1 and hops < 64:
                if p == me:
                    own += cpu
                    break
                p, hops = ppid_of.get(p, 1), hops + 1
        return busy, own
    except Exception:
        return 0.0, 0.0


class SectionTracker:
    """Accumulates named sections; each `end(name)` closes the span
    since the previous boundary. `sections` is JSON-ready."""

    def __init__(self) -> None:
        self.sections: dict[str, dict] = {}
        self._mark = (time.time(), *cpu_snapshot())

    def end(self, name: str) -> None:
        now, busy, own = time.time(), *cpu_snapshot()
        t0, busy0, own0 = self._mark
        self.sections[name] = {
            "wall_s": round(now - t0, 1),
            "own_cpu_s": round(own - own0, 1),
            "ext_cpu_s": round(max(0.0, (busy - busy0) - (own - own0)), 1),
            "load": [round(x, 2) for x in os.getloadavg()],
        }
        self._mark = (now, busy, own)


def idle_gate(threshold: float = 2.0, max_wait_s: float = 240.0) -> float:
    """Bounded wait for the 1-min loadavg to decay below `threshold`
    before starting a timed phase; returns seconds waited. Same
    rationale as bench.py's gate: a recording started while prior work
    drains is the contended number."""
    t0 = time.time()
    waited = 0.0
    while os.getloadavg()[0] > threshold and time.time() - t0 < max_wait_s:
        time.sleep(5)
        waited = round(time.time() - t0, 1)
    return waited
