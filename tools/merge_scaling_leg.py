"""Merge extra alternating-rep legs into an existing scaling_minof artifact.

The min-of-k protocol (tools/scaling_minof.py) requires BOTH arms to get the
same number of attempts; this helper therefore only accepts a full lo+hi pair
per invocation, appends the legs to all_times/cpu_seconds, recomputes the
per-arm minima and the wall scaling efficiency, and bumps `reps`.  Keeps the
artifact self-consistent with tests/test_bench_artifacts.py (docs_per_sec
rounded to 1dp, efficiency to 3dp).

Usage: python tools/merge_scaling_leg.py ARTIFACT lo_wall lo_cpu hi_wall hi_cpu
"""

from __future__ import annotations

import json
import sys


def merge(path: str, lo_wall: float, lo_cpu: float, hi_wall: float, hi_cpu: float) -> dict:
    with open(path) as f:
        rec = json.load(f)
    lo, hi = rec["cores_low"], rec["cores_high"]
    rec["all_times"][str(lo)].append(round(lo_wall, 1))
    rec["all_times"][str(hi)].append(round(hi_wall, 1))
    rec["cpu_seconds"][str(lo)].append(round(lo_cpu, 1))
    rec["cpu_seconds"][str(hi)].append(round(hi_cpu, 1))
    rec["reps"] = len(rec["all_times"][str(lo)])
    docs = rec["docs"]
    t_lo = min(rec["all_times"][str(lo)])
    t_hi = min(rec["all_times"][str(hi)])
    rec[f"local{lo}"] = {"sec": t_lo, "docs_per_sec": round(docs / t_lo, 1)}
    rec[f"local{hi}"] = {"sec": t_hi, "docs_per_sec": round(docs / t_hi, 1)}
    rec["scaling_efficiency"] = round((docs / t_hi) / (docs / t_lo) / (hi / lo), 3)
    with open(path, "w") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


if __name__ == "__main__":
    out = merge(sys.argv[1], *(float(a) for a in sys.argv[2:6]))
    print(json.dumps(out, indent=2))
