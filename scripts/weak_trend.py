"""Weak-scaling TREND: the 4-vs-16-core weak-scaling pair at multiple
per-core graph sizes (VERDICT r2 #9).

The single-point weak-scaling number is floor-sensitive: at small
edges/core the constant per-stage latency is a visible fraction of each
iteration. Running the same pair at 2x the per-core size shows whether
efficiency rises as the floor amortizes — the direction the 10^12-page
regime extrapolates toward. Writes BENCH_WEAK_TREND.json; the table is
appended to BENCH.md by hand (the main orchestrator regenerates BENCH.md
wholesale and would clobber round notes).

Usage: python scripts/weak_trend.py   (env: TREND_VPCS=1500000,3000000
TREND_REPS=2 SCALE_CORES=4,16)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from scaling_bench import _one, _cpu_calibration, CORE_LEVELS  # noqa: E402

VPCS = tuple(
    int(v) for v in os.environ.get("TREND_VPCS", "1500000,3000000").split(",")
)
REPS = int(os.environ.get("TREND_REPS", "2"))

# the 3M-vpc × 16-core leg (48M vertices / 96M edges) OOMs the 16g
# default heap during localCheckpoint; use one larger heap for every
# trend leg so each 4-vs-16 pair stays like-for-like
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")


def main() -> None:
    lo, hi = CORE_LEVELS
    out: dict = {"core_levels": list(CORE_LEVELS), "reps": REPS, "points": []}
    for vpc in VPCS:
        runs: dict[int, list[dict]] = {c: [] for c in CORE_LEVELS}
        for rep in range(REPS):
            for cores in CORE_LEVELS:
                r = _one(cores, vpc * cores, with_etl=False)
                runs[cores].append(r)
                print(
                    f"vpc={vpc:,} rep{rep} cores={cores}: "
                    f"{r['pr_wall_sec']}s ({r['pr_edges_per_sec']:,.0f} e/s, "
                    f"{r['n_edges']:,} edges, cal {r['cal_ops_per_sec']:,.0f})",
                    flush=True,
                )
        med = lambda c, k: statistics.median(x[k] for x in runs[c])  # noqa: E731
        t_lo, t_hi = med(lo, "pr_wall_sec"), med(hi, "pr_wall_sec")
        cal_ratio = med(hi, "cal_ops_per_sec") / med(lo, "cal_ops_per_sec")
        point = {
            "vertices_per_core": vpc,
            "n_edges": {str(c): runs[c][0]["n_edges"] for c in CORE_LEVELS},
            "wall_sec": {str(lo): t_lo, str(hi): t_hi},
            "throughput_edges_per_sec": {
                str(c): med(c, "pr_edges_per_sec") for c in CORE_LEVELS
            },
            "scaling_efficiency": round(t_lo / t_hi, 3),
            "hw_supply_ratio": round(cal_ratio, 3),
            "efficiency_vs_available_cpu": round(
                (med(hi, "pr_edges_per_sec") / med(lo, "pr_edges_per_sec"))
                / cal_ratio,
                3,
            ),
            "raw": {str(c): runs[c] for c in CORE_LEVELS},
        }
        out["points"].append(point)
        print(json.dumps({k: v for k, v in point.items() if k != "raw"}),
              flush=True)
    # merge with any prior trend file: a re-run of one vpc point replaces
    # that point and keeps the others (points are keyed by vertices/core)
    path = REPO / "BENCH_WEAK_TREND.json"
    if path.exists():
        prior = json.loads(path.read_text())
        if prior.get("core_levels") == out["core_levels"]:
            new_vpcs = {p["vertices_per_core"] for p in out["points"]}
            kept = [
                p for p in prior.get("points", [])
                if p["vertices_per_core"] not in new_vpcs
            ]
            out["points"] = sorted(
                kept + out["points"], key=lambda p: p["vertices_per_core"]
            )
    path.write_text(json.dumps(out, indent=1))
    print("WROTE BENCH_WEAK_TREND.json")


if __name__ == "__main__":
    main()
