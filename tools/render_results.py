#!/usr/bin/env python
"""Render the measured-results markdown from the committed artifacts.

Reads RESULTS_r03.json (tuned matrix), RESULTS_r03_parity.json (reference
hyperparameters), and optionally BENCH_PARTIAL/SCALING/GATHER_BENCH JSONs,
and prints the README "Measured results" tables — so the README can only
ever quote driver-captured artifacts (VERDICT r2: one provenance).
"""

from __future__ import annotations

import json
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def load(name):
    p = ROOT / name
    return json.loads(p.read_text()) if p.exists() else None


def fmt_combo(r):
    if "error" in r:
        return None
    runs = r.get("per_run_solved", [])
    spread = (max(runs) - min(runs)) if runs else 0
    return {
        "combo": f"{r['robot']}/{r['problemset']}",
        "success": r["success_rate"],
        "runs": runs,
        "spread": spread,
        "restarts": r.get("restarts"),
        "adaptive": r.get("adaptive_rounds_used"),
        "steady_s": r.get("steady_batch_seconds"),
        "compile_s": r.get("compile_plus_first_seconds"),
        "problems": r["problems"],
    }


def main() -> None:
    tuned = load("RESULTS_r03.json") or []
    parity = {}
    for r in load("RESULTS_r03_parity.json") or []:
        if "error" not in r:
            parity[(r["robot"], r["problemset"])] = r

    rows = [f for f in (fmt_combo(r) for r in tuned) if f]
    print("| combo | problems | tuned success (execution metric) | parity success | per-run solved | steady s/run | compile s |")
    print("|---|---|---|---|---|---|---|")
    tot_p = tot_s = tot_ps = 0.0
    for f in rows:
        key = tuple(f["combo"].split("/"))
        par = parity.get(key)
        ps = par["success_rate"] if par else float("nan")
        tot_p += f["problems"]
        tot_s += f["success"] * f["problems"]
        tot_ps += (ps if ps == ps else 0) * f["problems"]
        print(
            f"| {f['combo']} | {f['problems']} | **{f['success']:.3f}** | "
            f"{ps:.3f} | {f['runs']} | {f['steady_s']} | {f['compile_s']} |"
        )
    if tot_p:
        print(
            f"| **total** | {int(tot_p)} | **{tot_s / tot_p:.3f}** | "
            f"{tot_ps / tot_p:.3f} | | | |"
        )

    bench = load("BENCH_PARTIAL.json")
    if bench:
        print()
        print(f"bench.py: {bench.get('value')} {bench.get('unit')} "
              f"(vs_baseline {bench.get('vs_baseline')}x, success "
              f"{bench.get('success_rate')})")
    scaling = load("SCALING_r03.json")
    if scaling:
        print()
        print("batch scaling (franka/industrial, full budget):")
        for row in scaling.get("rows", scaling if isinstance(scaling, list) else []):
            print(f"  B={row['batch']}: {row['solves_per_sec']} solves/s "
                  f"({row['ms_per_problem']} ms/problem)")


if __name__ == "__main__":
    main()
