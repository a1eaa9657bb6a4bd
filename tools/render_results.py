#!/usr/bin/env python
"""Render the measured-results markdown from the committed artifacts.

Reads RESULTS_r0N.json (tuned matrix), RESULTS_r0N_parity.json (reference
hyperparameters), and optionally BENCH_PARTIAL/SCALING/GATHER_BENCH JSONs,
and prints the README "Measured results" tables — so the README can only
ever quote driver-captured artifacts (VERDICT r2: one provenance).

The parity total is computed only over combos that HAVE a parity row
(advisor r3: combos with missing/error parity rows used to count as 0
solved while still widening the denominator); when parity coverage is
incomplete the rendered total says over how many problems it was measured.
"""

from __future__ import annotations

import json
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def load(*names):
    for name in names:
        p = ROOT / name
        if p.exists():
            return json.loads(p.read_text())
    return None


def fmt_combo(r):
    if "error" in r:
        return None
    runs = r.get("per_run_solved", [])
    return {
        "combo": f"{r['robot']}/{r['problemset']}",
        "success": r["success_rate"],
        "runs": runs,
        "k_eff": r.get("k_eff"),
        "adaptive": r.get("adaptive_rounds_used"),
        "steady_s": r.get("steady_batch_seconds"),
        "compile_s": r.get("compile_plus_first_seconds"),
        "problems": r["problems"],
    }


def main() -> None:
    tuned = load("RESULTS_r05.json", "RESULTS_r04.json") or []
    parity = {}
    for r in load("RESULTS_r05_parity.json", "RESULTS_r04_parity.json") or []:
        if "error" not in r:
            parity[(r["robot"], r["problemset"])] = r

    rows = [f for f in (fmt_combo(r) for r in tuned) if f]
    print("| combo | problems | tuned success (execution metric) | parity success | per-run solved | K_eff | steady s/run | compile s |")
    print("|---|---|---|---|---|---|---|---|")
    tot_p = tot_s = 0.0
    par_p = par_s = 0.0  # parity totals over combos WITH a parity row only
    for f in rows:
        key = tuple(f["combo"].split("/"))
        par = parity.get(key)
        tot_p += f["problems"]
        tot_s += f["success"] * f["problems"]
        if par is not None:
            par_p += f["problems"]
            par_s += par["success_rate"] * f["problems"]
            ps_str = f"{par['success_rate']:.3f}"
        else:
            ps_str = "n/a"
        keff = f"{f['k_eff']:.2f}" if f.get("k_eff") else ""
        print(
            f"| {f['combo']} | {f['problems']} | **{f['success']:.3f}** | "
            f"{ps_str} | {f['runs']} | {keff} | {f['steady_s']} | {f['compile_s']} |"
        )
    if tot_p:
        par_str = f"**{par_s / par_p:.3f}**" if par_p else "n/a"
        cover = "" if par_p == tot_p else f" (parity over {int(par_p)})"
        print(
            f"| **total** | {int(tot_p)}{cover} | **{tot_s / tot_p:.3f}** | "
            f"{par_str} | | | | |"
        )
        # the skeptic's numbers (VERDICT r4 weak #8): all-combo aggregate
        # steady throughput over every run, and the compile share of total
        # chip time, straight from the matrix artifact
        runs = [len(f["runs"]) or 1 for f in rows]
        steady_all = sum(f["steady_s"] * n for f, n in zip(rows, runs)
                         if f.get("steady_s"))
        compile_all = sum(f["compile_s"] for f in rows if f.get("compile_s"))
        solved_all = sum(f["problems"] * n for f, n in zip(rows, runs))
        if steady_all:
            print()
            print(f"aggregate (all combos, all runs): {solved_all} problems / "
                  f"{steady_all:.0f} s steady = "
                  f"**{solved_all / steady_all:.2f} solves/s**; "
                  f"compile+first {compile_all:.0f} s = "
                  f"{compile_all / (compile_all + steady_all):.0%} of total "
                  f"chip time")

    bench = load("BENCH_PARTIAL.json")
    if bench:
        print()
        print(f"bench.py: {bench.get('value')} {bench.get('unit')} "
              f"(vs_baseline {bench.get('vs_baseline')}x, success "
              f"{bench.get('success_rate')}, k_eff "
              f"{(bench.get('adaptive') or {}).get('k_eff')})")
    scaling = load("SCALING_r05.json", "SCALING_r04.json")
    if scaling:
        print()
        print("batch scaling (franka/industrial, full budget):")
        for row in scaling.get("rows", scaling if isinstance(scaling, list) else []):
            print(f"  B={row['batch']}: {row['solves_per_sec']} solves/s "
                  f"({row['ms_per_problem']} ms/problem)")


if __name__ == "__main__":
    main()
