#!/usr/bin/env python
"""Apply TUNE_EXEC_* results to the problemset tuned overlays.

For each combo with one or more ``TUNE_EXEC_<robot>_<env>*.json`` files
(produced by ``tools/tune_execution.py``), picks the best row (highest
``union_executed``) across files, and writes into
``vgpmp_tpu/assets/problemsets/<robot>.json``'s ``planner_params_tuned``:

- ``q_mu_inits``: the greedy-selected init subset, padded with the best
  remaining per-init performers up to ``--target-k`` (matrix runs are
  multi-seed; inits beyond the tuning seed's greedy cover add union on
  held-out seeds). Since round 4 the list is an ordered *preference* for the
  adaptive restart engine (``solver.solve_adaptive``) — round 0 uses the
  first entry for every problem, later rounds cycle the rest over unsolved
  problems only — so no chunk-multiple rounding applies (every XLA program
  is ``[B]``-shaped regardless of K, and a fully-solved combo just stops
  after round 0/1);
- the winning row's overrides (epsilon / sigma_anneal / ...), EXACTLY: any
  tunable override key previously written by an earlier tuning round that
  the new winning row does NOT carry is removed, so the committed overlay
  always reproduces the configuration that measured the recorded
  ``union_executed`` (advisor r3 finding: overrides were only ever added).

Prints a before/after summary; ``--dry-run`` to preview.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
ASSETS = ROOT / "vgpmp_tpu" / "assets" / "problemsets"
ROBOTS = ("franka", "kuka", "wam", "ur10")


def best_row(files: list[Path]) -> tuple[dict, Path, set]:
    """Best row by union_executed, plus the set of every override key any
    row in any file has touched (the 'tunable key' universe for cleanup)."""
    rows = []
    touched: set = set()
    for f in files:
        for row in json.loads(f.read_text()):
            rows.append((row, f))
            touched |= set(row.get("overrides", {}))
    row, src = max(rows, key=lambda rf: rf[0]["union_executed"])
    return row, src, touched


def chosen_inits(row: dict, target_k: int) -> list[str]:
    subset = [name for name, _ in row["greedy_subset"]]
    ranked = sorted(
        (n for n in row["per_init_executed"] if n not in subset),
        key=lambda n: -row["per_init_executed"][n],
    )
    if row["union_executed"] >= 0.999:
        # fully solved at the tuning seed: keep the list short (greedy + 1
        # spare for held-out seeds) — the adaptive engine stops early anyway
        k = min(max(len(subset) + 1, 3), max(target_k, 3))
    else:
        k = max(target_k, len(subset))
    return (subset + ranked)[:k]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--target-k", type=int, default=6)
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    for robot in ROBOTS:
        path = ASSETS / f"{robot}.json"
        data = json.loads(path.read_text())
        changed = False
        for env, ps in data.items():
            files = sorted(ROOT.glob(f"TUNE_EXEC_{robot}_{env}*.json"))
            if not files:
                continue
            row, src, touched = best_row(files)
            tuned = ps.setdefault("planner_params_tuned", {})
            inits = chosen_inits(row, args.target_k)
            print(
                f"{robot}/{env}: union {row['union_executed']:.4f} "
                f"({src.name}, overrides {row['overrides']})\n"
                f"  inits {tuned.get('q_mu_inits')} -> {inits}"
            )
            if tuned.get("q_mu_inits") != inits:
                tuned["q_mu_inits"] = inits
                changed = True
            # stale-key cleanup: drop tunable keys the winning row didn't use
            for k in touched - set(row["overrides"]):
                if k in tuned:
                    print(f"  {k} {tuned[k]} -> (removed; not in winning row)")
                    del tuned[k]
                    changed = True
            for k, v in row["overrides"].items():
                if tuned.get(k) != v:
                    print(f"  {k} {tuned.get(k)} -> {v}")
                    tuned[k] = v
                    changed = True
        if changed and not args.dry_run:
            path.write_text(json.dumps(data, indent=1))
            print(f"  wrote {path}")


if __name__ == "__main__":
    main()
