#!/usr/bin/env python
"""Apply TUNE_EXEC_* results to the problemset tuned overlays.

For each combo with one or more ``TUNE_EXEC_<robot>_<env>*.json`` files
(produced by ``tools/tune_execution.py``), picks the best row (highest
``union_executed``) across files, and writes into
``vgpmp_tpu/assets/problemsets/<robot>.json``'s ``planner_params_tuned``:

- ``q_mu_inits``: the greedy-selected init subset, padded with the best
  remaining per-init performers up to ``--target-k`` (matrix runs are
  multi-seed; inits beyond the tuning seed's greedy cover add union on
  held-out seeds), rounded to a multiple of the combo's restart chunk so
  every XLA program in a chunked run shares one compiled shape;
- ``epsilon``: only when the winning row used an epsilon override.

Prints a before/after summary; ``--dry-run`` to preview.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
ASSETS = ROOT / "vgpmp_tpu" / "assets" / "problemsets"
ROBOTS = ("franka", "kuka", "wam", "ur10")


def best_row(files: list[Path]) -> tuple[dict, Path]:
    rows = []
    for f in files:
        for row in json.loads(f.read_text()):
            rows.append((row, f))
    return max(rows, key=lambda rf: rf[0]["union_executed"])


def chosen_inits(row: dict, target_k: int, chunk: int) -> list[str]:
    subset = [name for name, _ in row["greedy_subset"]]
    ranked = sorted(
        (n for n in row["per_init_executed"] if n not in subset),
        key=lambda n: -row["per_init_executed"][n],
    )
    if row["union_executed"] >= 0.999:
        # fully solved at the tuning seed: keep K small (greedy + 1 spare
        # for held-out seeds), no point burning restart chunks
        k = min(max(len(subset) + 1, 3), max(target_k, 3))
    else:
        k = max(target_k, len(subset))
        k = ((k + chunk - 1) // chunk) * chunk  # round up to chunk multiple
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
            row, src = best_row(files)
            tuned = ps.setdefault("planner_params_tuned", {})
            chunk = int(tuned.get("max_restarts_per_program", 6))
            inits = chosen_inits(row, args.target_k, chunk)
            print(
                f"{robot}/{env}: union {row['union_executed']:.4f} "
                f"({src.name}, overrides {row['overrides']})\n"
                f"  inits {tuned.get('q_mu_inits')} -> {inits}"
            )
            if tuned.get("q_mu_inits") != inits:
                tuned["q_mu_inits"] = inits
                changed = True
            for k, v in row["overrides"].items():  # epsilon / sigma_anneal /
                # randomize_timesteps / ... — the winning row's overrides
                if tuned.get(k) != v:
                    print(f"  {k} {tuned.get(k)} -> {v}")
                    tuned[k] = v
                    changed = True
        if changed and not args.dry_run:
            path.write_text(json.dumps(data, indent=1))
            print(f"  wrote {path}")


if __name__ == "__main__":
    main()
