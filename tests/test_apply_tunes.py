"""apply_tunes: TUNE_EXEC rows -> overlay edits (greedy subset, overrides).

The applier rewrites committed problemset overlays, so its selection rules
are pinned here: best row across files wins, fully-solved combos keep a
small K, every winning-row override (epsilon / sigma_anneal /
randomize_timesteps) lands in the overlay, and stale override keys from
superseded rows are removed (advisor r3: overrides were only ever added, so
the overlay could diverge from the measured configuration). No chunk
rounding anymore: since round 4 ``q_mu_inits`` is an ordered preference
list for the adaptive engine and every program is ``[B]``-shaped.
"""

import importlib.util
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

spec = importlib.util.spec_from_file_location(
    "apply_tunes", ROOT / "tools" / "apply_tunes.py"
)
apply_tunes = importlib.util.module_from_spec(spec)
spec.loader.exec_module(apply_tunes)


def _row(union, subset, per_init, overrides=None):
    return {
        "union_executed": union,
        "greedy_subset": [[n, i + 1] for i, n in enumerate(subset)],
        "per_init_executed": per_init,
        "overrides": overrides or {},
        "unsolved": [],
        "seconds": 1.0,
    }


PER_INIT = {"linear": 0.5, "zeros": 0.2, "waypoint": 0.4, "rand0": 0.45,
            "frand0": 0.55, "frand1": 0.35}


def test_best_row_across_files(tmp_path):
    a = tmp_path / "TUNE_EXEC_franka_industrial.json"
    b = tmp_path / "TUNE_EXEC_franka_industrial_eps.json"
    a.write_text(json.dumps([_row(0.8, ["linear"], PER_INIT)]))
    b.write_text(json.dumps([_row(0.9, ["frand0"], PER_INIT,
                                  {"epsilon": 0.12})]))
    row, src, touched = apply_tunes.best_row([a, b])
    assert row["union_executed"] == 0.9 and src == b
    assert touched == {"epsilon"}  # every override key any row used


def test_chosen_inits_pads_to_target():
    row = _row(0.8, ["frand0", "linear"], PER_INIT)
    inits = apply_tunes.chosen_inits(row, target_k=6)
    assert len(inits) == 6
    assert inits[:2] == ["frand0", "linear"]  # greedy order preserved
    # padding ranked by per-init score: rand0 (0.45) before waypoint (0.4)
    assert inits[2:4] == ["rand0", "waypoint"]

    # a larger greedy subset wins over target_k
    row = _row(0.8, ["frand0", "linear", "rand0", "waypoint"], PER_INIT)
    assert len(apply_tunes.chosen_inits(row, target_k=3)) == 4


def test_fully_solved_keeps_small_k():
    row = _row(1.0, ["frand0"], PER_INIT)
    inits = apply_tunes.chosen_inits(row, target_k=6)
    assert len(inits) == 3  # greedy + spares, not the full target
    assert inits[0] == "frand0"


def test_stale_override_keys_removed(tmp_path, monkeypatch):
    """A key written by a previous round's winning row disappears when the
    new winning row was measured without it."""
    assets = tmp_path / "assets"
    assets.mkdir()
    (assets / "franka.json").write_text(json.dumps({
        "industrial": {
            "planner_params": {"epsilon": 0.05},
            # sigma_anneal came from an older tuning round
            "planner_params_tuned": {"q_mu_inits": ["linear"],
                                     "sigma_anneal": 12.0},
        },
    }))
    (tmp_path / "TUNE_EXEC_franka_industrial_a.json").write_text(json.dumps([
        _row(0.7, ["linear"], PER_INIT, {"sigma_anneal": 12.0}),
    ]))
    (tmp_path / "TUNE_EXEC_franka_industrial_b.json").write_text(json.dumps([
        _row(0.9, ["frand0"], PER_INIT, {"epsilon": 0.12}),  # no sigma_anneal
    ]))
    monkeypatch.setattr(apply_tunes, "ROOT", tmp_path)
    monkeypatch.setattr(apply_tunes, "ASSETS", assets)
    monkeypatch.setattr(apply_tunes, "ROBOTS", ("franka",))
    monkeypatch.setattr(sys, "argv", ["apply_tunes.py"])
    apply_tunes.main()
    tuned = json.loads((assets / "franka.json").read_text())["industrial"][
        "planner_params_tuned"]
    assert "sigma_anneal" not in tuned
    assert tuned["epsilon"] == 0.12


def test_main_writes_overlay(tmp_path, monkeypatch, capsys):
    assets = tmp_path / "assets"
    assets.mkdir()
    (assets / "franka.json").write_text(json.dumps({
        "industrial": {"planner_params": {"epsilon": 0.05},
                       "planner_params_tuned": {"q_mu_inits": ["linear"]}},
    }))
    (tmp_path / "TUNE_EXEC_franka_industrial.json").write_text(json.dumps([
        _row(0.9, ["frand0", "rand0"], PER_INIT,
             {"epsilon": 0.12, "randomize_timesteps": True}),
    ]))
    monkeypatch.setattr(apply_tunes, "ROOT", tmp_path)
    monkeypatch.setattr(apply_tunes, "ASSETS", assets)
    monkeypatch.setattr(apply_tunes, "ROBOTS", ("franka",))
    monkeypatch.setattr(sys, "argv", ["apply_tunes.py"])
    apply_tunes.main()
    tuned = json.loads((assets / "franka.json").read_text())["industrial"][
        "planner_params_tuned"]
    assert tuned["q_mu_inits"][:2] == ["frand0", "rand0"]
    assert len(tuned["q_mu_inits"]) == 6
    assert tuned["epsilon"] == 0.12
    assert tuned["randomize_timesteps"] is True
