"""Matrix-driver loop behavior: incremental flush + per-combo containment.

The round-2 postmortem (VERDICT r2 Missing #1) is that evidence must survive
partial failure: ``benchmarking.py --all`` flushes its JSON after every combo
and records a failed combo as an ``error`` row instead of dying (a TPU device
fault poisons the process, so later combos fail fast but earlier results
must persist). These tests drive ``main()`` with a stubbed ``run_combo``.
"""

import json
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import benchmarking


def _run_main(monkeypatch, tmp_path, fake_run_combo, argv_extra=()):
    out = tmp_path / "results.json"
    monkeypatch.setattr(benchmarking, "run_combo", fake_run_combo)
    monkeypatch.setattr(
        sys, "argv",
        ["benchmarking.py", "--all", "--runs", "1", "--json-out", str(out),
         *argv_extra],
    )
    benchmarking.main()
    return json.loads(out.read_text())


def test_all_combos_flushed(monkeypatch, tmp_path):
    seen = []

    def fake(robot, ps, runs, sdf_mode, seed, use_tuned=True,
             max_restarts_per_program=6, adaptive_rounds=0):
        seen.append((robot, ps))
        return {"robot": robot, "problemset": ps, "problems": 2,
                "avg_solved": 1.0, "success_rate": 0.5}

    rows = _run_main(monkeypatch, tmp_path, fake)
    assert [(r["robot"], r["problemset"]) for r in rows] == benchmarking.ALL_COMBOS
    assert seen == benchmarking.ALL_COMBOS


def test_mid_matrix_failure_contained(monkeypatch, tmp_path):
    """A combo that raises becomes an error row; the rest still run."""

    def fake(robot, ps, runs, sdf_mode, seed, use_tuned=True,
             max_restarts_per_program=6, adaptive_rounds=0):
        if (robot, ps) == ("kuka", "bookshelves"):
            raise RuntimeError("TPU device error (synthetic)")
        return {"robot": robot, "problemset": ps, "problems": 2,
                "avg_solved": 2.0, "success_rate": 1.0}

    rows = _run_main(monkeypatch, tmp_path, fake)
    assert len(rows) == len(benchmarking.ALL_COMBOS)
    errs = [r for r in rows if "error" in r]
    assert len(errs) == 1
    assert errs[0]["robot"] == "kuka" and errs[0]["problemset"] == "bookshelves"
    assert "TPU device error" in errs[0]["error"]
    # every other combo has real numbers
    assert all(r["success_rate"] == 1.0 for r in rows if "error" not in r)


def test_all_failed_exits_cleanly(monkeypatch, tmp_path):
    def fake(*a, **k):
        raise RuntimeError("poisoned")

    rows = _run_main(monkeypatch, tmp_path, fake)
    assert len(rows) == len(benchmarking.ALL_COMBOS)
    assert all("error" in r for r in rows)
