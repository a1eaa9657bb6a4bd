"""Tuned-overlay schema guard: every problemset's ``planner_params_tuned``
must parse and wire cleanly through the benchmark path.

The benchmark matrix (``benchmarking.py --all``) consumes these overlays
blindly; a typo'd init name or a key the session ignores would silently run
the wrong configuration. This test loads every robot x environment combo
both raw and tuned and asserts the overlay only touches known knobs, the
restart init names resolve, and the budget keys (steps/samples/inducing)
are never changed by the overlay (tuning must stay within the reference's
compute envelope per restart; ``data/problemsets/*.planner_params``).
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

ASSETS = Path(__file__).resolve().parent.parent / "vgpmp_tpu" / "assets" / "problemsets"

# keys an overlay may override (schedule / restart / init-hyperparameter
# knobs) — NOT the optimizer budget. ``epsilon`` (the hinge safety margin)
# is tunable like the reference tunes it per problemset
# (``data/problemsets/*.planner_params``); it shapes the objective, not the
# compute budget.
TUNABLE = {
    "lr_peak", "warmup_steps", "sigma_anneal", "q_mu_inits",
    "lengthscales", "variance", "sigma_obs", "antithetic", "epsilon",
    # execution knob, not an optimizer knob: restarts per XLA program
    # (K=6 x B=55 x M>=15 ensembles fault the 16G chip; these combos chunk 3)
    "max_restarts_per_program",
    # the reference's training_loop(randomize=True) — same step budget,
    # redrawn time grid per restart member
    "randomize_timesteps",
}
BUDGET = {"num_steps", "num_samples", "num_inducing", "num_bases"}
KNOWN_INITS = {"linear", "zeros", "waypoint"}


def _combos():
    for path in sorted(ASSETS.glob("*.json")):
        data = json.loads(path.read_text())
        for env, ps in data.items():
            yield path.stem, env, ps


@pytest.mark.parametrize("robot,env,ps", list(_combos()),
                         ids=lambda v: v if isinstance(v, str) else "")
def test_overlay_schema(robot, env, ps):
    tuned = ps.get("planner_params_tuned")
    if tuned is None:
        return
    extra = set(tuned) - TUNABLE
    assert not extra, f"{robot}/{env}: overlay touches non-tunable keys {extra}"
    assert not (set(tuned) & BUDGET), f"{robot}/{env}: overlay changes the budget"
    for name in tuned.get("q_mu_inits", []):
        ok = name in KNOWN_INITS or (
            name.startswith(("rand", "frand"))
            and name.removeprefix("frand").removeprefix("rand").isdigit()
        )
        assert ok, f"{robot}/{env}: unknown q_mu init {name!r}"
    if "lengthscales" in tuned:
        ref = ps["planner_params"]["lengthscales"]
        assert len(tuned["lengthscales"]) == len(ref)


def test_tuned_sessions_build_and_init():
    """Every tuned combo builds a session and an ensemble init pytree with
    the overlay's K restarts (exercises restart_waypoints name parsing)."""
    import jax.numpy as jnp

    from vgpmp_tpu.engine import solver
    from vgpmp_tpu.session import PlanningSession

    for robot, env, ps in _combos():
        tuned = ps.get("planner_params_tuned")
        if not tuned or "q_mu_inits" not in tuned:
            continue
        sess = PlanningSession(robot, env, dtype=jnp.float64, sdf_mode="nearest")
        inits = tuple(sess.planner_params["q_mu_inits"])
        starts, goals = sess.queries()
        params_kb = solver.init_ensemble(
            sess.model, starts[:2], goals[:2], sess.planner_params, inits=inits
        )
        assert params_kb.q_mu.shape[:2] == (len(inits), 2), (robot, env)
