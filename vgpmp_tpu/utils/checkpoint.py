"""Checkpoint / resume for batched planner state.

The reference has no model-state persistence at all (every problem
re-initializes a fresh model; SURVEY §5 "Checkpoint / resume: None"). This
module provides the TPU-native equivalent the north star asks for: orbax
checkpoints of the batched variational state keyed by problem ids, enabling
warm-started receding-horizon replans and fault-tolerant long runs.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

try:  # orbax is in the image; keep a clear error if a stripped env lacks it
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False

__all__ = [
    "save_solver_state",
    "restore_solver_state",
    "save_train_state",
    "restore_train_state",
]


def _checkpointer():
    if not _HAVE_ORBAX:
        raise RuntimeError("orbax-checkpoint is not available in this environment")
    return ocp.PyTreeCheckpointer()


def save_solver_state(
    path: str | Path,
    params,
    problem_ids: np.ndarray,
    extras: Optional[Dict[str, Any]] = None,
) -> None:
    """Persist a batched ``PlannerParams`` pytree (+ metadata).

    ``problem_ids`` ties each batch row to its (start, goal) query so a
    restore can re-associate warm starts after re-batching.
    """
    payload = {
        "params": jax.tree.map(np.asarray, params),
        "problem_ids": np.asarray(problem_ids),
        "extras": extras or {},
    }
    _checkpointer().save(Path(path).absolute(), payload, force=True)


def restore_solver_state(path: str | Path):
    """Load (params_pytree, problem_ids, extras) saved by :func:`save_solver_state`."""
    restored = _checkpointer().restore(Path(path).absolute())
    return restored["params"], restored["problem_ids"], restored.get("extras", {})


def save_train_state(path: str | Path, state) -> None:
    """Persist a mid-run ``engine.solver.TrainState`` (params + Adam moments +
    schedule step) — fault-tolerant long runs can resume the optimizer loop
    exactly where it stopped (lossless; see tests/test_replan.py)."""
    _checkpointer().save(Path(path).absolute(), jax.tree.map(np.asarray, state), force=True)


def restore_train_state(path: str | Path, template):
    """Restore a ``TrainState`` saved by :func:`save_train_state`.

    ``template`` supplies the pytree structure (e.g. ``init_state(params0)``);
    leaves are restored into it and returned as JAX arrays.
    """
    import jax.numpy as jnp

    restored = _checkpointer().restore(
        Path(path).absolute(), item=jax.tree.map(np.asarray, template)
    )
    return jax.tree.map(jnp.asarray, restored)
