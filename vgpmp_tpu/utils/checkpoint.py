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

__all__ = ["save_solver_state", "restore_solver_state"]


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
