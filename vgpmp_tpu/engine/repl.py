"""Interactive debug loop — entry point E of the reference.

Equivalent of ``SimulationManager.loop()``
(``utils/simulation_manager.py:124-152``): a stdin REPL over a *current joint
configuration*, with the same probe commands plus a few the pure-tensor
design makes free. Where the reference reads the pose from the live PyBullet
robot, here the configuration is explicit state you inspect and move.

Commands (one per line):

- ``q``                 quit
- ``c``                 print the current configuration
- ``set J V``           set joint J (0-based) to V radians (clamped to limits)
- ``goto V0 V1 ...``    set the full configuration
- ``sdf``               SDF spatial gradient at every collision sphere
                        (reference ``get_rt_sdf_grad``)
- ``fk``                sphere world positions for the current config
- ``lik``               collision log-density + per-sphere clearances
                        (reference ``debug_likelihood``)
- ``ee``                end-effector position

Streams are injectable for tests (the reference drives its loop through a
mocked stdin the same way).
"""

from __future__ import annotations

import sys
from typing import IO, Optional

import jax.numpy as jnp
import numpy as np

from vgpmp_tpu.engine import analysis
from vgpmp_tpu.models.vgpmp import PlannerModel, PlannerParams

__all__ = ["debug_loop"]


def debug_loop(
    model: PlannerModel,
    params: PlannerParams,
    config0=None,
    stdin: Optional[IO] = None,
    stdout: Optional[IO] = None,
) -> np.ndarray:
    """Run the REPL; returns the final configuration.

    Args:
        model / params: planner context (for sigma_obs in the ``lik`` probe).
        config0: initial configuration (defaults to mid-range).
        stdin / stdout: stream injection for tests.
    """
    fin = stdin or sys.stdin
    fout = stdout or sys.stdout
    lo = np.asarray(model.limits_low)
    hi = np.asarray(model.limits_high)
    q = (
        np.array(config0, dtype=np.float64)
        if config0 is not None
        else 0.5 * (lo + hi)
    )

    def say(msg: str) -> None:
        print(msg, file=fout)

    say(f"vgpmp-tpu debug loop — {len(q)} joints; 'q' to quit")
    for line in fin:
        cmd = line.strip().split()
        if not cmd:
            continue
        op = cmd[0]
        if op == "q":
            break
        elif op == "c":
            say("config: " + np.array2string(q, precision=4))
        elif op == "set" and len(cmd) == 3:
            j, v = int(cmd[1]), float(cmd[2])
            if not 0 <= j < len(q):
                say(f"joint index out of range [0, {len(q)})")
                continue
            q[j] = float(np.clip(v, lo[j], hi[j]))
            say(f"joint {j} = {q[j]:.4f}")
        elif op == "goto" and len(cmd) == len(q) + 1:
            q = np.clip(np.array([float(v) for v in cmd[1:]]), lo, hi)
            say("config: " + np.array2string(q, precision=4))
        elif op == "sdf":
            g = np.asarray(
                analysis.sdf_gradient_at_config(model.collision, jnp.asarray(q))
            )
            say("sdf grad per sphere:\n" + np.array2string(g, precision=4))
        elif op == "fk":
            pos = np.asarray(
                analysis.ee_positions(model.collision.fk, jnp.asarray(q))
            )
            say("ee position: " + np.array2string(pos, precision=4))
            from vgpmp_tpu.kinematics.dh import sphere_positions

            sp = np.asarray(sphere_positions(model.collision.fk, jnp.asarray(q)))
            say("sphere positions:\n" + np.array2string(sp, precision=4))
        elif op == "lik":
            val = float(
                analysis.debug_likelihood(params, model, jnp.asarray(q))
            )
            clear = np.asarray(
                model.collision.sphere_clearance(jnp.asarray(q))
            )
            say(f"collision log-density: {val:.4f}")
            say(
                f"clearance: min={clear.min():+.4f} "
                f"mean={clear.mean():+.4f} (per-sphere available via 'sdf')"
            )
        elif op == "ee":
            pos = np.asarray(
                analysis.ee_positions(model.collision.fk, jnp.asarray(q))
            )
            say("ee position: " + np.array2string(pos, precision=4))
        else:
            say("commands: q | c | set J V | goto V... | sdf | fk | lik | ee")
    return q
