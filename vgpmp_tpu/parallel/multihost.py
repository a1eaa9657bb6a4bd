"""Multi-host (multi-process) solve runtime.

The reference is strictly single-process (SURVEY §2.3); this module is the
multi-host story the north star requires: every host runs the SAME program
(SPMD), problems shard over the global ``dp`` mesh axis, per-host shards are
assembled into global arrays with ``jax.make_array_from_process_local_data``,
and the only cross-host traffic is the metric ``psum`` inside the compiled
program (problems are embarrassingly parallel — there is no parameter or
gradient synchronization at all, which is why near-linear scaling is
expected).

Entry points:

- :func:`worker_main` — the per-process program. Launch one per host (or per
  simulated host; see ``tools/launch_multihost.py``), with coordinator/rank
  supplied via flags or env. Process 0 prints a JSON metrics line.
- :func:`run_sharded` — library call used by the worker and by single-process
  callers that already initialized the runtime.

A 2-process CPU run on one machine (``tools/launch_multihost.py --processes 2
--devices-per-process 2``) exercises the full multi-host path — distributed
init over a real TCP coordinator, gloo CPU collectives, cross-process mesh,
global-array assembly — without TPU pods, and is asserted identical to the
single-process result in ``tests/test_multihost.py``.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Any, Dict, Optional, Tuple

import numpy as np

__all__ = ["run_sharded", "worker_main"]


def run_sharded(
    robot: str,
    problemset: str,
    num_sample_shards: int = 1,
    overrides: Optional[Dict[str, Any]] = None,
    seed: int = 0,
    max_problems: Optional[int] = None,
    use_tuned: bool = True,
) -> Tuple[Dict[str, float], float]:
    """Solve one problemset sharded over the global device mesh.

    Must be called on every process of an initialized multi-process runtime
    (all processes participate in the same compiled program). Returns
    (global metrics dict, steady wall-clock seconds) — identical on every
    process since metrics are psum'd mesh-wide.
    """
    import jax
    import jax.numpy as jnp

    from vgpmp_tpu.engine import solver
    from vgpmp_tpu.models import vgpmp as planner
    from vgpmp_tpu.parallel import mesh as mesh_mod
    from vgpmp_tpu.parallel.sharded import make_sharded_solver, pad_problems
    from vgpmp_tpu.session import PlanningSession
    from jax.sharding import NamedSharding, PartitionSpec as P

    sess = PlanningSession(
        robot, problemset, dtype=jnp.float32, overrides=overrides or {},
        use_tuned=use_tuned,
    )
    mesh = mesh_mod.make_mesh(num_sample_shards)
    n_dp = mesh.shape[mesh_mod.DP_AXIS]

    starts, goals = sess.queries()
    if max_problems is not None:
        starts, goals = starts[:max_problems], goals[:max_problems]
    starts, goals, mask = pad_problems(starts, goals, n_dp)
    B = len(starts)
    keys = np.asarray(jax.random.split(jax.random.PRNGKey(seed), B))

    # per-process local rows -> global arrays over the dp axis
    dp_sharding = NamedSharding(mesh, P(mesh_mod.DP_AXIS))
    rows_per_shard = B // n_dp

    def to_global(x):
        x = np.asarray(x)
        # local rows: the dp shards this process owns, in mesh order
        my_rows = [
            np.arange(i * rows_per_shard, (i + 1) * rows_per_shard)
            for i in range(n_dp)
            if any(
                d.process_index == jax.process_index()
                for d in np.asarray(mesh.devices)[i]
            )
        ]
        local = x[np.concatenate(my_rows)] if my_rows else x[:0]
        return jax.make_array_from_process_local_data(dp_sharding, local, x.shape)

    sb = to_global(np.asarray(starts, np.float32))
    gb = to_global(np.asarray(goals, np.float32))
    kb = to_global(keys)
    mb = to_global(mask)

    params_host = solver.init_batch(sess.model, starts, goals, sess.planner_params)
    params_b = jax.tree.map(lambda x: to_global(np.asarray(x)), params_host)

    solve = make_sharded_solver(sess.model, sess.train_config, mesh)
    t0 = time.time()
    res, metrics = solve(params_b, sb, gb, kb, mb)
    jax.block_until_ready(metrics["success_rate"])
    compile_and_first = time.time() - t0
    t0 = time.time()
    res, metrics = solve(params_b, sb, gb, kb, mb)
    jax.block_until_ready(metrics["success_rate"])
    steady = time.time() - t0

    out = {
        "success_rate": float(np.asarray(metrics["success_rate"].addressable_data(0))),
        "num_problems": float(np.asarray(metrics["num_problems"].addressable_data(0))),
        "mean_min_clearance": float(
            np.asarray(metrics["mean_min_clearance"].addressable_data(0))
        ),
        "compile_plus_first_seconds": round(compile_and_first, 2),
        "steady_batch_seconds": round(steady, 4),
        "solves_per_sec": round(float(np.sum(mask)) / steady, 3),
        "num_processes": jax.process_count(),
        "num_devices": len(jax.devices()),
        "mesh": dict(mesh.shape),
    }
    return out, steady


def worker_main(argv: Optional[list] = None) -> Dict[str, float]:
    """Per-process entry: initialize the distributed runtime, solve, report."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=os.environ.get("JAX_COORDINATOR_ADDRESS"))
    ap.add_argument("--num-processes", type=int,
                    default=int(os.environ.get("JAX_NUM_PROCESSES", "1")))
    ap.add_argument("--process-id", type=int,
                    default=int(os.environ.get("JAX_PROCESS_ID", "0")))
    ap.add_argument("--robot", default="franka")
    ap.add_argument("--problemset", default="industrial")
    ap.add_argument("--sample-shards", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-problems", type=int, default=None)
    ap.add_argument("--overrides", default=None, help="JSON planner-param overrides")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args(argv)

    import jax

    # honor a JAX_PLATFORMS request even under platform plugins that
    # re-register themselves over the env var (the config update after import
    # is what actually wins — same workaround as tests/conftest.py)
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)

    if args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    overrides = json.loads(args.overrides) if args.overrides else None
    metrics, _ = run_sharded(
        args.robot, args.problemset, args.sample_shards, overrides,
        seed=args.seed, max_problems=args.max_problems,
    )
    if jax.process_index() == 0:
        line = json.dumps(metrics)
        print(line)
        if args.json_out:
            with open(args.json_out, "w") as f:
                f.write(line)
    return metrics


if __name__ == "__main__":
    worker_main()
