#!/usr/bin/env python
"""Launch a multi-process (multi-host) sharded solve.

Two modes:

- **Local simulation** (default): spawn ``--processes`` worker processes on
  this machine, each seeing ``--devices-per-process`` virtual CPU devices,
  connected through a real TCP coordinator + gloo collectives. This exercises
  the exact multi-host code path (distributed init, cross-process mesh,
  global-array assembly, psum'd metrics) without TPU pods. Used by
  ``tests/test_multihost.py``.

- **Real multi-host**: run this script once per host with ``--coordinator
  host0:1234 --process-id <rank> --no-force-cpu``; each host then uses its
  local TPU chips and jax.distributed stitches the global mesh.

Example (2 simulated hosts x 2 devices, tiny budget):
    python tools/launch_multihost.py --processes 2 --devices-per-process 2 \
        --overrides '{"num_steps": 20, "num_samples": 4}' --max-problems 8
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launch_local(args) -> list[dict]:
    """Spawn N local worker processes; return process-0 metrics."""
    port = free_port()
    procs = []
    outs = []
    for rank in range(args.processes):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=(
                env.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={args.devices_per_process}"
            ),
            JAX_ENABLE_X64="1",
            JAX_CPU_COLLECTIVES_IMPLEMENTATION="gloo",
        )
        out = tempfile.NamedTemporaryFile(
            mode="w+", suffix=f".rank{rank}.json", delete=False
        )
        outs.append(out.name)
        cmd = [
            sys.executable, "-m", "vgpmp_tpu.parallel.multihost",
            "--coordinator", f"127.0.0.1:{port}",
            "--num-processes", str(args.processes),
            "--process-id", str(rank),
            "--robot", args.robot,
            "--problemset", args.problemset,
            "--sample-shards", str(args.sample_shards),
            "--seed", str(args.seed),
            "--json-out", out.name,
        ]
        if args.max_problems:
            cmd += ["--max-problems", str(args.max_problems)]
        if args.overrides:
            cmd += ["--overrides", args.overrides]
        procs.append(
            subprocess.Popen(
                cmd, cwd=ROOT, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    results = []
    for rank, p in enumerate(procs):
        stdout, _ = p.communicate(timeout=args.timeout)
        if p.returncode != 0:
            for q in procs:
                q.kill()
            raise RuntimeError(f"rank {rank} failed:\n{stdout[-4000:]}")
        results.append(stdout)
    metrics = json.loads(Path(outs[0]).read_text())
    for o in outs:
        os.unlink(o)
    return [metrics]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--processes", type=int, default=2)
    ap.add_argument("--devices-per-process", type=int, default=2)
    ap.add_argument("--robot", default="franka")
    ap.add_argument("--problemset", default="industrial")
    ap.add_argument("--sample-shards", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-problems", type=int, default=None)
    ap.add_argument("--overrides", default=None)
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()

    (metrics,) = launch_local(args)
    print(json.dumps(metrics, indent=1))


if __name__ == "__main__":
    main()
