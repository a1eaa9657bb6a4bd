"""Multi-process (simulated multi-host) solve: 2 processes over a TCP
coordinator + gloo CPU collectives must reproduce the single-process result.

This is the "multi-node without a real cluster" test the reference has no
analog for (SURVEY §4): each subprocess sees 2 virtual CPU devices, the two
stitch a global 4-device dp mesh via ``jax.distributed``, problems shard
across processes, and the psum'd global metrics must match a 1-process run
on an identical 4-device mesh (success counts exactly; clearance to fp
tolerance).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent

TINY = json.dumps(
    {
        "num_steps": 12,
        "num_samples": 4,
        "num_bases": 64,
        "num_inducing": 6,
        "time_spacing_X": 10,
        "time_spacing_Xnew": 12,
    }
)
N_PROBLEMS = 8


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(num_processes: int, devices_per_process: int) -> dict:
    port = _free_port()
    procs, outs = [], []
    for rank in range(num_processes):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=f"--xla_force_host_platform_device_count={devices_per_process}",
            JAX_ENABLE_X64="1",
            JAX_CPU_COLLECTIVES_IMPLEMENTATION="gloo",
        )
        out = tempfile.NamedTemporaryFile(mode="w+", suffix=".json", delete=False)
        outs.append(out.name)
        cmd = [
            sys.executable, "-m", "vgpmp_tpu.parallel.multihost",
            "--num-processes", str(num_processes),
            "--process-id", str(rank),
            "--robot", "franka",
            "--problemset", "industrial",
            "--max-problems", str(N_PROBLEMS),
            "--overrides", TINY,
            "--json-out", out.name,
        ]
        if num_processes > 1:
            cmd += ["--coordinator", f"127.0.0.1:{port}"]
        procs.append(
            subprocess.Popen(
                cmd, cwd=ROOT, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    fail = None
    for rank, p in enumerate(procs):
        stdout, _ = p.communicate(timeout=600)
        if p.returncode != 0 and fail is None:
            fail = f"rank {rank} exited {p.returncode}:\n{stdout[-4000:]}"
    if fail:
        for o in outs:
            if os.path.exists(o):
                os.unlink(o)
        pytest.fail(fail)
    metrics = json.loads(Path(outs[0]).read_text())
    for o in outs:
        os.unlink(o)
    return metrics


@pytest.mark.slow
def test_two_process_matches_single_process():
    m1 = _run_workers(num_processes=1, devices_per_process=4)
    m2 = _run_workers(num_processes=2, devices_per_process=2)

    assert m1["num_devices"] == m2["num_devices"] == 4
    assert m2["num_processes"] == 2
    assert m1["num_problems"] == m2["num_problems"] == N_PROBLEMS
    # identical global mesh + identical per-problem keys -> identical solves;
    # success counts must agree exactly, clearance to fp tolerance (collective
    # reduction order may differ between gloo and intra-process psum)
    assert m1["success_rate"] == m2["success_rate"]
    assert np.isclose(
        m1["mean_min_clearance"], m2["mean_min_clearance"], rtol=1e-5, atol=1e-7
    )
