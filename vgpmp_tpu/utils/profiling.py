"""Profiling & observability helpers.

The reference's only telemetry is a wall-clock ``timing`` decorator and tqdm
postfix (``utils/miscellaneous.py:46-56,99-103``). Here: the same lightweight
timer, plus ``jax.profiler`` trace capture for real device profiles and a
gradient-tap debug transform (the reference's ``check_gradients`` idea,
``utils/sampler.py:59-66``, as a composable function).
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Callable, Iterator

import jax

__all__ = ["timing", "trace", "grad_tap"]


def timing(f: Callable) -> Callable:
    """Wall-clock decorator (device-sync aware: blocks on array outputs)."""

    @functools.wraps(f)
    def wrap(*args, **kwargs):
        t0 = time.time()
        out = f(*args, **kwargs)
        jax.block_until_ready(out)
        print(f"{f.__name__} took {(time.time() - t0) * 1e3:.3f} ms")
        return out

    return wrap


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/vgpmp_tpu_trace") -> Iterator[None]:
    """Capture a device profile viewable in TensorBoard/XProf.

    Usage::
        with profiling.trace():
            solve_b(...)  # traced region
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def grad_tap(x, name: str = "tap", printer: Callable | None = None):
    """Identity in the forward pass; prints/records the upstream gradient in
    the backward pass (debug transform version of the reference's
    ``check_gradients``)."""

    @jax.custom_vjp
    def _tap(v):
        return v

    def _fwd(v):
        return v, None

    def _bwd(_, g):
        if printer is None:
            jax.debug.print(name + ": upstream grad = {}", g)
        else:
            printer(g)
        return (g,)

    _tap.defvjp(_fwd, _bwd)
    return _tap(x)
