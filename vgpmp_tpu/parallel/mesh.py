"""Device-mesh construction and multi-host runtime initialization.

The reference is strictly single-process with no collective communication of
any kind (SURVEY §2.3); this module provides the TPU-native scaling fabric it
lacks: a 2-D ``(dp, sp)`` mesh where independent planning problems shard over
``dp`` (embarrassingly parallel — no gradient traffic) and the MC sample axis
of a single problem can shard over ``sp`` (likelihood means and best-sample
selection ride ICI collectives; see ``models/vgpmp.elbo``).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "init_distributed"]

DP_AXIS = "dp"
SP_AXIS = "sp"


def make_mesh(
    num_sample_shards: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a ``(dp, sp)`` mesh over all (or the given) devices.

    ``num_sample_shards`` devices cooperate per problem on the MC-sample
    axis; the rest of the device count becomes the problem-parallel axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % num_sample_shards != 0:
        raise ValueError(
            f"{n} devices not divisible by num_sample_shards={num_sample_shards}"
        )
    arr = np.asarray(devices).reshape(n // num_sample_shards, num_sample_shards)
    return Mesh(arr, (DP_AXIS, SP_AXIS))


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host JAX runtime (no-op when single-process).

    Call once at program start on every host of a multi-host slice. Arguments
    default to the standard env vars (``JAX_COORDINATOR_ADDRESS`` etc.) or
    the TPU metadata autodetection built into ``jax.distributed``.
    """
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
