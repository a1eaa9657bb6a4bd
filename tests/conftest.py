"""Test configuration: virtual 8-device CPU mesh + float64 parity mode.

Mirrors the reference's headless DIRECT-mode fixture strategy
(``/root/reference/tests/conftest.py``): tests run against a simulator-free
backend. Here that means JAX on CPU with 8 virtual devices so every sharding
test exercises a real multi-device mesh without TPU hardware, and float64
enabled so numerics can be compared against the reference's fp64 math.
"""

import os

# NOTE: the image exports JAX_PLATFORMS=axon and the axon plugin re-registers
# itself even when the env var is overridden — the config update below (after
# import) is what actually forces CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache keeps the suite fast on repeat runs
jax.config.update("jax_compilation_cache_dir", "/tmp/vgpmp_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session", params=["franka", "wam", "kuka", "ur10"])
def robot_name(request):
    return request.param
