#!/usr/bin/env python
"""SDF-gather microbenchmark: is XLA's gather at the hardware limit, and
could a Pallas kernel beat it?

The training-step profile (PROFILE_r03.json) shows the FK+SDF+hinge stage
dominating the ELBO step, and within it the packed-SDF slice gather
(``sdf/grid.py packed_nearest_distance`` — one 8-byte row gather per query
point) is the principal cost: SDF lookups are random-index gathers, which on
TPU are issue-rate-bound, not bandwidth-bound. This tool measures, on the
real chip:

1. the production path: XLA row gather from the packed ``[ncells, 2]``
   uint32 table (HBM-resident — scene tables are 28-55 MB, >> 16 MB VMEM);
2. a single 4-byte element gather (lower bound for any one-pass scheme);
3. the round-2 semantics for comparison: 7 separate gather passes
   (1 value + 6 central-difference neighbors);
4. a Pallas kernel gathering from a VMEM-RESIDENT table (table sized to
   fit), via ``jnp.take`` inside the kernel — measures the VMEM-gather
   ceiling that a hierarchical scheme could exploit if Mosaic supports
   vectorized in-kernel gathers;
5. the same Pallas kernel at production point counts but a small table, to
   separate issue-rate from table-size effects.

The verdict feeds the Pallas go/no-go decision recorded in README.md and
PALLAS_DECISION.json: if (1) ~= (2) ~= hardware issue rate and (4) is not
materially faster (or unsupported), XLA is already at the roofline for
HBM-resident tables and the packed-table fusion (7 passes -> 1.35) was the
right lever; if (4) is much faster, a coarse-table-in-VMEM hierarchical
kernel is worth building.

Run on the TPU:  python tools/gather_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

NPTS = 36 * 20 * 50 * 37  # B x S x N x P of the profiled franka step = 1.33M


def timeit(fn, *args, iters: int = 20) -> float:
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_xla(ncells: int, npts: int) -> dict:
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (npts,), 0, ncells, dtype=jnp.int32)
    words = jnp.arange(ncells * 2, dtype=jnp.uint32).reshape(ncells, 2)
    flat = words.reshape(-1)

    row = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    elem = jax.jit(lambda t, i: jnp.take(t, i, axis=0))

    def seven(t, i):
        # round-2 semantics: central differences need 6 neighbor passes
        acc = jnp.take(t, i, axis=0).astype(jnp.float32)
        for off in (1, -1, 7, -7, 49, -49):
            acc += jnp.take(t, jnp.clip(i + off, 0, ncells - 1), axis=0).astype(jnp.float32)
        return acc

    out = {}
    out["xla_row8B_ns_per_pt"] = timeit(row, words, idx) / npts * 1e9
    out["xla_elem4B_ns_per_pt"] = timeit(elem, flat[: ncells], idx) / npts * 1e9
    out["xla_7pass_ns_per_pt"] = timeit(jax.jit(seven), flat[: ncells], idx) / npts * 1e9
    return out


def bench_pallas(ncells: int, npts: int) -> dict:
    """In-kernel gather from a VMEM-resident table (value-only uint32)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    LANES, SUBS = 128, 8
    blk = SUBS * LANES  # 1024 points per program
    npts = (npts // blk) * blk
    key = jax.random.PRNGKey(1)
    idx = jax.random.randint(key, (npts // LANES, LANES), 0, ncells, dtype=jnp.int32)
    table = jnp.arange(ncells, dtype=jnp.uint32)

    def kernel(tbl_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tbl_ref[:], idx_ref[:], axis=0)

    gather = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.uint32),
        grid=(npts // blk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole table resident
            pl.BlockSpec((SUBS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SUBS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )
    jitted = jax.jit(lambda t, i: gather(t, i))
    return {"pallas_vmem_ns_per_pt": timeit(jitted, table, idx) / npts * 1e9,
            "pallas_table_cells": ncells}


def bench_production_op(npts: int) -> dict:
    """The real packed-SDF op at profile shapes: forward value lookup and
    grad-of-hinge through the custom VJP (``sdf/grid.py
    packed_nearest_distance``), on a synthetic grid of the industrial
    scene's dimensions."""
    from vgpmp_tpu.sdf.grid import PackedSdfGrid, SdfGrid

    rng = np.random.default_rng(0)
    dims = (169, 201, 103)  # industrial
    grid = SdfGrid.from_arrays(
        rng.uniform(-0.05, 0.5, size=dims).astype(np.float32), np.zeros(3), 0.009
    )
    packed = PackedSdfGrid.pack(grid)
    pts = jnp.asarray(
        rng.uniform(0.0, 0.009 * 100, size=(npts, 3)).astype(np.float32)
    )

    from vgpmp_tpu.sdf.grid import packed_nearest_distance

    fwd = jax.jit(lambda p: packed_nearest_distance(packed, p))

    def hinge_cost(p):
        d = packed_nearest_distance(packed, p)
        return jnp.sum(jnp.square(jnp.maximum(0.05 - d, 0.0)))

    gradf = jax.jit(jax.grad(hinge_cost))
    return {
        "packed_fwd_ns_per_pt": timeit(fwd, pts) / npts * 1e9,
        "packed_hinge_grad_ns_per_pt": timeit(gradf, pts) / npts * 1e9,
    }


def main() -> None:
    dev = jax.devices()[0]
    out = {"device": str(dev), "npts": NPTS}

    out.update(bench_production_op(NPTS))
    # production-scale table (industrial scene: 3.5M cells, HBM-resident)
    out.update({f"hbm_{k}": v for k, v in bench_xla(3_498_807, NPTS).items()})
    # small table (fits VMEM) -- separates issue rate from table size
    out.update({f"small_{k}": v for k, v in bench_xla(262_144, NPTS).items()})

    for ncells in (262_144, 1_048_576):  # 1 MB / 4 MB value-only tables
        try:
            r = bench_pallas(ncells, NPTS)
            out[f"pallas_vmem_{ncells}_ns_per_pt"] = r["pallas_vmem_ns_per_pt"]
        except Exception as e:
            out[f"pallas_vmem_{ncells}_error"] = f"{type(e).__name__}: {e}"[:300]

    print(json.dumps(out, indent=1))
    (ROOT / "GATHER_BENCH.json").write_text(json.dumps(out, indent=1))

    # ---- Pallas go/no-go verdict (SURVEY §7 / VERDICT r2 Missing #6) ------
    # The production SDF lookup is one 8-byte HBM row gather per query point.
    # A Pallas kernel only wins if an in-kernel VMEM gather is materially
    # faster than XLA's HBM gather AND the scene table could be staged into
    # VMEM (hierarchically — full tables are 28-55 MB > 16 MB VMEM).
    hbm = out.get("hbm_xla_row8B_ns_per_pt")
    elem = out.get("hbm_xla_elem4B_ns_per_pt")
    vmem = min(
        (v for k, v in out.items()
         if k.startswith("pallas_vmem_") and k.endswith("_ns_per_pt")),
        default=None,
    )
    verdict = {
        "profile_stage_ms": {"FK+SDF+hinge log_prob fwd+bwd": 29.01,
                             "full train step": 35.17},  # PROFILE_r03.json
        "hbm_row8B_ns_per_pt": hbm,
        "hbm_elem4B_ns_per_pt": elem,
        "pallas_vmem_best_ns_per_pt": vmem,
        "packed_fwd_ns_per_pt": out.get("packed_fwd_ns_per_pt"),
        "packed_hinge_grad_ns_per_pt": out.get("packed_hinge_grad_ns_per_pt"),
    }
    if hbm and elem and hbm <= 1.6 * elem:
        verdict["xla_at_issue_rate"] = True
        reason = ("XLA's 8B row gather is within 1.6x of the 4B element "
                  "gather — the lookup is issue-rate-bound, not width- or "
                  "pass-bound; the packed single-slice fusion already "
                  "removed the 7-pass overhead.")
    else:
        verdict["xla_at_issue_rate"] = False
        reason = "XLA row gather is materially slower than the element bound."
    if vmem is not None and hbm and vmem < 0.5 * hbm:
        verdict["pallas_worth_building"] = True
        reason += (" A VMEM-resident Pallas gather is >=2x faster, so a "
                   "hierarchical coarse-table kernel is worth building.")
    else:
        verdict["pallas_worth_building"] = False
        reason += (" In-kernel VMEM gathers do not beat the HBM gather by "
                   ">=2x (or are unsupported), so a Pallas kernel cannot "
                   "materially cut the SDF stage; XLA is at the roofline "
                   "for HBM-resident tables.")
    verdict["reason"] = reason
    (ROOT / "PALLAS_DECISION.json").write_text(json.dumps(verdict, indent=1))
    print("PALLAS_DECISION:", json.dumps(verdict))


if __name__ == "__main__":
    main()
