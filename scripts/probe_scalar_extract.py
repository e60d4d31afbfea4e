"""Can a Mosaic kernel turn an in-kernel VECTOR value into per-row
SCALARS usable as dynamic-slice bases (pl.ds) -- without a round trip
through HBM?  This gates fusing the sample position pipeline with the
windowed gather (ops/sample_kernel + ops/sample_gather): the gather's
per-row slab reads need scalar chunk bases that today arrive via an HBM
-> XLA -> SMEM-input round trip.

Variants:
  smem-scratch : write the vector to an SMEM scratch ref, read scalars
  vmem-scratch : write to VMEM scratch, read element [r, 0]
Both then use the scalar in tbl_ref[r, pl.ds(base, 2), :].

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_scalar_extract.py
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

log = lambda *a: print(*a, file=sys.stderr, flush=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

RB, C, LANES = 8, 16, 128


def build(mode):
    def kernel(iref, tref, oref, scr):
        base_v = jnp.right_shift(iref[:, :1], 7)  # [RB, 1] int32 vector

        if mode == "smem-scratch":
            scr[...] = base_v  # vector store to SMEM scratch?
        else:
            scr[...] = base_v  # VMEM scratch

        rows = []
        for r in range(RB):
            b = scr[r, 0]  # scalar read
            rows.append(tref[r, pl.ds(b, 2), :].reshape(2 * LANES))
        oref[...] = jnp.stack(rows)

    scratch = (pltpu.SMEM((RB, 1), jnp.int32) if mode == "smem-scratch"
               else pltpu.VMEM((RB, 1), jnp.int32))
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((RB, 2 * LANES), jnp.float32),
        scratch_shapes=[scratch],
    )


rng = np.random.default_rng(0)
tbl = jnp.asarray(rng.normal(size=(RB, C, LANES)).astype(np.float32))
idx = jnp.asarray((rng.integers(0, (C - 2) * LANES, (RB, LANES)))
                  .astype(np.int32))

want = np.stack([np.asarray(tbl)[r, b:b + 2].reshape(-1)
                 for r, b in enumerate(np.asarray(idx)[:, 0] >> 7)])

float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
log("warmed")

for mode in ("smem-scratch", "vmem-scratch"):
    try:
        got = np.asarray(build(mode)(idx, tbl))
        ok = np.array_equal(got, want)
        log(f"[{mode}] COMPILED, exact={ok}")
    except Exception as e:
        log(f"[{mode}] FAILED: {type(e).__name__}: {str(e)[:300]}")
