#!/usr/bin/env python
"""Bisect the Mosaic compile crash hit by the ring-comb freeverb kernel
(tpu_compile_helper exit 1).  Minimal pallas kernels over a [VB, 2*T]
state ref with a lane-streamed in/out, each isolating one construct:

* p1_full   -- full read, full write (control; old-kernel shape);
* p2_store  -- full read, PARTIAL aligned store ref[:, phase*T:(phase+1)*T];
* p3_tap    -- full read + unaligned value-slice concat tap, full write;
* p4_ring   -- tap + partial store (the ring pattern).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_mosaic_bisect.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

log = lambda *a: print(*a, file=sys.stderr, flush=True)

VB, T = 32, 1152
O = 519          # unaligned static offset (2*T - L)
V, N = 64, 4608  # tiny: 4 chunks, 2 grid steps at k_c=2


def build(mode):
    n_chunks = N // T

    def kernel(x_ref, hin_ref, o_ref, h_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            h_ref[...] = hin_ref[...]

        for kk in range(2):
            x = x_ref[:, kk * T:(kk + 1) * T]
            full = h_ref[...]
            if mode in ("p3_tap", "p4_ring"):
                a, b = kk, 1 - kk
                y = jnp.concatenate(
                    [full[:, a * T + O:(a + 1) * T],
                     full[:, b * T:b * T + O]], axis=1)
            else:
                y = full[:, kk * T:(kk + 1) * T]
            w = x + y * 0.5
            if mode in ("p2_store", "p4_ring"):
                h_ref[:, kk * T:(kk + 1) * T] = w
            else:
                if kk == 0:
                    h_ref[...] = jnp.concatenate(
                        [w, full[:, T:]], axis=1)
                else:
                    h_ref[...] = jnp.concatenate(
                        [full[:, :T], w], axis=1)
            o_ref[:, kk * T:(kk + 1) * T] = w

    lane = pl.BlockSpec((VB, 2 * T), lambda vt, tt: (vt, tt),
                        memory_space=pltpu.VMEM)
    state = pl.BlockSpec((VB, 2 * T), lambda vt, tt: (vt, 0),
                         memory_space=pltpu.VMEM)

    @jax.jit
    def run(x, h0):
        o, h = pl.pallas_call(
            kernel, grid=(V // VB, n_chunks // 2),
            in_specs=[lane, state],
            out_specs=[lane, state],
            out_shape=[jax.ShapeDtypeStruct((V, N), jnp.float32),
                       jax.ShapeDtypeStruct((V, 2 * T), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(x, h0)
        return jnp.abs(o).max() + jnp.abs(h).max()

    return run


def main():
    t0 = time.perf_counter()
    float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
    log(f"warmup {time.perf_counter()-t0:.1f}s")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(V, N)).astype(np.float32))
    h0 = jnp.asarray(rng.normal(size=(V, 2 * T)).astype(np.float32))
    for mode in ("p1_full", "p2_store", "p3_tap", "p4_ring"):
        try:
            t0 = time.perf_counter()
            val = float(build(mode)(x, h0))
            log(f"[{mode}] OK compile+run {time.perf_counter()-t0:.1f}s "
                f"val={val:.4f}")
        except Exception as e:
            log(f"[{mode}] FAILED: {type(e).__name__} {str(e)[:160]}")


if __name__ == "__main__":
    main()
