#!/usr/bin/env python
"""With vmem_limit_bytes=64M on the freeverb kernel: does k_c=2 compile
deterministically, and does the RING now compile at VB=32?  Standalone
single 6 s segment (roll k1 baseline ~16.1 ms/s incl transport).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_vmem_limit.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from srack_tpu.modules.freeverb import line_lengths
from srack_tpu.ops import freeverb_kernel as fvk

log = lambda *a: print(*a, file=sys.stderr, flush=True)
V, SR, SEG, T_C = 1024, 48000, 288000, 1152


def bench(name, k_c, ring, repeats=5):
    fvk._build.cache_clear()
    cl, cr, al, ar = line_lengths(SR)
    comb_lens = tuple(cl) + tuple(cr)
    ap_lens = tuple(al) + tuple(ar)
    run = fvk._build(comb_lens, ap_lens, SEG, T_C, False,
                     fuse_mix=True, mono=True, skip_r=False, k_c=k_c,
                     ring=ring)
    rng = np.random.default_rng(0)
    l_all = jnp.asarray(rng.normal(size=(V, SEG)).astype(np.float32) * 0.1)
    fs0 = jnp.zeros((V, 16), jnp.float32)
    gains = [jnp.full((V,), g, jnp.float32)
             for g in (0.16, 0.84, 0.015, 0.12, 0.06, 0.3)]
    hists0 = [jnp.zeros((V, l), jnp.float32) for l in comb_lens + ap_lens]

    @jax.jit
    def run6(l, fs, hists):
        o = run(l, fs, *gains, *hists)
        return jnp.abs(o[0]).max() + jnp.abs(o[1]).max()

    t0 = time.perf_counter()
    v0 = float(run6(l_all, fs0, hists0))
    log(f"[{name}] compile+first {time.perf_counter()-t0:.1f}s "
        f"acc={v0:.6f}")
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run6(l_all, fs0, hists0))
        best = min(best, time.perf_counter() - t0)
    log(f"[{name}] best={best*1e3:.1f}ms ms/s-audio={best*1e3/6:.2f}")


def main():
    t0 = time.perf_counter()
    float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
    log(f"warmup {time.perf_counter()-t0:.1f}s")
    for name, k_c, ring in (
        ("ring k2 VB32 vmem64", 2, True),
        ("roll k1 VB32 vmem64", 1, False),
        ("roll k2 VB32 vmem64", 2, False),
    ):
        try:
            bench(name, k_c, ring)
        except Exception as e:
            log(f"[{name}] FAILED: {type(e).__name__} {str(e)[:200]}")


if __name__ == "__main__":
    main()
