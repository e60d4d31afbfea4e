#!/usr/bin/env python
"""Round-5 Freeverb pack A/B, SMALL: single 6 s segment per dispatch
(compile-service triage -- the 5-segment k2-packed compile hung >90 min): packed single-ref delay lines vs
24 separate refs, at k_c 1/2/5 (5 previously crashed the remote compile
helper at 15 tier-clones; packing shrinks the program).  Standalone
kernel, bench shape: 30 s x 1024 voices as 5 carried 6 s segments.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_fv_pack.py
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

V, SR = 1024, 48000
SEG, NSEG = 288000, 1
T_C = 1152


def bench_kernel(name, k_c, pack, repeats=5):
    cl, cr, al, ar = line_lengths(SR)
    comb_lens = tuple(cl) + tuple(cr)
    ap_lens = tuple(al) + tuple(ar)
    run = fvk._build(comb_lens, ap_lens, SEG, T_C, False,
                     fuse_mix=True, mono=True, skip_r=False, k_c=k_c,
                     pack_lines=pack)
    rng = np.random.default_rng(0)
    l_all = jnp.asarray(rng.normal(size=(V, SEG * NSEG)).astype(np.float32)
                        * 0.1)
    fs0 = jnp.zeros((V, 16), jnp.float32)
    gains = [jnp.full((V,), g, jnp.float32)
             for g in (0.16, 0.84, 0.015, 0.12, 0.06, 0.3)]
    hists0 = [jnp.zeros((V, l), jnp.float32) for l in comb_lens + ap_lens]

    @jax.jit
    def run30(l_all, fs, hists):
        acc = jnp.float32(0)
        for s in range(NSEG):
            seg = jax.lax.dynamic_slice_in_dim(l_all, s * SEG, SEG, 1)
            o = run(seg, fs, *gains, *hists)
            fs, hists = o[2], list(o[3:])
            acc = acc + jnp.abs(o[0]).max() + jnp.abs(o[1]).max()
        return acc

    t0 = time.perf_counter()
    v0 = float(run30(l_all, fs0, hists0))
    log(f"[{name}] compile+first {time.perf_counter()-t0:.1f}s "
        f"acc={v0:.6f}")
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run30(l_all, fs0, hists0))
        best = min(best, time.perf_counter() - t0)
    n = SEG * NSEG
    log(f"[{name}] best={best*1e3:.1f}ms rate={n*V/best/1e9:.3f}G "
        f"ms/s-audio={best*1e3/(n/48000):.2f}")


def main():
    t0 = time.perf_counter()
    float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
    log(f"warmup {time.perf_counter()-t0:.1f}s")
    for name, k_c, pack in (
        ("k1 packed 6s", 1, True),
        ("k1 unpacked 6s", 1, False),
        ("k2 packed 6s", 2, True),
    ):
        try:
            bench_kernel(name, k_c, pack)
        except Exception as e:
            log(f"[{name}] FAILED: {e!r}"[:1200])


if __name__ == "__main__":
    main()

