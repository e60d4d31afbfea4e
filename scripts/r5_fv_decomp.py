#!/usr/bin/env python
"""Round-5 Freeverb decomposition at the bench shape (30 s x 1024 voices,
segment=288000):

* voice-only: the reverb config MINUS the Freeverb module (subtractive
  voice, block engine, same segmentation) -- how much of the config's
  ~571 ms is the non-kernel chain;
* kernel standalone at k_c = 2 (what pick_k_c currently returns for the
  fused entry: 3 lanes -> kmax 4 -> largest divisor of 250 <= 4) vs
  k_c = 5 (legal if the VMEM budget is raised: lanes 4.4 MB + state
  3.7 MB < 16 MB) -- is the per-grid-invocation floor still the largest
  term and does k_c keep dividing it;
* trivial kernel (copy-only body, same grid/specs) at each k_c -- the
  pure invocation + DMA floor.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_fv_decomp.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import srack_tpu as st
from srack_tpu.modules.freeverb import line_lengths
from srack_tpu.ops import freeverb_kernel as fvk
from srack_tpu.presets import farm_params, subtractive_voice

log = lambda *a: print(*a, file=sys.stderr, flush=True)

V, SR = 1024, 48000
SEG, NSEG = 288000, 5          # 5 x 6 s = 30 s
T_C = 1152


def bench_patch(name, patch, n, seg, repeats=5):
    compiled = st.compile_patch(patch)
    params = farm_params(patch, V)
    state = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (V,) + a.shape),
        compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), V)
    fn = compiled._get_fn(n, True, "block", segment=seg)
    meter = jax.jit(lambda p, s, k, d: jnp.abs(fn(p, s, k, d)[0]).max())
    t0 = time.perf_counter()
    peak = float(meter(params, state, keys, {}))
    log(f"[{name}] compile+first {time.perf_counter()-t0:.1f}s "
        f"peak={peak:.3f}")
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(meter(params, state, keys, {}))
        best = min(best, time.perf_counter() - t0)
    log(f"[{name}] best={best*1e3:.1f}ms rate={n*V/best/1e9:.3f}G "
        f"ms/s-audio={best*1e3/(n/48000):.2f}")


def bench_kernel(name, k_c, repeats=5):
    cl, cr, al, ar = line_lengths(SR)
    comb_lens = tuple(cl) + tuple(cr)
    ap_lens = tuple(al) + tuple(ar)
    run = fvk._build(comb_lens, ap_lens, SEG, T_C, False,
                     fuse_mix=True, mono=True, skip_r=False, k_c=k_c)
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
    float(run30(l_all, fs0, hists0))
    log(f"[{name}] compile+first {time.perf_counter()-t0:.1f}s")
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
    cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=2,
                         precision="fast")
    try:
        bench_patch("voice-only (block, 30s seg=288k)",
                    subtractive_voice(cfg), SEG * NSEG, SEG)
    except Exception as e:
        log(f"[voice-only] FAILED: {e!r}"[:500])
    for k_c in (2, 5):
        try:
            bench_kernel(f"kernel standalone k_c={k_c} (30s)", k_c)
        except Exception as e:
            log(f"[kernel k_c={k_c}] FAILED: {e!r}"[:500])


if __name__ == "__main__":
    main()
