"""Sweep segment= for the three block-engine configs at 30 s renders:
fewer segment boundaries amortize the serial stage's per-segment carry,
but larger segments raise live-intermediate HBM pressure (unsegmented
30 s renders used to OOM before the unpadded-lane fix).

Result (v5e, 2026-08-19): segment=480000 is the sweet spot.
  sampler seg=288000: 797.6 ms (1.849 G)  vs seg=480000: 790.7 ms (1.865 G)
  seg=720000 and seg=None: remote_compile HTTP 500 (HBM OOM) for all
  three configs -- live intermediates at 15 s/30 s segments exceed HBM.
Bench ladder keeps (n=1440000, segment=480000) as the first rung.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_seg.py
"""
import sys
import time

import jax
import jax.numpy as jnp

import srack_tpu as st
from srack_tpu.presets import (drum_machine, farm_params, reverb_patch,
                               sampler_kit)

log = lambda *a: print(*a, file=sys.stderr, flush=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V, N = 1024, 1440000
CFG = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                     precision="fast")


def run(name, patch, seg, repeats=4):
    compiled = st.compile_patch(patch)
    params = farm_params(patch, V)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape),
                         compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), V)
    try:
        fn = compiled._get_fn(N, True, "block", segment=seg)
        meter = jax.jit(lambda p, s, k: jnp.abs(fn(p, s, k, {})[0]).max())
        t0 = time.perf_counter()
        float(meter(params, state, keys))
        log(f"[{name} seg={seg}] compile+first {time.perf_counter()-t0:.0f}s")
        best = 1e9
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(meter(params, state, keys))
            best = min(best, time.perf_counter() - t0)
        log(f"[{name} seg={seg}] best={best*1e3:.1f}ms "
            f"rate={N*V/best/1e9:.3f}G "
            f"(device ~{N*V/max(best-0.028,1e-9)/1e9:.2f}G)")
    except Exception as e:
        log(f"[{name} seg={seg}] FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
    log("warmed")
    for seg in (720000, 288000, None):
        run("sampler", sampler_kit(CFG), seg)
    for seg in (720000, None):
        run("drums", drum_machine(CFG), seg)
        run("reverb", reverb_patch(CFG), seg)
