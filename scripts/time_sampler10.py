"""Sampler-kit bench shape probe: does a 10 s render fit HBM and clear
1 G samples/s incl. transport?  (2 s renders leave the fixed ~28 ms
transport at ~25% of wall time; device rate is ~1.18 G.)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/time_sampler10.py
"""
import sys
import time

import jax
import jax.numpy as jnp

import srack_tpu as st
from srack_tpu.presets import farm_params, sampler_kit

log = lambda *a: print(*a, file=sys.stderr, flush=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V = 1024
CFG = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                     precision="fast")


def run(n):
    patch = sampler_kit(CFG)
    compiled = st.compile_patch(patch)
    params = farm_params(patch, V)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape),
                         compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), V)
    fn = compiled._get_fn(n, True, "block")
    meter = jax.jit(lambda p, s, k: jnp.abs(fn(p, s, k, {})[0]).max())
    t0 = time.perf_counter()
    peak = float(meter(params, state, keys))
    log(f"n={n}: compile+first {time.perf_counter()-t0:.0f}s peak={peak:.3f}")
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        float(meter(params, state, keys))
        best = min(best, time.perf_counter() - t0)
    log(f"n={n}: t={best*1e3:.1f}ms rate={V*n/best/1e9:.2f}G/s")


for n in (480000, 240000):
    try:
        run(n)
    except Exception as e:
        log(f"n={n}: failed {e!r}")
