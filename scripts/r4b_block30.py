#!/usr/bin/env python
"""Round-4b block-config check on TPU: reverb (k_c sub-chunked Freeverb
kernel) and sampler (whole-step consecutive gather fast path) at the
bench shapes -- 30 s x 1024 voices, device-side segmented.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4b_block30.py
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import srack_tpu as st
from srack_tpu.presets import (drum_machine, farm_params, reverb_patch,
                               sampler_kit)


def log(m):
    print(m, file=sys.stderr, flush=True)


def bench(name, patch, n, seg, voices=1024, repeats=5):
    compiled = st.compile_patch(patch)
    params = farm_params(patch, voices)
    state = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (voices,) + a.shape),
        compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), voices)
    fn = compiled._get_fn(n, True, "block", segment=seg)
    meter = jax.jit(lambda p, s, k, d: jnp.abs(fn(p, s, k, d)[0]).max())
    t0 = time.perf_counter()
    peak = float(meter(params, state, keys, {}))
    log(f"[{name}] compile+first {time.perf_counter()-t0:.1f}s "
        f"peak={peak:.3f}")
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        peak = float(meter(params, state, keys, {}))
        best = min(best, time.perf_counter() - t0)
    log(f"[{name}] best={best*1e3:.1f}ms rate={n*voices/best/1e9:.3f}G "
        f"ms/s-audio={best*1e3/(n/48000):.2f}")


def main():
    t0 = time.perf_counter()
    float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
    log(f"warmup {time.perf_counter()-t0:.1f}s")
    cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                         precision="fast")
    n = 1440000
    for name, patch, seg in (
        ("reverb 30s seg=288k", reverb_patch(cfg), 288000),
        ("sampler 30s seg=480k", sampler_kit(cfg), 480000),
        ("drums 30s seg=480k", drum_machine(cfg), 480000),
    ):
        try:
            bench(name, patch, n, seg)
        except Exception as e:
            log(f"[{name}] FAILED: {e!r}"[:500])


if __name__ == "__main__":
    main()
