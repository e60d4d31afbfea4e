#!/usr/bin/env python
"""Round-5: where does the voice-only block config's ~4.9 ms/s-audio go?
ab_voice_block measured the absorbed stage at ~2.0 ms/s (ch=1, 10 s, no
segment); the reverb config's voice side measures ~4.9 (ch=2, 30 s,
segment=288k).  Isolate: channels x segmentation.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_voice_seg.py
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import srack_tpu as st
from srack_tpu.presets import farm_params, subtractive_voice

log = lambda *a: print(*a, file=sys.stderr, flush=True)
V = 1024


def bench(name, ch, n, seg, repeats=5):
    cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=ch,
                         precision="fast")
    patch = subtractive_voice(cfg)
    compiled = st.compile_patch(patch)
    params = farm_params(patch, V)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape),
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


def main():
    t0 = time.perf_counter()
    float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
    log(f"warmup {time.perf_counter()-t0:.1f}s")
    for name, ch, n, seg in (
        ("ch1 10s noseg", 1, 480000, None),
        ("ch2 10s noseg", 2, 480000, None),
        ("ch2 30s seg288k", 2, 1440000, 288000),
        ("ch2 30s seg480k", 2, 1440000, 480000),
    ):
        try:
            bench(name, ch, n, seg)
        except Exception as e:
            log(f"[{name}] FAILED: {e!r}"[:500])


if __name__ == "__main__":
    main()
