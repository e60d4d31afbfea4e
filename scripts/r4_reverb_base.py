#!/usr/bin/env python
"""Round-4 reverb attribution: current 30 s segmented number (dev tool)."""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import srack_tpu as st
from srack_tpu.presets import farm_params, reverb_patch


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    # warm compile service
    t0 = time.perf_counter()
    float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
    log(f"warmup {time.perf_counter()-t0:.1f}s")
    cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                         precision="fast")
    voices = 1024
    patch = reverb_patch(cfg)
    compiled = st.compile_patch(patch)
    params = farm_params(patch, voices)
    state = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (voices,) + a.shape),
        compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), voices)
    for n, seg in ((1440000, 480000),):
        fn = compiled._get_fn(n, True, "block", segment=seg)
        meter = jax.jit(lambda p, s, k, d: jnp.abs(fn(p, s, k, d)[0]).max())
        t0 = time.perf_counter()
        peak = float(meter(params, state, keys, {}))
        log(f"[n={n} seg={seg}] compile+first {time.perf_counter()-t0:.1f}s "
            f"peak={peak:.3f}")
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            peak = float(meter(params, state, keys, {}))
            best = min(best, time.perf_counter() - t0)
        log(f"[n={n} seg={seg}] best={best*1e3:.1f}ms "
            f"rate={n*voices/best/1e9:.3f}G ms/s-audio="
            f"{best*1e3/(n/48000):.2f}")


if __name__ == "__main__":
    main()
