#!/usr/bin/env python
"""Time the feedback config (fully serial fused path) on TPU (dev tool)."""
import sys
import time

import jax
import jax.numpy as jnp

import srack_tpu as st
from srack_tpu.presets import farm_params, feedback_patch

jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    n, voices = 48000, 1024
    cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                         precision="fast")
    patch = feedback_patch(cfg)
    compiled = st.compile_patch(patch)
    params = farm_params(patch, voices)
    state = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (voices,) + a.shape),
        compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), voices)
    fn = compiled._get_fn(n, True, "fused")
    meter = jax.jit(lambda p, s, k, d: jnp.abs(fn(p, s, k, d)[0]).max())
    peak = float(meter(params, state, keys, {}))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        peak = float(meter(params, state, keys, {}))
        best = min(best, time.perf_counter() - t0)
    print(f"best={best*1e3:.1f}ms rate={n*voices/best/1e9:.3f}G "
          f"peak={peak:.3f}", file=sys.stderr)


if __name__ == "__main__":
    main()
