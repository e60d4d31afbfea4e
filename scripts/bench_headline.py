#!/usr/bin/env python
"""Headline-config experiments: one-dispatch peak fetch, longer renders."""
import sys
import time

import jax
import jax.numpy as jnp

import srack_tpu as st
from srack_tpu.presets import farm_params, subtractive_voice

jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CFG = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                     precision="fast")


def bench(n, voices, fuse_peak):
    patch = subtractive_voice(CFG)
    compiled = st.compile_patch(patch)
    params = farm_params(patch, voices)
    state = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (voices,) + a.shape),
        compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), voices)
    fn = compiled._get_fn(n, True, "fused")
    if fuse_peak:
        run = jax.jit(lambda p, s, k, d: jnp.abs(fn(p, s, k, d)[0]).max())
        call = lambda: float(run(params, state, keys, {}))
    else:
        def call():
            out = fn(params, state, keys, {})
            return float(jnp.abs(out[0]).max())
    peak = call()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        peak = call()
        best = min(best, time.perf_counter() - t0)
    print(f"[n={n} v={voices} fuse_peak={fuse_peak}] best={best * 1e3:.1f}ms "
          f"rate={n * voices / best / 1e9:.3f}G peak={peak:.3f}",
          file=sys.stderr, flush=True)


def main():
    bench(960000, 1000, False)   # current bench style (two dispatches)
    bench(960000, 1000, True)    # fused peak (one dispatch)
    bench(1440000, 1000, True)   # 30 s render


if __name__ == "__main__":
    main()
