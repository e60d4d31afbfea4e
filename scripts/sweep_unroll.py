#!/usr/bin/env python
"""Sweep fused-kernel unroll/t_chunk on the sine + headline configs."""
import sys
import time

import jax
import jax.numpy as jnp

import srack_tpu as st
from srack_tpu.ops import fused
from srack_tpu.presets import subtractive_voice

jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V, N = 1024, 480000
CFG = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                     precision="fast")


def bench(name, patch, t_chunk, unroll):
    compiled = st.compile_patch(patch)
    params = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape),
                          patch.params())
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape),
                         compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), V)
    fn = jax.jit(fused.make_fused_render(compiled, N, t_chunk=t_chunk, auto_chunk=False,
                                         unroll=unroll))
    out = fn(params, state, keys, {})
    float(jnp.abs(out[0]).max())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(params, state, keys, {})
        float(jnp.abs(out[0]).max())
        best = min(best, time.perf_counter() - t0)
    cyc = (best - 0.028) * 0.94e9 / N
    print(f"[{name} tc={t_chunk:4d} u={unroll:2d}] best={best * 1e3:6.1f}ms "
          f"rate={V * N / best / 1e9:5.2f}G cyc/smp~{cyc:6.1f}",
          file=sys.stderr, flush=True)


def main():
    p = st.Patch(CFG)
    osc = p.add("Oscillator", val=-1.0, name="vco")
    p.connect(osc, "Sine", p.output, 0)
    for tc, u in ((512, 8), (512, 16), (512, 32), (1024, 16), (2048, 32)):
        bench("sine", p, tc, u)
    full = subtractive_voice(CFG)
    for tc, u in ((512, 8), (512, 16), (1024, 16), (512, 32)):
        bench("full", full, tc, u)


if __name__ == "__main__":
    main()
