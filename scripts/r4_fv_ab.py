#!/usr/bin/env python
"""A/B the fused-shell Freeverb kernel and the divisor t_c (dev tool).

Config A: fused in/out mix (entry_mix), default t_c=1152 (768-sample XLA
tail per 480k segment).  Config B: same + t_c=768 (divides 480000, no
tail, +50% ring-roll traffic).  Both at the bench reverb config,
30 s x 1024 voices, segment=480k.
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import srack_tpu as st
from srack_tpu.modules import freeverb as fvmod
from srack_tpu.presets import farm_params, reverb_patch


def log(m):
    print(m, file=sys.stderr, flush=True)


def measure(tag, n, seg, voices=1024):
    cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                         precision="fast")
    patch = reverb_patch(cfg)
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
    log(f"[{tag}] compile+first {time.perf_counter()-t0:.1f}s "
        f"peak={peak:.3f}")
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        peak = float(meter(params, state, keys, {}))
        best = min(best, time.perf_counter() - t0)
    log(f"[{tag}] best={best*1e3:.1f}ms rate={n*voices/best/1e9:.3f}G "
        f"ms/s-audio={best*1e3/(n/48000):.2f}")
    return best


def main():
    t0 = time.perf_counter()
    float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
    log(f"warmup {time.perf_counter()-t0:.1f}s")
    n, seg = 1440000, 480000
    a = measure("A fused-mix t_c=1152", n, seg)
    orig = fvmod._pick_t_c
    try:
        fvmod._pick_t_c = lambda chunk, nn: 768
        # new topology-independent caches: _get_fn caches key on (n,...)
        # only, so force a fresh compiled patch via a fresh process-level
        # cache -- easiest is clearing the compile caches
        st.compiler._COMPILE_CACHE.clear()
        b = measure("B fused-mix t_c=768", n, seg)
    finally:
        fvmod._pick_t_c = orig
    log(f"A/B: {a*1e3:.1f} vs {b*1e3:.1f} ms")


if __name__ == "__main__":
    main()
