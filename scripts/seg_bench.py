"""Measure device-side segmented renders vs the current bench ladder.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/seg_bench.py
"""
import sys
import time

import jax
import jax.numpy as jnp

import srack_tpu as st
from srack_tpu.presets import (drum_machine, farm_params, reverb_patch,
                               sampler_kit, subtractive_voice)


def log(m):
    print(m, file=sys.stderr, flush=True)


def bench(name, patch, n, voices, engine, segment=None, repeats=3):
    compiled = st.compile_patch(patch)
    params = farm_params(patch, voices)
    state = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (voices,) + a.shape),
        compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), voices)
    fn = compiled._get_fn(n, True, engine, segment=segment)
    meter = jax.jit(lambda p, s, k, d: jnp.abs(fn(p, s, k, d)[0]).max())
    t0 = time.perf_counter()
    peak = float(meter(params, state, keys, {}))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        peak = float(meter(params, state, keys, {}))
        best = min(best, time.perf_counter() - t0)
    rate = n * voices / best
    log(f"[{name}] n={n} seg={segment} compile={compile_s:.1f}s "
        f"best={best * 1e3:.1f}ms rate={rate / 1e9:.3f}G peak={peak:.3f}")
    return rate


def main():
    import os
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/srack_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    t0 = time.perf_counter()
    float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
    log(f"warmup {time.perf_counter() - t0:.1f}s on {jax.devices()[0].device_kind}")
    cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                         precision="fast")

    # block configs at 30 s segmented (currently degrade to 10 s plain)
    for name, patch in (("drums", drum_machine(cfg)),
                        ("sampler", sampler_kit(cfg)),
                        ("reverb", reverb_patch(cfg))):
        try:
            bench(f"{name} x1024 30s seg10s", patch, 1440000, 1024,
                  "block", segment=480000)
        except Exception as e:
            log(f"[{name} seg] failed: {e!r}")

    # headline: 60 s segmented (30 s plain is the current champion; 40 s
    # plain OOMs).  Output alone is 11.8 GB -- may OOM.
    try:
        bench("subtractive x1024 60s seg30s", subtractive_voice(cfg),
              2880000, 1024, "fused", segment=1440000)
    except Exception as e:
        log(f"[headline 60s seg] failed: {e!r}")


if __name__ == "__main__":
    main()
