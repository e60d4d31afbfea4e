#!/usr/bin/env python
"""Round-5 TPU batch 5: slim-tier validation.
1. On-device block parity certification (tpu_parity_block.main).
2. Kit bench aligned triggers (regression check vs 3.68G).
3. Kit bench with per-voice randomized clock tempos (the scattered
   workload; pre-slim baseline was 1.825G) -- does the slim general
   tier recover part of the gap?

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_tpu_batch5.py
"""
import sys
import time

sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import srack_tpu as st
from srack_tpu.presets import farm_params, sampler_kit
import r5_kit_parts
import subprocess

log = r5_kit_parts.log


def bench_scattered(name, n, seg, repeats=5):
    cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                         precision="fast")
    patch = sampler_kit(cfg)
    V = 1024
    compiled = st.compile_patch(patch)
    params = farm_params(patch, V)
    # re-scatter the clock tempo per voice (the pre-round-5 behavior)
    rng = np.random.default_rng(3)
    clk = next(i for i in patch if i.name == "clock")
    params[clk.id]["val"] = jnp.asarray(
        np.float32(-4.5) + rng.uniform(-1, 1, V).astype(np.float32))
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
    rc = subprocess.run(
        [sys.executable, "/root/repo/scripts/tpu_parity_block.py"]).returncode
    log(f"tpu_parity_block rc={rc}")
    cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                         precision="fast")
    r5_kit_parts.bench("kit 30s aligned (slim in tree)", sampler_kit(cfg),
                       1440000, 480000)
    bench_scattered("kit 30s scattered clocks", 1440000, 480000)


if __name__ == "__main__":
    main()
