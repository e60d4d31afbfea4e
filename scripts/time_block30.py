"""Time the three block-engine bench configs at the bench shapes
(30 s renders, device-side segmented) — dev tool mirroring
bench.bench_config's one-dispatch metering.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/time_block30.py
"""
import sys
import time

import jax
import jax.numpy as jnp

import srack_tpu as st
from srack_tpu.presets import (drum_machine, farm_params, reverb_patch,
                               sampler_kit)

log = lambda *a: print(*a, file=sys.stderr, flush=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V = 1024
CFG = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                     precision="fast")


def run(name, patch, n, seg, repeats=5):
    compiled = st.compile_patch(patch)
    params = farm_params(patch, V)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape),
                         compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), V)
    fn = compiled._get_fn(n, True, "block", segment=seg)
    meter = jax.jit(lambda p, s, k: jnp.abs(fn(p, s, k, {})[0]).max())
    t0 = time.perf_counter()
    peak = float(meter(params, state, keys))
    log(f"[{name}] compile+first {time.perf_counter() - t0:.0f}s "
        f"peak={peak:.3f}")
    best = 1e9
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(meter(params, state, keys))
        best = min(best, time.perf_counter() - t0)
    log(f"[{name}] n={n} seg={seg}: best={best * 1e3:.1f}ms "
        f"rate={n * V / best / 1e9:.3f}G samples/s "
        f"(device ~{(best - 0.028) * 1e3:.1f}ms, "
        f"~{n * V / max(best - 0.028, 1e-9) / 1e9:.2f}G)")


if __name__ == "__main__":
    float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
    log("warmed")
    n, seg = 1440000, 480000
    run("sampler30", sampler_kit(CFG), n, seg)
    run("drums30", drum_machine(CFG), n, seg)
    run("reverb30", reverb_patch(CFG), n, seg)
