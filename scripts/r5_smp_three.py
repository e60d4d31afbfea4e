#!/usr/bin/env python
"""Round-5: is the in-config 71.7 ms/call Sample cost caused by putting
THREE kernels in one XLA program?  Time one jit with 3 play_rows on the
kit's real row gates + a mixer-like sum, vs the ~27 ms single call.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_smp_three.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import srack_tpu as st
from srack_tpu.ops import sample_kernel
from srack_tpu.presets import sampler_kit

log = lambda *a: print(*a, file=sys.stderr, flush=True)
V, N, K = 1024, 480000, 48000


def main():
    t0 = time.perf_counter()
    float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
    log(f"warmup {time.perf_counter()-t0:.1f}s")

    cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                         precision="fast")
    patch = sampler_kit(cfg)
    pat = next(h for h in patch if h.name == "pat")
    compiled = st.compile_patch(patch,
                                probes=[(patch.handle(pat.id), str(r))
                                        for r in range(3)])
    _, probes, _ = compiled.render(N, engine="block")
    rows = [np.asarray(v).reshape(-1).astype(np.float32)
            for v in probes.values()]
    t = np.arange(K) / 48000.0
    rng = np.random.default_rng(7)
    waves = [
        (np.sin(2 * np.pi * (45.0 + 85.0 * np.exp(-18.0 * t)) * t)
         * np.exp(-6.0 * t)).astype(np.float32),
        (rng.uniform(-1.0, 1.0, K) * np.exp(-22.0 * t)).astype(np.float32),
        (rng.uniform(-1.0, 1.0, K) * np.exp(-55.0 * t)
         * np.sin(2 * np.pi * 5900.0 * t)).astype(np.float32),
    ]
    gates = [jnp.asarray(np.broadcast_to(g[None], (V, N)).copy())
             for g in rows]
    tbls = [jnp.asarray(np.broadcast_to(w[None], (V, K)).copy())
            for w in waves]

    def one(gate, tbl):
        outs = sample_kernel.play_rows(
            gate, None, tbl,
            jnp.full((V,), 1.0, jnp.float32),
            jnp.zeros((V,), jnp.float32),
            jnp.zeros((V,), bool), jnp.zeros((V,), bool),
            jnp.full((V,), K, jnp.int32))
        return outs[0]

    @jax.jit
    def run3(g0, g1, g2, t0_, t1, t2):
        mix = (0.5 * one(g0, t0_) + 0.3 * one(g1, t1)
               + 0.2 * one(g2, t2))
        return jnp.abs(mix).max()

    t0 = time.perf_counter()
    float(run3(*gates, *tbls))
    log(f"[3 kernels one jit] compile+first {time.perf_counter()-t0:.1f}s")
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(run3(*gates, *tbls))
        best = min(best, time.perf_counter() - t0)
    log(f"[3 kernels one jit] best={best*1e3:.2f}ms "
        f"(device ~{best*1e3-28:.1f}ms; 3x single would be ~81)")

    @jax.jit
    def run1(g0, t0_):
        return jnp.abs(one(g0, t0_)).max()

    t0 = time.perf_counter()
    float(run1(gates[0], tbls[0]))
    log(f"[1 kernel] compile+first {time.perf_counter()-t0:.1f}s")
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(run1(gates[0], tbls[0]))
        best = min(best, time.perf_counter() - t0)
    log(f"[1 kernel] best={best*1e3:.2f}ms (device ~{best*1e3-28:.1f}ms)")


if __name__ == "__main__":
    main()
