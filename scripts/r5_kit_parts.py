#!/usr/bin/env python
"""Round-5 sampler-kit decomposition: the three fused Sample kernels are
only ~2 ms/s-audio device EACH (r5_smp_parts.py: 48.6 ms per 10 s x 1024
dispatch incl ~28 ms transport) yet the kit config measures ~27 ms/s.
Isolate the missing ~18 ms/s: segment glue vs per-Sample marginal cost
vs the clock/sequencer/mixer baseline.

Variants (all 1024 voices):
* kit 30s seg=480k  -- the bench config (baseline ~26.9 ms/s);
* kit 10s noseg     -- no segmented-scan glue;
* kit-1smp 10s noseg -- kick only (marginal Sample cost);
* kit-0smp 10s noseg -- clock+pat wired straight into the mixer
                        (stage + block plumbing, no Sample kernels).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_kit_parts.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import srack_tpu as st
from srack_tpu.presets import farm_params, sampler_kit

log = lambda *a: print(*a, file=sys.stderr, flush=True)
V = 1024


def kit_n_samples(cfg, n_smp):
    """sampler_kit with only the first ``n_smp`` Sample modules; the
    remaining pattern rows feed the mixer directly (gates as audio) so
    the stage/post structure stays comparable."""
    p = st.Patch(cfg)
    sr = cfg.sample_rate
    clk = p.add("Oscillator", val=-4.5, name="clock")
    pat = p.add("Pattern Sequencer", n_steps=16, name="pat",
                pattern=[
                    [True, None, None, None] * 4,
                    [None, None, True, None] * 4,
                    [True, True, False, True] * 4,
                ])
    p.connect(clk, "Square", pat, "Step")
    t = np.arange(sr, dtype=np.float64) / sr
    rng = np.random.default_rng(7)
    waves = [
        (np.sin(2 * np.pi * (45.0 + 85.0 * np.exp(-18.0 * t)) * t)
         * np.exp(-6.0 * t)).astype(np.float32),
        (rng.uniform(-1.0, 1.0, sr) * np.exp(-22.0 * t)).astype(np.float32),
        (rng.uniform(-1.0, 1.0, sr) * np.exp(-55.0 * t)
         * np.sin(2 * np.pi * 5900.0 * t)).astype(np.float32),
    ]
    mix = p.add("Mono Mixer", gains=(0.5, 0.3, 0.2, 0.0), name="mix")
    for row in range(3):
        if row < n_smp:
            smp = p.add("Sample", samples=waves[row], wav_sample_rate=sr,
                        name=f"s{row}")
            p.connect(pat, str(row), smp, "Gate")
            p.connect(smp, 0, mix, row)
        else:
            p.connect(pat, str(row), mix, row)
    p.connect(mix, 0, p.output, 0)
    return p


def bench(name, patch, n, seg, repeats=5):
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
    cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                         precision="fast")
    for name, patch, n, seg in (
        ("kit 30s seg480k", sampler_kit(cfg), 1440000, 480000),
        ("kit 10s noseg", sampler_kit(cfg), 480000, None),
        ("kit-1smp 10s noseg", kit_n_samples(cfg, 1), 480000, None),
        ("kit-0smp 10s noseg", kit_n_samples(cfg, 0), 480000, None),
    ):
        try:
            bench(name, patch, n, seg)
        except Exception as e:
            log(f"[{name}] FAILED: {e!r}"[:500])


if __name__ == "__main__":
    main()
