"""Marginal-cost attribution for the sampler-kit config (0.82 G vs 1 G
target at 2 s renders): interleaved A/B of stripped variants.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_sampler.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import srack_tpu as st
from srack_tpu.patch import Patch

log = lambda *a: print(*a, file=sys.stderr, flush=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V, N = 1024, 96000
ROUNDS = 4
CFG = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                     precision="fast")


def build(stage: str) -> Patch:
    sr = CFG.sample_rate
    p = Patch(CFG)
    clk = p.add("Oscillator", val=-4.5, name="clock")
    pat = p.add("Pattern Sequencer", n_steps=16, name="pat",
                pattern=[
                    [True, None, None, None] * 4,
                    [None, None, True, None] * 4,
                    [True, True, False, True] * 4,
                ])
    p.connect(clk, "Square", pat, "Step")
    if stage == "patonly":
        p.connect(pat, "0", p.output, 0)
        return p

    t = np.arange(sr, dtype=np.float64) / sr
    rng = np.random.default_rng(7)
    waves = [
        (np.sin(2 * np.pi * (45.0 + 85.0 * np.exp(-18.0 * t)) * t)
         * np.exp(-6.0 * t)).astype(np.float32),
        (rng.uniform(-1.0, 1.0, sr) * np.exp(-22.0 * t)).astype(np.float32),
        (rng.uniform(-1.0, 1.0, sr) * np.exp(-55.0 * t)
         * np.sin(2 * np.pi * 5900.0 * t)).astype(np.float32),
    ]
    n_smp = {"smp1": 1, "smp2": 2}.get(stage, 3)
    if stage == "short":  # 900-frame tables: small-table static gather
        waves = [w[:900] for w in waves]
    mix = p.add("Mono Mixer", gains=(0.5, 0.3, 0.2, 0.0), name="mix")
    cvsrc = None
    if stage == "fullcv":
        # a zeros CV lane forces the connected-CV (prefix-sum) position
        # pipeline with audio identical to the const-rate path
        cvsrc = p.add("Multiply", constant=0.0, name="cv0")
    for row in range(n_smp):
        smp = p.add("Sample", samples=waves[row], wav_sample_rate=sr,
                    name=f"s{row}")
        p.connect(pat, str(row), smp, "Gate")
        if cvsrc is not None:
            p.connect(cvsrc, 0, smp, "CV")
        p.connect(smp, 0, mix, row)
    p.connect(mix, 0, p.output, 0)
    return p


def prepare(stage):
    patch = build(stage)
    compiled = st.compile_patch(patch)
    params = st.replicate_params(patch.params(), V)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape),
                         compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), V)
    fn = compiled._get_fn(N, True, "block")
    meter = jax.jit(lambda p, s, k: jnp.abs(fn(p, s, k, {})[0]).max())
    return meter, (params, state, keys)


def main():
    stages = ["full", "fullcv", "smp2", "smp1", "short", "patonly"]
    meters = {}
    for s in stages:
        t0 = time.perf_counter()
        meters[s] = prepare(s)
        m, args = meters[s]
        float(m(*args))
        log(f"built {s} ({time.perf_counter()-t0:.0f}s)")
    best = {s: 1e9 for s in stages}
    for _ in range(ROUNDS):
        for s in stages:
            m, args = meters[s]
            t0 = time.perf_counter()
            float(m(*args))
            best[s] = min(best[s], time.perf_counter() - t0)
    for s in stages:
        log(f"[{s}] t={best[s]*1e3:.1f}ms rate={V*N/best[s]/1e9:.2f}G/s")


if __name__ == "__main__":
    main()
