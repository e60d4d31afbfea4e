#!/usr/bin/env python
"""Interleaved A/B timing of fused-kernel patch variants (dev tool).

Answers questions the marginal profile (profile_voice.py) is too noisy
for, chiefly: does Mosaic dead-code-eliminate unused module outputs (e.g.
the polyBLEP square/saw of an oscillator whose Sine is the only connected
output), and what does a *used* polyBLEP actually cost?

Method: long renders (30 s -> 1 cycle/sample = 1.5 ms at 1024 voices) and
interleaved rounds (A,B,C,A,B,C,...) so clock drift and background device
load hit every variant equally; report min over rounds.
"""
import sys
import time

import jax
import jax.numpy as jnp

import srack_tpu as st
from srack_tpu.patch import Patch
from profcommon import cycles_per_sample, make_meter

jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V, N = 1024, 1440000
ROUNDS = 6
CFG = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                     precision="fast")


def build(stage: str) -> Patch:
    p = Patch(CFG)
    aa = not stage.endswith("_noaa")
    base = stage[:-5] if stage.endswith("_noaa") else stage
    osc = p.add("Oscillator", val=-1.0, antialiasing=aa)
    mix = p.add("Mono Mixer", gains=(0.3, 0.3, 0.3, 0.0))
    if base == "sine":
        p.connect(osc, "Sine", mix, 0)
    elif base == "saw":
        p.connect(osc, "Sawtooth", mix, 0)
    elif base == "square":
        p.connect(osc, "Square", mix, 0)
    elif base == "all3":
        p.connect(osc, "Sine", mix, 0)
        p.connect(osc, "Square", mix, 1)
        p.connect(osc, "Sawtooth", mix, 2)
    else:
        raise ValueError(stage)
    p.connect(mix, 0, p.output, 0)
    return p


def prepare(stage: str):
    patch = build(stage)
    compiled = st.compile_patch(patch)
    params = st.replicate_params(patch.params(), V)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape),
                         compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), V)
    fn = compiled._get_fn(N, True, "fused")
    meter = make_meter(fn)
    t0 = time.perf_counter()
    float(meter(params, state, keys, {}))  # compile + warm
    print(f"[{stage:10s}] compiled in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)
    return lambda: float(meter(params, state, keys, {}))


def main():
    stages = sys.argv[1:] or ["sine", "sine_noaa", "saw", "saw_noaa", "all3",
                              "all3_noaa"]
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}  V={V} N={N}",
          file=sys.stderr)
    runners = {s: prepare(s) for s in stages}
    best = {s: float("inf") for s in stages}
    for r in range(ROUNDS):
        for s in stages:
            t0 = time.perf_counter()
            runners[s]()
            best[s] = min(best[s], time.perf_counter() - t0)
    for s in stages:
        cyc = cycles_per_sample(best[s], N)
        print(f"[{s:10s}] best={best[s] * 1e3:7.1f}ms "
              f"cycles/sample~{cyc:6.1f}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
