#!/usr/bin/env python
"""Per-module cycle attribution for the fused voice kernel (dev tool).

Times progressively larger sub-patches of the subtractive voice on the
fused engine and reports marginal cycles/sample per module at 1024 voices.
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

V, N = 1024, 480000
CFG = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                     precision="fast")


def build(stage: str) -> Patch:
    p = Patch(CFG)
    osc = p.add("Oscillator", val=-1.0, name="vco",
                antialiasing=(stage not in ("saw_noaa", "sine_noaa")))
    if stage in ("sine", "sine_noaa", "saw_noaa"):
        p.connect(osc, "Sawtooth" if stage == "saw_noaa" else "Sine",
                  p.output, 0)
        return p
    if stage == "saw":
        p.connect(osc, "Sawtooth", p.output, 0)
        return p
    flt = p.add("Moog Filter", freq=0.35, res=0.4, name="vcf")
    p.connect(osc, "Sawtooth", flt, "Audio")
    if stage == "saw+moog":
        p.connect(flt, 0, p.output, 0)
        return p
    gate = p.add("Oscillator", val=-5.5, name="gate_clock",
                 antialiasing=False)
    env = p.add("ADSR", a_sec=0.01, d_sec=0.08, s_val=0.5, r_sec=0.15,
                name="env")
    vca = p.add("VCA", name="vca")
    p.connect(gate, "Square", env, "Gate")
    p.connect(flt, 0, vca, "Audio")
    p.connect(env, 0, vca, "CV")
    p.connect(vca, 0, p.output, 0)
    if stage == "voice":
        return p
    # full: + LFO pitch mod (the headline topology)
    lfo = p.add("Oscillator", val=-7.0, name="lfo")
    depth = p.add("Multiply", constant=0.02, name="lfo_depth")
    p.connect(lfo, "Sine", depth, "In1")
    p.connect(depth, 0, osc, "CV")
    return p


def bench(name, patch):
    compiled = st.compile_patch(patch)
    params = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape),
                          patch.params())
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape),
                         compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), V)
    fn = compiled._get_fn(N, True, "fused")
    meter = make_meter(fn)
    float(meter(params, state, keys, {}))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(meter(params, state, keys, {}))
        best = min(best, time.perf_counter() - t0)
    cyc = cycles_per_sample(best, N)  # minus fixed transport overhead
    print(f"[{name:10s}] best={best * 1e3:7.1f}ms "
          f"rate={V * N / best / 1e9:6.2f}G cycles/sample~{cyc:6.1f}",
          file=sys.stderr, flush=True)
    return cyc


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)
    prev = 0.0
    for stage in ("sine", "sine_noaa", "saw_noaa", "saw", "saw+moog",
                  "voice", "full"):
        c = bench(stage, build(stage))
        print(f"    marginal: {c - prev:+.1f} cycles/sample",
              file=sys.stderr, flush=True)
        prev = c


if __name__ == "__main__":
    main()
