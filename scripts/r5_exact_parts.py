#!/usr/bin/env python
"""Round-5: attribute exact-mode time (VERDICT round-4 item 4's second
half).  The exact config (subtractive voice, block engine, f64
phase/state) runs 0.333 G vs the same patch's fast block path at ~10 G:
is the gap f64 op emulation or the serial stage's lax.scan fallback
(exact mode disqualifies the Pallas stage kernel)?

Device-trace the exact render and print the top ops; also time fast-mode
with the Pallas stage forced OFF (use_pallas=False -> same lax.scan
structure, f32) to separate "scan fallback" from "f64".

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_exact_parts.py
"""
import collections
import glob
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_enable_x64", True)

import srack_tpu as st
from srack_tpu.presets import farm_params, subtractive_voice

log = lambda *a: print(*a, file=sys.stderr, flush=True)
V, N = 1024, 96000  # 2 s keeps the trace small


def bench(name, cfg, seg=None, repeats=3, trace=False, note=-1.0):
    patch = subtractive_voice(cfg, note=note)
    compiled = st.compile_patch(patch)
    params = farm_params(patch, V)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape),
                         compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), V)
    fn = compiled._get_fn(N, True, "block", segment=seg)
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
    log(f"[{name}] best={best*1e3:.1f}ms rate={N*V/best/1e9:.3f}G "
        f"ms/s-audio={best*1e3/(N/48000):.2f}")
    if trace:
        outdir = "/tmp/r5_exact_trace"
        with jax.profiler.trace(outdir):
            float(meter(params, state, keys, {}))
        files = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
        for f in sorted(files)[-1:]:
            pd = jax.profiler.ProfileData.from_serialized_xspace(
                open(f, "rb").read())
            for plane in pd.planes:
                if "TPU" not in plane.name:
                    continue
                tot = collections.Counter()
                for line in plane.lines:
                    for ev in line.events:
                        tot[ev.name.split(" = ")[0]] += ev.duration_ns
                log(f"== top ops ({plane.name})")
                for nm, ns in tot.most_common(12):
                    log(f"  {ns/1e6:9.2f} ms  {nm[:100]}")


def main():
    t0 = time.perf_counter()
    float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
    log(f"warmup {time.perf_counter()-t0:.1f}s")
    cfg_x = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                           precision="exact")
    cfg_f = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                           precision="fast")
    try:
        bench("exact 2s", cfg_x, trace=True)
    except Exception as e:
        log(f"[exact] FAILED: {e!r}"[:500])
    try:
        bench("fast 2s (pallas stage)", cfg_f)
    except Exception as e:
        log(f"[fast] FAILED: {e!r}"[:500])
    # fast mode with the lax.scan stage fallback (pallas_ok forced off):
    # same scan structure as exact, f32 math -- separates the serial
    # stage's scan cost from f64 emulation
    try:
        import srack_tpu.block_engine as be
        orig_init = be.BlockProgram.__init__

        def patched(self, *a, **k):
            orig_init(self, *a, **k)
            self.pallas_ok = False

        be.BlockProgram.__init__ = patched
        from srack_tpu import compiler as _c
        _c._COMPILE_CACHE = _c._LRU(_c.COMPILE_CACHE_CAP)
        try:
            bench("fast 2s (scan stage)", cfg_f)
        finally:
            be.BlockProgram.__init__ = orig_init
            _c._COMPILE_CACHE = _c._LRU(_c.COMPILE_CACHE_CAP)
    except Exception as e:
        log(f"[fast-scan] FAILED: {e!r}"[:500])


if __name__ == "__main__":
    main()
