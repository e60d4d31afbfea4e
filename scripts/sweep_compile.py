"""Compile-latency frontier (round-3 item 7): cold-compile time vs
throughput across unroll depths on the headline config.

NO persistent compile cache: every build pays the true cold Mosaic compile.
Target: an auto-unroll default holding >=95% of headline throughput
(>=15.5 G) at <120 s cold compile.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_compile.py
"""
import sys
import time

import jax
import jax.numpy as jnp

import srack_tpu as st
from srack_tpu.ops import fused
from srack_tpu.presets import farm_params, subtractive_voice

log = lambda *a: print(*a, file=sys.stderr, flush=True)

V, N = 1024, 1440000
CFG = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                     precision="fast")

patch = subtractive_voice(CFG)
compiled = st.compile_patch(patch)
params = farm_params(patch, V)
state = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape),
                     compiled.init_state())
keys = jax.random.split(jax.random.PRNGKey(0), V)

for unroll in (16, 24, 32, 48):
    try:
        fn = jax.jit(fused.make_fused_render(compiled, N, unroll=unroll))
        meter = jax.jit(lambda p, s, k: jnp.abs(fn(p, s, k, {})[0]).max())
        t0 = time.perf_counter()
        peak = float(meter(params, state, keys))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            peak = float(meter(params, state, keys))
            best = min(best, time.perf_counter() - t0)
        log(f"[unroll={unroll}] compile={compile_s:.1f}s "
            f"best={best*1e3:.1f}ms rate={V*N/best/1e9:.2f}G/s peak={peak:.3f}")
    except Exception as e:
        log(f"[unroll={unroll}] FAILED: {e!r}")
log("DONE")
