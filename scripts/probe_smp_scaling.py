"""Why are the 2nd/3rd Samples 4x the 1st's marginal cost in the
sampler-kit config (scripts/ab_sampler.py: patonly 44.2, +6.3, +24.0,
+27.9 ms at [1024 x 96000])?  Time K independent position+gather pairs
in ONE jit, fed from K distinct gate lanes, summed at the end -- the
kernels alone, no block-engine glue.  If K pairs scale linearly, the
blowup lives in the engine path (lane materialization, fusion breaks),
not the kernels.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_smp_scaling.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

log = lambda *a: print(*a, file=sys.stderr, flush=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from srack_tpu.ops import sample_kernel

V, N, K = 1024, 96000, 48000

rng = np.random.default_rng(0)
tables = [jnp.asarray(rng.normal(size=K).astype(np.float32) * 0.3)
          for _ in range(3)]
# staggered periodic triggers per "row", like the kit's pattern rows
gates = []
for r in range(3):
    period = 6000 * (r + 2)
    g = (np.arange(N)[None] % period < 48).astype(np.float32)
    gates.append(jnp.asarray(np.broadcast_to(g, (V, N)).copy()))

state0 = {"pos": jnp.zeros((V,), jnp.float32),
          "playing": jnp.zeros((V,), jnp.bool_),
          "gate_last": jnp.ones((V,), jnp.bool_)}


def make(k):
    def run(gs, tbls):
        outs = []
        for i in range(k):
            out, *_ = jax.vmap(
                lambda g, t: sample_kernel.play_table(
                    g, None, t, jnp.float32(1.0), jnp.float32(0.0),
                    jnp.bool_(False), jnp.bool_(True), jnp.int32(K)),
                in_axes=(0, None))(gs[i], tbls[i])
            outs.append(out)
        acc = outs[0]
        for o in outs[1:]:
            acc = acc + o
        return jnp.abs(acc).max()
    return jax.jit(run)


float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
log("warmed")

meters = {}
for k in (1, 2, 3):
    try:
        m = make(k)
        t0 = time.perf_counter()
        float(m(gates, tables))
        log(f"k={k}: compile={time.perf_counter()-t0:.1f}s")
        meters[k] = m
    except Exception as e:
        log(f"k={k} FAILED: {type(e).__name__}: {str(e)[:300]}")

best = {k: 1e9 for k in meters}
order = list(meters)
for r in range(6):
    for k in (order if r % 2 == 0 else order[::-1]):
        t0 = time.perf_counter()
        float(meters[k](gates, tables))
        best[k] = min(best[k], time.perf_counter() - t0)
for k, b in best.items():
    log(f"BEST k={k}: {b*1e3:.1f}ms (device ~{(b-0.028)*1e3:.1f}ms)")
prev = None
for k, b in best.items():
    if prev is not None:
        log(f"marginal k={k}: {(b-prev)*1e3:+.1f}ms")
    prev = b
