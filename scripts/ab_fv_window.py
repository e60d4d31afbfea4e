"""Interleaved A/B: Freeverb-kernel damping-scan window 128 vs 4096 (full)
at a 10 s render — transport (~22-28 ms/call) and inter-run drift made
single-shot 1 s comparisons unreadable (probe_fv_parts).  Rounds alternate
A/B on the same process and device; report per-variant min.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_fv_window.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

log = lambda *a: print(*a, file=sys.stderr, flush=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from srack_tpu.modules.freeverb import line_lengths
from srack_tpu.ops import freeverb_kernel as fvk

V, SR, SECS = 1024, 48000, 10
cl, cr, al, ar = line_lengths(SR)
comb_lens = tuple(cl) + tuple(cr)
ap_lens = tuple(al) + tuple(ar)
t_c = (min(comb_lens) // 128) * 128
n = (SECS * SR // t_c) * t_c

rng = np.random.default_rng(0)
mixed = jnp.asarray(rng.normal(size=(V, n)).astype(np.float32) * 0.01)
fs0 = jnp.zeros((V, 16), jnp.float32)
damp = jnp.full((V,), 0.2, jnp.float32)
feed = jnp.full((V,), 0.84, jnp.float32)
hists = [jnp.asarray(rng.normal(size=(V, l)).astype(np.float32) * 0.01)
         for l in comb_lens + ap_lens]

float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))

meters = {}
for window in (128, 4096):
    fvk.DAMP_WINDOW = window
    fvk._build.cache_clear()
    run = fvk._build(comb_lens, ap_lens, n, t_c, False)
    meter = jax.jit(lambda *a, _r=run: jnp.abs(_r(*a)[0]).max())
    t0 = time.perf_counter()
    peak = float(meter(mixed, fs0, damp, feed, *hists))
    log(f"window={window} compile={time.perf_counter()-t0:.1f}s "
        f"peak={peak:.6f}")
    meters[window] = meter
fvk.DAMP_WINDOW = 128
fvk._build.cache_clear()

best = {128: 1e9, 4096: 1e9}
for r in range(6):
    for window in (128, 4096) if r % 2 == 0 else (4096, 128):
        t0 = time.perf_counter()
        float(meters[window](mixed, fs0, damp, feed, *hists))
        dt = time.perf_counter() - t0
        best[window] = min(best[window], dt)
        log(f"round {r} window={window}: {dt*1e3:.1f}ms")
for window, b in best.items():
    log(f"BEST window={window}: {b*1e3:.1f}ms "
        f"(device ~{(b-0.025)*1e3:.1f}ms/{SECS}s, "
        f"rate={V*n/b/1e9:.2f}G incl transport)")
