"""Time the whole-Freeverb Pallas kernel standalone at the bench shape
([1024 voices x 48000 samples], 48 kHz line lengths) — attribution for
the reverb config's block-path cost (scripts/profile_reverb.py times the
full patch; this isolates ops/freeverb_kernel).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_fv_kernel.py
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

V, SR = 1024, 48000
cl, cr, al, ar = line_lengths(SR)
comb_lens = tuple(cl) + tuple(cr)
ap_lens = tuple(al) + tuple(ar)
chunk = min(comb_lens)
t_c = (chunk // 128) * 128
n = (SR // t_c) * t_c
log(f"t_c={t_c} n={n} combs={comb_lens} aps={ap_lens}")

rng = np.random.default_rng(0)
mixed = jnp.asarray(rng.normal(size=(V, n)).astype(np.float32) * 0.01)
fs0 = jnp.zeros((V, 16), jnp.float32)
damp = jnp.full((V,), 0.2, jnp.float32)
feed = jnp.full((V,), 0.84, jnp.float32)
hists = [jnp.asarray(rng.normal(size=(V, l)).astype(np.float32) * 0.01)
         for l in comb_lens + ap_lens]

# warm the compile service
float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))

for window in (128, 4096):
    fvk.DAMP_WINDOW = window
    fvk._build.cache_clear()
    run = fvk._build(comb_lens, ap_lens, n, t_c, False)
    meter = jax.jit(lambda *a: jnp.abs(run(*a)[0]).max())
    t0 = time.perf_counter()
    peak = float(meter(mixed, fs0, damp, feed, *hists))
    c = time.perf_counter() - t0
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(meter(mixed, fs0, damp, feed, *hists))
        best = min(best, time.perf_counter() - t0)
    log(f"window={window} compile={c:.1f}s best={best*1e3:.1f}ms "
        f"rate={V*n/best/1e9:.2f}G/s peak={peak:.6f}")
fvk.DAMP_WINDOW = 128
