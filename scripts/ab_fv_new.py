"""Interleaved A/B: round-4 Freeverb kernel (fs-carry injected into the
damping scan + allpass write-streams) vs the round-3 kernel (kept as the
knobbed copy in probe_fv_parts.build), plus on-device output parity.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_fv_new.py
"""
import importlib.util
import pathlib
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

spec = importlib.util.spec_from_file_location(
    "probe_fv_parts_noexec",
    pathlib.Path(__file__).parent / "probe_fv_parts.py")
# import ONLY build() without executing the probe's main body
src = (pathlib.Path(__file__).parent / "probe_fv_parts.py").read_text()
src = src.split("V, SR = 1024, 48000")[0]
ns = {}
exec(compile(src, "probe_fv_parts_build", "exec"), ns)
old_build = ns["build"]

V, SR, SECS = 1024, 48000, 10
cl, cr, al, ar = line_lengths(SR)
comb_lens = tuple(cl) + tuple(cr)
ap_lens = tuple(al) + tuple(ar)
t_c = (min(comb_lens) // 128) * 128
n = (SECS * SR // t_c) * t_c

rng = np.random.default_rng(0)
mixed = jnp.asarray(rng.normal(size=(V, n)).astype(np.float32) * 0.01)
fs0 = jnp.asarray(rng.normal(size=(V, 16)).astype(np.float32) * 0.01)
damp = jnp.full((V,), 0.2, jnp.float32)
feed = jnp.full((V,), 0.84, jnp.float32)
hists = [jnp.asarray(rng.normal(size=(V, l)).astype(np.float32) * 0.01)
         for l in comb_lens + ap_lens]

float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
log("warmed")

new_run = fvk._build(comb_lens, ap_lens, n, t_c, False)
old_run = old_build(comb_lens, ap_lens, n, t_c)

meters = {
    "new": jax.jit(lambda *a: jnp.abs(new_run(*a)[0]).max()),
    "old": jax.jit(lambda *a: jnp.abs(old_run(*a)).max()),
}
for k, m in meters.items():
    t0 = time.perf_counter()
    peak = float(m(mixed, fs0, damp, feed, *hists))
    log(f"{k}: compile={time.perf_counter()-t0:.1f}s peak={peak:.6f}")

# parity: new kernel vs old on 1 s (old returns only out_l from build())
n1 = (SR // t_c) * t_c
new1 = fvk._build(comb_lens, ap_lens, n1, t_c, False)
old1 = old_build(comb_lens, ap_lens, n1, t_c)
a = np.asarray(new1(mixed[:, :n1], fs0, damp, feed, *hists)[0][:8])
b = np.asarray(old1(mixed[:, :n1], fs0, damp, feed, *hists)[:8])
err = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-9)
log(f"parity max rel err new-vs-old (1 s, 8 voices): {err:.3e}")

damp_hi = jnp.full((V,), 0.8, jnp.float32)
# 0.16 = the bench reverb preset (dampening 0.4): window-8 tier
# 0.2  = default dampening 0.5: window-16 tier
# 0.8  = worst case: full window
damp_lo = jnp.full((V,), 0.16, jnp.float32)
cases = {("new", 0.16): (meters["new"], damp_lo),
         ("old", 0.16): (meters["old"], damp_lo),
         ("new", 0.2): (meters["new"], damp),
         ("old", 0.2): (meters["old"], damp),
         ("new", 0.8): (meters["new"], damp_hi),
         ("old", 0.8): (meters["old"], damp_hi)}
best = {k: 1e9 for k in cases}
order = list(cases)
for r in range(6):
    for k in (order if r % 2 == 0 else order[::-1]):
        m, d = cases[k]
        t0 = time.perf_counter()
        float(m(mixed, fs0, d, feed, *hists))
        dt = time.perf_counter() - t0
        best[k] = min(best[k], dt)
        log(f"round {r} {k}: {dt*1e3:.1f}ms")
for k, b in best.items():
    log(f"BEST {k}: {b*1e3:.1f}ms (device ~{(b-0.028)*1e3/SECS:.2f}ms/s-audio, "
        f"rate={V*n/b/1e9:.2f}G incl transport)")
