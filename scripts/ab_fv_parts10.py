"""INTERLEAVED intra-kernel attribution for the Freeverb kernel at 10 s
renders (probe_fv_parts' sequential 1 s timings drift by more than the
effects being measured -- full=45.9 vs 52.5 ms across two runs of the
same build; rounds here alternate variants in one process).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_fv_parts10.py
"""
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

src = (pathlib.Path(__file__).parent / "probe_fv_parts.py").read_text()
src = src.split("V, SR = 1024, 48000")[0]
ns = {}
exec(compile(src, "probe_fv_parts_build", "exec"), ns)
build = ns["build"]

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
log("warmed")

VARIANTS = [
    ("full", dict()),
    ("no-scan", dict(scan=False)),
    ("no-rolls", dict(comb_roll=False, ap_roll=False)),
    ("no-fs-col", dict(fs_col=False)),
    ("no-allpass", dict(allpass=False)),
    ("bare", dict(scan=False, comb_roll=False, allpass=False,
                  fs_col=False)),
]
meters = {}
for name, kw in VARIANTS:
    try:
        run = build(comb_lens, ap_lens, n, t_c, **kw)
        m = jax.jit(lambda *a, _r=run: jnp.abs(_r(*a)).max())
        t0 = time.perf_counter()
        float(m(mixed, fs0, damp, feed, *hists))
        log(f"built {name} compile={time.perf_counter()-t0:.1f}s")
        meters[name] = m
    except Exception as e:
        log(f"[{name}] FAILED: {type(e).__name__}: {str(e)[:150]}")

best = {k: 1e9 for k in meters}
order = list(meters)
for r in range(8):
    for k in (order if r % 2 == 0 else order[::-1]):
        t0 = time.perf_counter()
        float(meters[k](mixed, fs0, damp, feed, *hists))
        dt = time.perf_counter() - t0
        best[k] = min(best[k], dt)
log("")
full = best.get("full", 0)
for k, b in best.items():
    log(f"BEST {k:12s}: {b*1e3:6.1f}ms  delta-vs-full={-(full-b)*1e3:+6.1f}ms"
        f"  device~{(b-0.028)*1e3/SECS:5.2f}ms/s-audio")
