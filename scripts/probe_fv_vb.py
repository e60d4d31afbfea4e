"""Freeverb probe round 2: VB/t_c sweep + in-kernel rotation feasibility.

1. Does Mosaic support a dynamic lane-START slice of static size
   (``hcat[:, pl.ds(idx, L)]``)?  That makes the ring->chronological
   rotation (measured 39 ms of the 93 ms reverb render) a once-per-render
   in-kernel no-op-cost.
2. VB in {32, 64} x t_c in {1152, 640}: per-op overhead amortization and
   the no-XLA-tail divisor (640 | 48000).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_fv_vb.py
"""
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srack_tpu.modules.freeverb import line_lengths
from srack_tpu.ops import freeverb_kernel as fvk

log = lambda *a: print(*a, file=sys.stderr, flush=True)
log("backend:", jax.default_backend(), jax.devices())
jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def attempt(name, f):
    try:
        r = f()
        log(f"[OK ] {name}: {r}")
    except Exception:
        log(f"[ERR] {name}:")
        traceback.print_exc(file=sys.stderr)


def test_dyn_lane_slice():
    """rot[r] = concat(buf[r], buf[r])[idx_r : idx_r + L] per row."""
    R, L = 8, 1218

    def kern(b_ref, i_ref, o_ref):
        hcat = jnp.concatenate([b_ref[...], b_ref[...]], axis=1)
        rows = []
        for r in range(R):
            start = i_ref[0, r]
            rows.append(hcat[r:r + 1, pl.ds(start, L)])
        o_ref[...] = jnp.concatenate(rows, axis=0)

    buf = jax.random.normal(jax.random.PRNGKey(0), (R, L), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (1, R), 0, L)

    @jax.jit
    def run(buf, idx):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
        )(buf, idx)

    out = np.asarray(run(buf, idx))
    want = np.stack([np.roll(np.asarray(buf)[r], -int(idx[0, r]))
                     for r in range(R)])
    t0 = time.perf_counter()
    for _ in range(3):
        float(jnp.abs(run(buf, idx)).max())
    dt = (time.perf_counter() - t0) / 3
    return f"correct={np.allclose(out, want)} t={dt*1e3:.1f}ms"


def time_kernel(vb, t_c, n):
    fvk.VB = vb
    fvk._build.cache_clear()
    cl, cr, al, ar = line_lengths(48000)
    comb_lens = tuple(cl) + tuple(cr)
    ap_lens = tuple(al) + tuple(ar)
    V = 1024
    rng = np.random.default_rng(0)
    mixed = jnp.asarray(rng.normal(size=(V, n)) * 0.015, jnp.float32)
    fs = jnp.zeros((V, 16), jnp.float32)
    damp = jnp.full((V,), 0.4, jnp.float32)
    feed = jnp.full((V,), 0.84, jnp.float32)
    hists = [jnp.asarray(rng.normal(size=(V, l)) * 0.1, jnp.float32)
             for l in comb_lens + ap_lens]
    run = fvk._build(comb_lens, ap_lens, n, t_c, False)
    out = run(mixed, fs, damp, feed, *hists)
    float(jnp.abs(out[0]).max())
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(mixed, fs, damp, feed, *hists)
        float(jnp.abs(out[0]).max())
        best = min(best, time.perf_counter() - t0)
    return f"VB={vb} t_c={t_c} n={n} t={best*1e3:.1f}ms rate={V*n/best/1e9:.2f}G/s"


if __name__ == "__main__":
    attempt("dyn lane-start slice", test_dyn_lane_slice)
    attempt("VB32 t1152", lambda: time_kernel(32, 1152, 41 * 1152))
    attempt("VB64 t1152", lambda: time_kernel(64, 1152, 41 * 1152))
    attempt("VB32 t640", lambda: time_kernel(32, 640, 48000))
    attempt("VB64 t640", lambda: time_kernel(64, 640, 48000))
    attempt("VB64 t896", lambda: time_kernel(64, 896, 53 * 896))
