"""Intra-kernel attribution for ops/freeverb_kernel at the bench shape:
a knob-parameterized copy of the kernel with pieces disabled (NOT
semantics-preserving -- timing only).  Window-truncation A/B showed the
damping-scan passes are ~free (41.5 vs 40.1 ms for 7 vs 11 passes), so
the cost is elsewhere: comb line rolls, allpass sub-piece rolls, or the
serial dependence structure.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_fv_parts.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

log = lambda *a: print(*a, file=sys.stderr, flush=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from srack_tpu.modules.freeverb import line_lengths
from srack_tpu.ops import freeverb_kernel as fvk

LANES = 128


def build(comb_lens, ap_lens, n, t_c, *, scan=True, comb_roll=True,
          allpass=True, ap_roll=True, fs_col=True, n_comb=16, VB=32):
    n_ap = len(ap_lens)
    half_c = n_comb // 2
    half_a = n_ap // 2
    n_chunks = n // t_c
    min_ap = min(ap_lens)
    spans = []
    s0 = 0
    while s0 < t_c:
        m = min(min_ap, t_c - s0)
        spans.append((s0, m))
        s0 += m
    _shift = fvk._shift

    def kernel(*refs):
        (mixed_ref, fs_in_ref, gp_ref) = refs[:3]
        hin_refs = refs[3:3 + n_comb + n_ap]
        out_l_ref, out_r_ref, fs_ref = refs[3 + n_comb + n_ap:
                                            6 + n_comb + n_ap]
        h_refs = refs[6 + n_comb + n_ap:-1]
        pow_scr = refs[-1]
        t = pl.program_id(1)
        damp = gp_ref[:, 0:1]
        feed = gp_ref[:, 1:2]
        one_m = 1.0 - damp

        @pl.when(t == 0)
        def _():
            fs_ref[...] = fs_in_ref[...]
            for hr, hi in zip(h_refs, hin_refs):
                hr[...] = hi[...]
            P = jnp.broadcast_to(damp, (damp.shape[0], t_c))
            s = 1
            while s < t_c:
                P = P * _shift(P, s, 1.0)
                s <<= 1
            pow_scr[...] = P

        mixed = mixed_ref[...]
        P = pow_scr[...]
        ys = []
        for j in range(n_comb):
            h = h_refs[j][...]
            y = h[:, :t_c]
            B = y * one_m
            if scan:
                ds = damp
                s = 1
                while s < min(t_c, fvk.DAMP_WINDOW):
                    B = B + ds * _shift(B, s, 0.0)
                    ds = ds * ds
                    s <<= 1
            if fs_col:
                fs_t = P * fs_ref[:, j:j + 1] + B
            else:
                fs_t = P * 0.5 + B  # no sub-vreg column read
            w = mixed + fs_t * feed
            if comb_roll:
                h_refs[j][...] = (w if t_c == h.shape[1] else
                                  jnp.concatenate([h[:, t_c:], w], axis=1))
            else:
                h_refs[j][:, :t_c] = w
            if fs_col:
                fs_ref[:, j:j + 1] = fs_t[:, -1:]
            ys.append(y)

        outs = [sum(ys[:half_c]) if half_c else mixed,
                sum(ys[half_c:]) if half_c else mixed]
        for ch in range(2):
            if allpass:
                pieces = []
                for (p0, m) in spans:
                    x = outs[ch][:, p0:p0 + m]
                    for a in range(half_a):
                        hj = n_comb + ch * half_a + a
                        h = h_refs[hj][...]
                        delayed = h[:, :m]
                        w = x + delayed * 0.5
                        x = delayed - x
                        if ap_roll:
                            h_refs[hj][...] = (
                                w if m == h.shape[1] else
                                jnp.concatenate([h[:, m:], w], axis=1))
                        else:
                            h_refs[hj][:, :m] = w
                    pieces.append(x)
                res = pieces[0] if len(pieces) == 1 else jnp.concatenate(
                    pieces, axis=1)
            else:
                res = outs[ch]
            (out_l_ref if ch == 0 else out_r_ref)[...] = res

    all_lens = tuple(comb_lens[:n_comb]) + tuple(ap_lens)

    def lane_spec():
        return pl.BlockSpec((VB, t_c), lambda vt, tt: (vt, tt),
                            memory_space=pltpu.VMEM)

    def state_spec(width):
        return pl.BlockSpec((VB, width), lambda vt, tt: (vt, 0),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def run(mixed, fs, damp, feed, *hists):
        vp = mixed.shape[0]
        fs_p = jnp.pad(fs, ((0, 0), (0, LANES - 16)))
        gp = jnp.stack([damp, feed] + [jnp.zeros_like(damp)] * (LANES - 2),
                       axis=1)
        in_specs = ([lane_spec(), state_spec(LANES), state_spec(LANES)]
                    + [state_spec(l) for l in all_lens])
        out_specs = ([lane_spec(), lane_spec(), state_spec(LANES)]
                     + [state_spec(l) for l in all_lens])
        out_shape = ([jax.ShapeDtypeStruct((vp, n), jnp.float32)] * 2
                     + [jax.ShapeDtypeStruct((vp, LANES), jnp.float32)]
                     + [jax.ShapeDtypeStruct((vp, l), jnp.float32)
                        for l in all_lens])
        outs = pl.pallas_call(
            kernel, grid=(vp // VB, n_chunks),
            in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((VB, t_c), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(mixed, fs_p, gp, *hists)
        return outs[0]

    return run


V, SR = 1024, 48000
cl, cr, al, ar = line_lengths(SR)
comb_lens = tuple(cl) + tuple(cr)
ap_lens = tuple(al) + tuple(ar)
t_c = (min(comb_lens) // 128) * 128
n = (SR // t_c) * t_c

rng = np.random.default_rng(0)
mixed = jnp.asarray(rng.normal(size=(V, n)).astype(np.float32) * 0.01)
fs0 = jnp.zeros((V, 16), jnp.float32)
damp = jnp.full((V,), 0.2, jnp.float32)
feed = jnp.full((V,), 0.84, jnp.float32)
hists_all = [jnp.asarray(rng.normal(size=(V, l)).astype(np.float32) * 0.01)
             for l in comb_lens + ap_lens]

float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))

def timeit(name, comb_lens_v, ap_lens_v, hists, **kw):
    run = build(comb_lens_v, ap_lens_v, n, t_c, **kw)
    meter = jax.jit(lambda *a: jnp.abs(run(*a)).max())
    t0 = time.perf_counter()
    float(meter(mixed, fs0[:, :16], damp, feed, *hists))
    c = time.perf_counter() - t0
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(meter(mixed, fs0[:, :16], damp, feed, *hists))
        best = min(best, time.perf_counter() - t0)
    log(f"[{name:28s}] compile={c:5.1f}s best={best*1e3:6.1f}ms "
        f"rate={V*n/best/1e9:.2f}G/s")


VARIANTS = [
    ("full", dict()),
    ("no-scan", dict(scan=False)),
    ("no-comb-roll", dict(comb_roll=False)),
    ("no-ap-roll", dict(ap_roll=False)),
    ("no-allpass", dict(allpass=False)),
    ("no-fs-col", dict(fs_col=False)),
    ("no-rolls", dict(comb_roll=False, ap_roll=False)),
    ("bare (no scan/roll/ap)", dict(scan=False, comb_roll=False,
                                    allpass=False)),
    ("bare VB=16", dict(scan=False, comb_roll=False, allpass=False, VB=16)),
]
for name, kw in VARIANTS:
    n_comb = kw.get("n_comb", 16)
    hists = hists_all[:n_comb] + hists_all[16:]
    try:
        timeit(name, comb_lens, ap_lens, hists, **kw)
    except Exception as e:
        log(f"[{name}] FAILED: {type(e).__name__}: {str(e)[:200]}")

# short-lines variant: same op structure, delay lines trimmed to t_c
# (tests whether resident-line writeback traffic is the floor)
short_combs = tuple(t_c for _ in comb_lens)
short_aps = tuple(256 for _ in ap_lens)
hists_short = ([h[:, :t_c] for h in hists_all[:16]]
               + [h[:, :256] for h in hists_all[16:]])
timeit("bare short-lines", short_combs, short_aps, hists_short,
       scan=False, comb_roll=False, allpass=False)
log("DONE")
