"""Freeverb kernel variant probe (round-3 item 2: 0.53 -> >=1 G).

Times the whole-Freeverb VMEM kernel in isolation at farm scale
([1024 voices x 48000 samples], 48 kHz line lengths) across variants:

  A  baseline (ops/freeverb_kernel._build as shipped): t_c=1152,
     whole-chunk log-doubling damping scans (cross-vreg shifts)
  B  t_c=1024: power-of-two chunk (8 aligned vregs, 10 clean log steps)
  C  two-level damping scan at t_c=1024: per-128-lane-block local scans
     (intra-vreg shifts only) + tiny cross-block carry combine
  D  C + all 16 combs stacked into ONE [VB, 16, S, 128] scan (16x fewer,
     16x bigger vector ops -- amortizes Mosaic per-op overhead)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_fv.py
"""
import functools
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

LANES = 128
VB = 32
ALLPASS_FEEDBACK = 0.5


def _shift(x, s, fill):
    rows, n = x.shape
    if s >= n:
        return jnp.full_like(x, fill)
    pad = jnp.full((rows, s), fill, x.dtype)
    return jnp.concatenate([pad, x[:, : n - s]], axis=1)


def _ceil_to(x, m):
    return -(-x // m) * m


@functools.lru_cache(maxsize=None)
def build_variant(variant, comb_lens, ap_lens, n, t_c):
    """Variants C/D: restructured comb damping scans."""
    n_comb = len(comb_lens)
    n_ap = len(ap_lens)
    half_c = n_comb // 2
    half_a = n_ap // 2
    assert t_c % LANES == 0 and t_c <= min(comb_lens)
    n_chunks = n // t_c
    S = t_c // LANES
    min_ap = min(ap_lens)
    spans = []
    s0 = 0
    while s0 < t_c:
        m = min(min_ap, t_c - s0)
        spans.append((s0, m))
        s0 += m

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
            # damp^(i+1) for i in 0..127 (one lane block)
            P = jnp.broadcast_to(damp, (damp.shape[0], LANES))
            s = 1
            while s < LANES:
                P = P * _shift(P, s, 1.0)
                s <<= 1
            pow_scr[...] = P

        mixed = mixed_ref[...]
        P128 = pow_scr[...]                      # [VB, 128] = damp^(i+1)
        d128 = P128[:, -1:]                      # damp^128

        def local_scan(B, ds0):
            # inclusive constant-coeff scan along the last (lane) axis
            ds = ds0
            s = 1
            while s < LANES:
                pad_shape = B.shape[:-1] + (s,)
                pad = jnp.zeros(pad_shape, B.dtype)
                Bs = jnp.concatenate([pad, B[..., : LANES - s]], axis=-1)
                B = B + ds * Bs
                ds = ds * ds
                s <<= 1
            return B

        if variant == "D":
            ys = jnp.stack([h_refs[j][:, :t_c] for j in range(n_comb)],
                           axis=1)                       # [VB, 16, t_c]
            B = (ys * one_m[:, None, :]).reshape(VB, n_comb, S, LANES)
            B = local_scan(B, damp[:, None, :, None] * jnp.ones(
                (1, 1, 1, 1), B.dtype))
            E = B[..., LANES - 1:].reshape(VB, n_comb, S)
            c = fs_ref[:, :n_comb]                       # [VB, 16]
            iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S, 1), 2)
            carry = jnp.zeros((VB, n_comb, S, 1), B.dtype)
            for j in range(S):
                carry = jnp.where(iota_s == j, c[:, :, None, None], carry)
                c = E[:, :, j:j + 1].reshape(VB, n_comb) + d128 * c
            fs_full = B + P128[:, None, None, :] * carry
            fs_flat = fs_full.reshape(VB, n_comb, t_c)
            w_all = mixed[:, None, :] + fs_flat * feed[:, None, :]
            ys_list = [ys[:, j:j + 1, :].reshape(VB, t_c)
                       for j in range(n_comb)]
            for j in range(n_comb):
                h = h_refs[j][...]
                w = w_all[:, j:j + 1, :].reshape(VB, t_c)
                h_refs[j][...] = (w if t_c == h.shape[1] else
                                  jnp.concatenate([h[:, t_c:], w], axis=1))
            fs_ref[:, :n_comb] = c
            outs = [sum(ys_list[:half_c]), sum(ys_list[half_c:])]
        else:  # variant C
            ys = []
            c_ends = []
            for j in range(n_comb):
                h = h_refs[j][...]
                y = h[:, :t_c]
                B = (y * one_m).reshape(VB, S, LANES)
                B = local_scan(B, damp[:, :, None])
                E = B[:, :, LANES - 1:].reshape(VB, S)
                c = fs_ref[:, j:j + 1]
                iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, S, 1), 1)
                carry = jnp.zeros((VB, S, 1), B.dtype)
                for jj in range(S):
                    carry = jnp.where(iota_s == jj, c[:, :, None], carry)
                    c = E[:, jj:jj + 1] + d128 * c
                fs_full = (B + P128[:, None, :] * carry).reshape(VB, t_c)
                w = mixed + fs_full * feed
                h_refs[j][...] = (w if t_c == h.shape[1] else
                                  jnp.concatenate([h[:, t_c:], w], axis=1))
                fs_ref[:, j:j + 1] = c
                ys.append(y)
            outs = [sum(ys[:half_c]), sum(ys[half_c:])]

        for ch in range(2):
            pieces = []
            for (p0, m) in spans:
                x = outs[ch][:, p0:p0 + m]
                for a in range(half_a):
                    hj = n_comb + ch * half_a + a
                    h = h_refs[hj][...]
                    delayed = h[:, :m]
                    w = x + delayed * ALLPASS_FEEDBACK
                    x = delayed - x
                    h_refs[hj][...] = (w if m == h.shape[1] else
                                       jnp.concatenate([h[:, m:], w],
                                                       axis=1))
                pieces.append(x)
            res = pieces[0] if len(pieces) == 1 else jnp.concatenate(
                pieces, axis=1)
            (out_l_ref if ch == 0 else out_r_ref)[...] = res

    all_lens = tuple(comb_lens) + tuple(ap_lens)

    def lane_spec():
        return pl.BlockSpec((VB, t_c), lambda vt, tt: (vt, tt),
                            memory_space=pltpu.VMEM)

    def state_spec(width):
        return pl.BlockSpec((VB, width), lambda vt, tt: (vt, 0),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def run(mixed, fs, damp, feed, *hists):
        v = mixed.shape[0]
        vp = _ceil_to(max(v, 1), VB)

        def padv(a):
            return (a if a.shape[0] == vp else
                    jnp.pad(a, ((0, vp - a.shape[0]),) + ((0, 0),) *
                            (a.ndim - 1)))

        mixed_p = padv(mixed)
        fs_p = padv(jnp.pad(fs, ((0, 0), (0, LANES - n_comb))))
        gp = padv(jnp.stack([damp, feed] + [jnp.zeros_like(damp)] *
                            (LANES - 2), axis=1))
        hists_p = [padv(h) for h in hists]
        in_specs = ([lane_spec(), state_spec(LANES), state_spec(LANES)]
                    + [state_spec(l) for l in all_lens])
        out_specs = ([lane_spec(), lane_spec(), state_spec(LANES)]
                     + [state_spec(l) for l in all_lens])
        out_shape = (
            [jax.ShapeDtypeStruct((vp, n), jnp.float32)] * 2
            + [jax.ShapeDtypeStruct((vp, LANES), jnp.float32)]
            + [jax.ShapeDtypeStruct((vp, l), jnp.float32)
               for l in all_lens])
        outs = pl.pallas_call(
            kernel,
            grid=(vp // VB, n_chunks),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((VB, LANES), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(mixed_p, fs_p, gp, *hists_p)
        out_l, out_r, fs_f = outs[0][:v], outs[1][:v], outs[2][:v, :n_comb]
        return (out_l, out_r, fs_f) + tuple(outs[3:])

    return run


def main():
    V = 1024
    N = 47104  # multiple of both 1152 and 1024? 1152*?; use per-variant n
    cl, cr, al, ar = line_lengths(48000)
    comb_lens = tuple(cl) + tuple(cr)
    ap_lens = tuple(al) + tuple(ar)
    rng = np.random.default_rng(0)
    damp = jnp.full((V,), 0.4, jnp.float32)
    feed = jnp.full((V,), 0.84, jnp.float32)

    def mk_inputs(n):
        mixed = jnp.asarray(rng.normal(size=(V, n)) * 0.015, jnp.float32)
        fs = jnp.zeros((V, 16), jnp.float32)
        hists = [jnp.asarray(rng.normal(size=(V, l)) * 0.1, jnp.float32)
                 for l in comb_lens + ap_lens]
        return mixed, fs, hists

    def timed(run, mixed, fs, hists):
        out = run(mixed, fs, damp, feed, *hists)
        float(jnp.abs(out[0]).max())
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(mixed, fs, damp, feed, *hists)
            float(jnp.abs(out[0]).max())
            best = min(best, time.perf_counter() - t0)
        return best, out

    results = {}
    # A: shipped kernel, t_c = 1152
    for name, t_c, builder in (
            ("A base t1152", 1152,
             lambda tc: fvk._build(comb_lens, ap_lens, NA, tc, False)),
            ("B base t1024", 1024,
             lambda tc: fvk._build(comb_lens, ap_lens, NB, tc, False)),
            ("C twolevel t1024", 1024,
             lambda tc: build_variant("C", comb_lens, ap_lens, NB, tc)),
            ("D stacked t1024", 1024,
             lambda tc: build_variant("D", comb_lens, ap_lens, NB, tc)),
    ):
        NA = 41 * 1152
        NB = 46 * 1024
        n = NA if t_c == 1152 else NB
        try:
            t0 = time.perf_counter()
            run = builder(t_c)
            mixed, fs, hists = mk_inputs(n)
            best, out = timed(run, mixed, fs, hists)
            results[name] = out
            log(f"[{name}] n={n} t={best*1e3:.1f}ms "
                f"rate={V*n/best/1e9:.2f}G/s (setup {time.perf_counter()-t0:.0f}s)")
        except Exception:
            log(f"[ERR] {name}:")
            traceback.print_exc(file=sys.stderr)

    # cross-check C/D against A on the overlapping prefix
    if "B base t1024" in results:
        ref = results["B base t1024"]
        for name in ("C twolevel t1024", "D stacked t1024"):
            if name in results:
                got = results[name]
                err = max(float(jnp.abs(g[:, :1024] - r[:, :1024]).max())
                          if g.ndim == 2 else float(jnp.abs(g - r).max())
                          for g, r in zip(got[:3], ref[:3]))
                log(f"[check {name}] max err vs B = {err:.2e}")


if __name__ == "__main__":
    main()
