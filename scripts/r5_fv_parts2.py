#!/usr/bin/env python
"""Round-5 freeverb intra-kernel attribution on the CURRENT tiered
structure (k_c=1, single 6 s segment, damp=0.16 -> W=8 tier): knockout
variants, timing only (NOT semantics-preserving).

Variants:
* full     -- faithful copy of the in-repo kernel body;
* noscan   -- damping scan passes removed (B = y*(1-damp) only);
* noap     -- allpass chains removed (outs go straight to the mix);
* noroll   -- comb/allpass lines never roll (w written to [:, :t_c]);
* taps     -- only comb taps + mix (no scan, no rolls, no allpasses);
* copy     -- in lane -> out lanes, state copied at t==0 (DMA floor).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_fv_parts2.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from srack_tpu.modules.freeverb import line_lengths
from srack_tpu.ops import freeverb_kernel as fvk

log = lambda *a: print(*a, file=sys.stderr, flush=True)

V, SR = 1024, 48000
N, T_C = 288000, 1152
LANES, VB = fvk.LANES, fvk.VB
AF = fvk.ALLPASS_FEEDBACK


def build(mode):
    cl, cr, al, ar = line_lengths(SR)
    comb_lens = tuple(cl) + tuple(cr)
    ap_lens = tuple(al) + tuple(ar)
    all_lens = comb_lens + ap_lens
    n_comb, n_ap = 16, 8
    half_c, half_a = 8, 4
    n_chunks = N // T_C
    min_ap = min(ap_lens)
    spans = []
    s0 = 0
    while s0 < T_C:
        m = min(min_ap, T_C - s0)
        spans.append((s0, m))
        s0 += m
    _shift = fvk._shift
    WINDOW = 8  # damp 0.16 tier

    def kernel(*refs):
        (l_ref, fs_in_ref, gp_ref) = refs[:3]
        hin_refs = refs[3:3 + 24]
        out_l_ref, out_r_ref, fs_ref = refs[27:30]
        h_refs = refs[30:-1]
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
            P = jnp.broadcast_to(damp, (damp.shape[0], T_C))
            s = 1
            while s < T_C:
                P = P * _shift(P, s, 1.0)
                s <<= 1
            pow_scr[...] = P

        l_full = l_ref[...]
        mixed = (l_full + l_full) * gp_ref[:, 2:3]
        if mode == "copy":
            out_l_ref[...] = mixed
            out_r_ref[...] = mixed * 0.5
            return
        P = pow_scr[...]

        fs_all = fs_ref[...]
        fs_cols = [fs_all[:, j:j + 1] for j in range(n_comb)]
        ys = [h_refs[j][:, :T_C] for j in range(n_comb)]
        for j in range(n_comb):
            B = ys[j] * one_m
            if mode not in ("noscan", "taps"):
                ds = damp
                s = 1
                while s < WINDOW:
                    B = B + ds * _shift(B, s, 0.0)
                    ds = ds * ds
                    s <<= 1
            fs_t = P * fs_cols[j] + B
            w = mixed + fs_t * feed
            if mode in ("noroll", "taps"):
                h_refs[j][:, :T_C] = w
            else:
                h = h_refs[j][...]
                h_refs[j][...] = jnp.concatenate([h[:, T_C:], w], axis=1)
            fs_cols[j] = fs_t[:, -1:]

        outs = [sum(ys[:half_c]), sum(ys[half_c:])]
        res = [None, None]
        for ch in range(2):
            if mode in ("noap", "taps"):
                res[ch] = outs[ch]
                continue
            hjs = [n_comb + ch * half_a + a for a in range(half_a)]
            h_vals = [h_refs[hj][...] for hj in hjs]
            pieces = []
            for (p0, m) in spans:
                x = outs[ch][:, p0:p0 + m]
                for a in range(half_a):
                    h = h_vals[a]
                    delayed = h[:, :m]
                    w = x + delayed * AF
                    x = delayed - x
                    if mode == "noroll":
                        h_vals[a] = h
                    else:
                        h_vals[a] = (w if m == h.shape[1] else
                                     jnp.concatenate([h[:, m:], w], axis=1))
                pieces.append(x)
            for hj, h in zip(hjs, h_vals):
                h_refs[hj][...] = h
            res[ch] = (pieces[0] if len(pieces) == 1 else
                       jnp.concatenate(pieces, axis=1))
        wet1 = gp_ref[:, 3:4]
        wet2 = gp_ref[:, 4:5]
        dry = gp_ref[:, 5:6]
        out_l_ref[...] = res[0] * wet1 + res[1] * wet2 + l_full * dry
        out_r_ref[...] = res[1] * wet1 + res[0] * wet2 + l_full * dry
        fs_ref[...] = jnp.concatenate(fs_cols + [fs_all[:, n_comb:]],
                                      axis=1)

    def lane_spec():
        return pl.BlockSpec((VB, T_C), lambda vt, tt: (vt, tt),
                            memory_space=pltpu.VMEM)

    def state_spec(width):
        return pl.BlockSpec((VB, width), lambda vt, tt: (vt, 0),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def run(lane, fs, gp, *hists):
        in_specs = ([lane_spec(), state_spec(LANES), state_spec(LANES)]
                    + [state_spec(l) for l in all_lens])
        out_specs = ([lane_spec()] * 2 + [state_spec(LANES)]
                     + [state_spec(l) for l in all_lens])
        out_shape = ([jax.ShapeDtypeStruct((V, N), jnp.float32)] * 2
                     + [jax.ShapeDtypeStruct((V, LANES), jnp.float32)]
                     + [jax.ShapeDtypeStruct((V, l), jnp.float32)
                        for l in all_lens])
        outs = pl.pallas_call(
            kernel, grid=(V // VB, n_chunks),
            in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((VB, T_C), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(lane, fs, gp, *hists)
        return jnp.abs(outs[0]).max() + jnp.abs(outs[1]).max()

    return run, all_lens


def main():
    t0 = time.perf_counter()
    float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
    log(f"warmup {time.perf_counter()-t0:.1f}s")
    rng = np.random.default_rng(0)
    lane = jnp.asarray(rng.normal(size=(V, N)).astype(np.float32) * 0.1)
    fs = jnp.zeros((V, LANES), jnp.float32)
    gp_row = np.zeros(LANES, np.float32)
    gp_row[:6] = [0.16, 0.84, 0.015, 0.12, 0.06, 0.3]
    gp = jnp.asarray(np.broadcast_to(gp_row, (V, LANES)).copy())
    results = {}
    for mode in ("full", "noscan", "noap", "noroll", "taps", "copy"):
        try:
            run, all_lens = build(mode)
            hists = [jnp.zeros((V, l), jnp.float32) for l in all_lens]
            t0 = time.perf_counter()
            float(run(lane, fs, gp, *hists))
            log(f"[{mode}] compile+first {time.perf_counter()-t0:.1f}s")
            best = float("inf")
            for _ in range(7):
                t0 = time.perf_counter()
                float(run(lane, fs, gp, *hists))
                best = min(best, time.perf_counter() - t0)
            results[mode] = best
            log(f"[{mode}] best={best*1e3:.2f}ms "
                f"ms/s-audio={best*1e3/(N/48000):.2f}")
        except Exception as e:
            log(f"[{mode}] FAILED: {e!r}"[:400])
    if "full" in results:
        for mode, b in results.items():
            log(f"  {mode}: {b*1e3:.2f}ms (delta vs full "
                f"{(results['full']-b)*1e3:+.2f}ms)")


if __name__ == "__main__":
    main()
