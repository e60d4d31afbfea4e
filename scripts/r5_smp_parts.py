#!/usr/bin/env python
"""Round-5 intra-kernel attribution for ops/sample_kernel at the kit
shape: a knob-parameterized copy of the cv_none kernel with pieces
disabled (NOT semantics-preserving -- timing only).  Data is kit-like:
48k-frame table, rate 1.0, a trigger every 0.5 s, so ~98% of steps take
the whole-step consecutive tier.

Variants:
* full      -- the in-repo kernel (baseline, real semantics);
* nogather  -- consec tier writes chunk-0 broadcast (kills the slab ds +
               take_alongs; keeps position pipeline + predication);
* noslab    -- consec tier keeps the slab ds but only ONE take_along per
               block (no g1/cross select): isolates the take_along count;
* g17       -- consec tier hoists the shared per-chunk gathers (NBLK+1
               take_alongs instead of 2*NBLK): if this matches `full`,
               Mosaic already CSEs the duplicate g1/g0 pairs;
* posonly   -- whole gather section replaced by out = pos (position
               pipeline + HBM streams only).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_smp_parts.py
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

from srack_tpu.ops import sample_gather, sample_kernel
from srack_tpu.ops.sample_gather import LANES, NBLK, T_CH, WA, WB, _ceil_to

log = lambda *a: print(*a, file=sys.stderr, flush=True)

V, N, K = 1024, 480000, 48000
BIG = 2 ** 30


def make_kernel(rb, n, k, mode):
    t_last = (n - 1) // T_CH
    j_last = (n - 1) % T_CH
    n_chunks = _ceil_to(k, LANES) // LANES

    def kernel(gate_ref, par_ref, tbl_ref, out_ref, st_ref, c_max, c_last,
               b_scr):
        t = pl.program_id(1)
        base = jnp.stack([par_ref[r, 0] for r in range(rb)]).reshape(rb, 1)
        pos0 = jnp.stack([par_ref[r, 1] for r in range(rb)]).reshape(rb, 1)
        play0 = jnp.stack([par_ref[r, 2] for r in range(rb)]).reshape(rb, 1)
        len_f = jnp.stack([par_ref[r, 3] for r in range(rb)]).reshape(rb, 1)
        last0 = jnp.stack([par_ref[r, 4] for r in range(rb)]).reshape(rb, 1)

        @pl.when(t == 0)
        def _():
            c_max[...] = jnp.full(c_max.shape, -1.0, jnp.float32)
            c_last[...] = jnp.broadcast_to(
                (last0 > 0.0).astype(jnp.int32), c_last.shape)

        gate = gate_ref[...]
        above = (gate > 0.0).astype(jnp.int32)
        prev = jnp.concatenate([c_last[:, :1], above[:, :-1]], axis=1)
        trig = above * (1 - prev)

        rate = base
        iota_g = (jax.lax.broadcasted_iota(jnp.int32, gate.shape, 1)
                  + t * T_CH).astype(jnp.float32)
        cum_ex = base * iota_g

        m = jnp.where(trig != 0, cum_ex, -1.0)
        s = 1
        while s < T_CH:
            m = jnp.maximum(m, sample_kernel._shift(m, s, -1.0))
            s <<= 1
        m = jnp.maximum(m, c_max[:, :1])
        htr = (m >= 0.0).astype(jnp.int32)

        pos = jnp.where(htr != 0, cum_ex - m,
                        jnp.where(play0 > 0.0, cum_ex + pos0, pos0))
        crossed = pos >= len_f
        idx = jnp.clip(pos.astype(jnp.int32), 0, k - 1)
        idx = jnp.where(crossed, 0, idx)

        lane_i = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 1)

        if mode == "posonly":
            out_ref[...] = pos
        else:
            iota_t = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1)
            first0 = idx[:, :1]
            consec_all = jnp.all(idx == first0 + iota_t)

            @pl.when(consec_all)
            def _():
                h0 = jnp.right_shift(first0, 7)
                b_scr[...] = h0
                lo0 = jnp.bitwise_and(first0, 127)
                lo = jnp.bitwise_and(first0 + lane_i, 127)
                cross = lane_i >= (LANES - lo0)
                if mode == "nogather":
                    for b in range(NBLK):
                        out_ref[:, b * LANES:(b + 1) * LANES] = (
                            jnp.broadcast_to(tbl_ref[:, 0, 0:1],
                                             (rb, LANES)) + lo.astype(
                                                 jnp.float32))
                    return
                slab = jnp.stack(
                    [tbl_ref[r, pl.ds(b_scr[r, 0], NBLK + 1), :]
                     for r in range(rb)])
                if mode == "noslab":
                    for b in range(NBLK):
                        g0 = jnp.take_along_axis(slab[:, b, :], lo, axis=1)
                        out_ref[:, b * LANES:(b + 1) * LANES] = g0
                elif mode == "g17":
                    gs = [jnp.take_along_axis(slab[:, b, :], lo, axis=1)
                          for b in range(NBLK + 1)]
                    for b in range(NBLK):
                        out_ref[:, b * LANES:(b + 1) * LANES] = jnp.where(
                            cross, gs[b + 1], gs[b])
                else:  # full
                    for b in range(NBLK):
                        g0 = jnp.take_along_axis(slab[:, b, :], lo, axis=1)
                        g1 = jnp.take_along_axis(slab[:, b + 1, :], lo,
                                                 axis=1)
                        out_ref[:, b * LANES:(b + 1) * LANES] = jnp.where(
                            cross, g1, g0)

            @pl.when(jnp.logical_not(consec_all))
            def _():
                # general fallback (trigger blocks, ~2%): same for all
                # modes -- the per-block tier structure from the repo
                for b in range(NBLK):
                    ix = idx[:, b * LANES:(b + 1) * LANES]
                    sl = slice(b * LANES, (b + 1) * LANES)
                    first = ix[:, :1]
                    hi = jnp.right_shift(ix, 7)
                    lo = jnp.bitwise_and(ix, 127)
                    zb = jnp.all(ix == 0)
                    consec = jnp.all(ix == first + lane_i)

                    @pl.when(zb)
                    def _(sl=sl):
                        out_ref[:, sl] = jnp.broadcast_to(
                            tbl_ref[:, 0, 0:1], (rb, LANES))

                    @pl.when(consec)
                    def _(first=first, hi=hi, lo=lo, sl=sl):
                        h0 = jnp.right_shift(first, 7)
                        b_scr[...] = h0
                        slab = jnp.stack(
                            [tbl_ref[r, pl.ds(b_scr[r, 0], 2), :]
                             for r in range(rb)])
                        g0 = jnp.take_along_axis(slab[:, 0, :], lo, axis=1)
                        g1 = jnp.take_along_axis(slab[:, 1, :], lo, axis=1)
                        out_ref[:, sl] = jnp.where(hi == h0, g0, g1)

                    @pl.when(jnp.logical_and(jnp.logical_not(zb),
                                             jnp.logical_not(consec)))
                    def _(ix=ix, first=first, hi=hi, lo=lo, sl=sl):
                        base_v = jnp.right_shift(first, 7)
                        b_scr[...] = base_v
                        slabs = jnp.stack(
                            [tbl_ref[r, pl.ds(b_scr[r, 0], WA), :]
                             for r in range(rb)])
                        acc = jnp.zeros((rb, LANES), jnp.float32)
                        for w in range(WA):
                            gth = jnp.take_along_axis(slabs[:, w, :], lo,
                                                      axis=1)
                            acc = jnp.where(hi == base_v + w, gth, acc)
                        for c in range(WB):
                            gth = jnp.take_along_axis(tbl_ref[:, c, :], lo,
                                                      axis=1)
                            acc = jnp.where(hi == c, gth, acc)
                        local = ix - (base_v << 7)
                        covered = jnp.logical_or(
                            jnp.logical_and(local >= 0,
                                            local < WA * LANES),
                            ix < WB * LANES)
                        r0 = jnp.right_shift(
                            jnp.min(jnp.where(covered, BIG, ix)), 7)
                        r1 = jnp.right_shift(jnp.maximum(
                            jnp.max(jnp.where(covered, -1, ix)), -1), 7)

                        @pl.when(r1 < r0)
                        def _(acc=acc, sl=sl):
                            out_ref[:, sl] = acc

                        @pl.when(r1 >= r0)
                        def _(acc=acc, lo=lo, hi=hi, sl=sl, r0=r0, r1=r1):
                            def body(c, a):
                                win = tbl_ref[:, pl.ds(c, 1), :].reshape(
                                    rb, LANES)
                                gth = jnp.take_along_axis(win, lo, axis=1)
                                return jnp.where(hi == c, gth, a)

                            out_ref[:, sl] = jax.lax.fori_loop(
                                r0, r1 + 1, body, acc)

        @pl.when(t == t_last)
        def _():
            s_j = pos[:, j_last:j_last + 1]
            cross_j = crossed[:, j_last:j_last + 1]
            htr_j = htr[:, j_last:j_last + 1] != 0
            active = jnp.logical_or(htr_j, play0 > 0.0)
            playing_end = jnp.logical_and(active, jnp.logical_not(cross_j))
            pos_end = jnp.where(playing_end, s_j + rate,
                                jnp.where(cross_j, 0.0, pos0))
            st_ref[:, 0:1] = pos_end
            st_ref[:, 1:2] = playing_end.astype(jnp.float32)
            st_ref[:, 2:3] = above[:, j_last:j_last + 1].astype(jnp.float32)

        c_max[...] = jnp.broadcast_to(m[:, -1:], c_max.shape)
        c_last[...] = jnp.broadcast_to(above[:, -1:], c_last.shape)

    return kernel


def build(mode):
    rb = sample_gather._pick_rb(K)
    rp = _ceil_to(V, rb)
    np_ = _ceil_to(N, T_CH)
    n_chunks = _ceil_to(K, LANES) // LANES
    nc_eff = n_chunks + WA
    lane = pl.BlockSpec((rb, T_CH), lambda rr, tt: (rr, tt),
                        memory_space=pltpu.VMEM)

    @jax.jit
    def run(gate, par, tbl3d):
        outs = pl.pallas_call(
            make_kernel(rb, N, K, mode),
            grid=(rp // rb, np_ // T_CH),
            in_specs=[lane,
                      pl.BlockSpec((rb, 5), lambda rr, tt: (rr, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((rb, nc_eff, LANES),
                                   lambda rr, tt: (rr, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[lane,
                       pl.BlockSpec((rb, LANES), lambda rr, tt: (rr, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((rp, N), jnp.float32),
                       jax.ShapeDtypeStruct((rp, LANES), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((rb, LANES), jnp.float32),
                            pltpu.VMEM((rb, LANES), jnp.int32),
                            pltpu.VMEM((rb, 1), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(gate, par, tbl3d)
        return jnp.abs(outs[0]).max() + jnp.abs(outs[1]).max()

    return run, rb, rp, nc_eff


def main():
    t0 = time.perf_counter()
    float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
    log(f"warmup {time.perf_counter()-t0:.1f}s")

    rng = np.random.default_rng(0)
    # kit-like: trigger every 24000 samples, table plays 48000 frames
    gate_np = np.zeros((1, N), np.float32)
    gate_np[0, ::24000] = 1.0
    rb = sample_gather._pick_rb(K)
    rp = _ceil_to(V, rb)
    gate = jnp.asarray(np.broadcast_to(gate_np, (rp, N)).copy())
    par = jnp.asarray(np.broadcast_to(
        np.array([[1.0, 0.0, 0.0, float(K), 0.0]], np.float32),
        (rp, 5)).copy())
    n_chunks = _ceil_to(K, LANES) // LANES
    nc_eff = n_chunks + WA
    tbl = rng.normal(size=(1, K)).astype(np.float32)
    tbl3d = jnp.asarray(np.broadcast_to(
        np.pad(tbl, ((0, 0), (0, nc_eff * LANES - K))).reshape(
            1, nc_eff, LANES), (rp, nc_eff, LANES)).copy())

    results = {}
    for mode in ("full", "g17", "noslab", "nogather", "posonly"):
        try:
            run, *_ = build(mode)
            t0 = time.perf_counter()
            float(run(gate, par, tbl3d))
            log(f"[{mode}] compile+first {time.perf_counter()-t0:.1f}s")
            best = float("inf")
            for _ in range(7):
                t0 = time.perf_counter()
                float(run(gate, par, tbl3d))
                best = min(best, time.perf_counter() - t0)
            results[mode] = best
            log(f"[{mode}] best={best*1e3:.2f}ms "
                f"rate={V*N/best/1e9:.2f}G ms/s-audio={best*1e3/10:.2f}")
        except Exception as e:
            log(f"[{mode}] FAILED: {e!r}"[:400])
    if "full" in results:
        for mode, b in results.items():
            log(f"  {mode}: {b*1e3:.2f}ms (delta vs full "
                f"{(results['full']-b)*1e3:+.2f}ms)")


if __name__ == "__main__":
    main()
