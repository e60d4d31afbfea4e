"""Probe round 5: production-kernel variant sweep at sampler scale.

Where does the time go at [1024 x 96000], K=48000, drums-like indices?
Sweep RB (rows/tile), WA/WB (static window chunks), and ablations:
no-residual (drop the fori entirely), no-head, single-gather.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_gather5.py
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

log = lambda *a: print(*a, file=sys.stderr, flush=True)
log("backend:", jax.default_backend(), jax.devices())

LANES = 128
T_CH = 2048
NBLK = T_CH // LANES


def build(RB, WA, WB, residual=True):
    def kernel(tbl_ref, i_ref, csm_ref, r0_ref, r1_ref, o_ref):
        t = pl.program_id(1)
        for b in range(NBLK):
            col = t * NBLK + b
            ix = i_ref[:, b * LANES:(b + 1) * LANES]
            bases = [csm_ref[0, r, col] for r in range(RB)]
            base_v = jnp.stack(bases).reshape(RB, 1)
            local = ix - base_v * LANES
            acc = jnp.zeros((RB, LANES), jnp.float32)
            slabs = jnp.stack(
                [tbl_ref[r % 8, pl.ds(bases[r], WA), :] for r in range(RB)])
            for w in range(WA):
                win = slabs[:, w, :]
                lw = local - w * LANES
                g = jnp.take_along_axis(win, jnp.clip(lw, 0, LANES - 1),
                                        axis=1)
                hit = jnp.logical_and(lw >= 0, lw < LANES)
                acc = jnp.where(hit, g, acc)
            for c in range(WB):
                win = jnp.broadcast_to(tbl_ref[0, c, :][None], (RB, LANES))
                lc = ix - c * LANES
                g = jnp.take_along_axis(win, jnp.clip(lc, 0, LANES - 1),
                                        axis=1)
                hit = jnp.logical_and(lc >= 0, lc < LANES)
                acc = jnp.where(hit, g, acc)
            if residual:
                r0 = r0_ref[0, 0, col]
                r1 = r1_ref[0, 0, col]

                def body(c, acc):
                    win = jnp.broadcast_to(
                        tbl_ref[0, pl.ds(c, 1), :].reshape(1, LANES),
                        (RB, LANES))
                    lc = ix - c * LANES
                    g = jnp.take_along_axis(win,
                                            jnp.clip(lc, 0, LANES - 1),
                                            axis=1)
                    hit = jnp.logical_and(lc >= 0, lc < LANES)
                    return jnp.where(hit, g, acc)

                acc = jax.lax.fori_loop(r0, r1 + 1, body, acc)
            o_ref[:, b * LANES:(b + 1) * LANES] = acc

    @functools.partial(jax.jit, static_argnums=(2,))
    def run(table, idx, k):
        rp, n = idx.shape
        n_chunks = -(-k // LANES)
        tbl3d = jnp.pad(table, ((0, 0), (0, (n_chunks + WA) * LANES - k))
                        ).reshape(8, n_chunks + WA, LANES)
        nb = n // LANES
        ib = idx.reshape(rp, nb, LANES)
        basec = jnp.right_shift(ib[:, :, 0], 7)
        local = ib - (basec << 7)[:, :, None]
        covered = jnp.logical_or(
            jnp.logical_and(local >= 0, local < WA * LANES),
            ib < WB * LANES)
        unc = jnp.logical_not(covered)
        big = jnp.int32(2 ** 30)
        u_min = jnp.min(jnp.where(unc, ib, big).reshape(
            rp // RB, RB, nb, LANES), axis=(1, 3))
        u_max = jnp.max(jnp.where(unc, ib, -1).reshape(
            rp // RB, RB, nb, LANES), axis=(1, 3))
        r0 = jnp.right_shift(u_min, 7).astype(jnp.int32)[:, None, :]
        r1 = jnp.right_shift(jnp.maximum(u_max, -1), 7).astype(
            jnp.int32)[:, None, :]
        basec3 = basec.reshape(rp // RB, RB, nb)
        return pl.pallas_call(
            kernel,
            grid=(rp // RB, n // T_CH),
            in_specs=[
                pl.BlockSpec((8, n_chunks + WA, LANES),
                             lambda rr, tt: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RB, T_CH), lambda rr, tt: (rr, tt),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, RB, nb), lambda rr, tt: (rr, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, nb), lambda rr, tt: (rr, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, nb), lambda rr, tt: (rr, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((RB, T_CH), lambda rr, tt: (rr, tt),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rp, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(tbl3d, idx, basec3, r0, r1)

    return run


V, N, K = 1024, 96256, 48000  # N multiple of 2048
TBL = jax.random.normal(jax.random.PRNGKey(6), (K,), jnp.float32)
TBL8 = jnp.broadcast_to(TBL[None], (8, K))

# drums-like: staggered restarts, rate 1
period = 4800 + 173 * (jnp.arange(V)[:, None] % 11)
IDX = jnp.minimum((jnp.arange(N)[None] % period) * 1.0, K - 1.0
                  ).astype(jnp.int32)
WANT = np.asarray(TBL)[np.asarray(IDX)]


def timed(run, check=True):
    out = run(TBL8, IDX, K)
    float(jnp.abs(out).max())
    ok = np.allclose(np.asarray(out), WANT) if check else "-"
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(TBL8, IDX, K)
        float(jnp.abs(out).max())
        best = min(best, time.perf_counter() - t0)
    return best, ok


def attempt(name, f):
    try:
        r = f()
        log(f"[OK ] {name}: {r}")
    except Exception:
        log(f"[ERR] {name}:")
        traceback.print_exc(file=sys.stderr)


def variant(RB, WA, WB, residual=True, check=True):
    def f():
        run = build(RB, WA, WB, residual)
        best, ok = timed(run, check)
        return (f"RB={RB} WA={WA} WB={WB} res={residual} correct={ok} "
                f"t={best*1e3:.1f}ms rate={V*N/best/1e9:.2f}G/s")
    return f


if __name__ == "__main__":
    attempt("base RB8 WA4 WB2", variant(8, 4, 2))
    attempt("RB16", variant(16, 4, 2))
    attempt("RB32", variant(32, 4, 2))
    attempt("WA2", variant(8, 2, 2))
    attempt("WA2 WB1", variant(8, 2, 1))
    attempt("no residual (timing only)", variant(8, 4, 2, residual=False,
                                                 check=False))
    attempt("RB32 WA2", variant(32, 2, 2))
