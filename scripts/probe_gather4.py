"""Probe round 4: the production sample-gather kernel design.

Per 128-sample column block of each 8-voice row tile:
  * per-ROW windows: win[r] = table2d[base_r + w] (dynamic sublane slice,
    one vreg) for w in 0..WA-1, where base_r = chunk of the row's FIRST
    index in the block (XLA-precomputed, SMEM);
  * a static table-head window (chunks 0..WB-1) catching trigger restarts
    and end-of-sample resets;
  * a dynamic residual chunk loop whose per-block bounds are
    XLA-precomputed over the elements the static windows miss (empty for
    monotone playback at rate < WA; catches any idx pattern).

take_along_axis on [8,128] gathers per row from that row's own lanes, so
the per-row windows compose with ONE gather per w.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_gather4.py
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

RB = 8
T_CH = 2048
NBLK = T_CH // 128
WA = 2   # per-row window chunks
WB = 2   # table-head chunks


def timed(fn, *args, reps=3):
    out = fn(*args)
    float(jnp.abs(out).max())
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.abs(out).max())
        best = min(best, time.perf_counter() - t0)
    return best, out


def attempt(name, f):
    try:
        r = f()
        log(f"[OK ] {name}: {r}")
    except Exception:
        log(f"[ERR] {name}:")
        traceback.print_exc(file=sys.stderr)


def _kernel(tbl_ref, i_ref, csm_ref, r0_ref, r1_ref, o_ref):
    t = pl.program_id(1)
    for b in range(NBLK):
        col = t * NBLK + b
        ix = i_ref[:, b * 128:(b + 1) * 128]
        bases = [csm_ref[0, r, col] for r in range(RB)]
        base_v = jnp.stack(bases).reshape(RB, 1)
        local = ix - base_v * 128
        acc = jnp.zeros((RB, 128), jnp.float32)
        # per-row windows
        for w in range(WA):
            win = jnp.concatenate(
                [tbl_ref[pl.ds(bases[r] + w, 1), :] for r in range(RB)],
                axis=0)
            lw = local - w * 128
            g = jnp.take_along_axis(win, jnp.clip(lw, 0, 127), axis=1)
            hit = jnp.logical_and(lw >= 0, lw < 128)
            acc = jnp.where(hit, g, acc)
        # table-head window (static rows)
        for c in range(WB):
            win = jnp.broadcast_to(tbl_ref[c:c + 1, :], (RB, 128))
            lc = ix - c * 128
            g = jnp.take_along_axis(win, jnp.clip(lc, 0, 127), axis=1)
            hit = jnp.logical_and(lc >= 0, lc < 128)
            acc = jnp.where(hit, g, acc)
        # residual dynamic loop (usually empty)
        r0 = r0_ref[0, 0, col]
        r1 = r1_ref[0, 0, col]

        def body(c, acc):
            win = jnp.broadcast_to(tbl_ref[pl.ds(c, 1), :], (RB, 128))
            lc = ix - c * 128
            g = jnp.take_along_axis(win, jnp.clip(lc, 0, 127), axis=1)
            hit = jnp.logical_and(lc >= 0, lc < 128)
            return jnp.where(hit, g, acc)

        acc = jax.lax.fori_loop(r0, r1 + 1, body, acc)
        o_ref[:, b * 128:(b + 1) * 128] = acc


@functools.partial(jax.jit, static_argnums=(2,))
def gather_big(tbl, idx, K):
    V, N = idx.shape
    n_chunks = -(-K // 128)
    tbl2d = jnp.pad(tbl, (0, (n_chunks + WA) * 128 - K)).reshape(-1, 128)
    NB = N // 128
    ib = idx.reshape(V, NB, 128)
    basec = jnp.right_shift(ib[:, :, 0], 7)          # [V, NB]
    local = ib - (basec << 7)[:, :, None]
    covered = jnp.logical_or(
        jnp.logical_and(local >= 0, local < WA * 128),
        ib < WB * 128)
    unc = jnp.logical_not(covered)
    big = jnp.int32(2 ** 30)
    u_min = jnp.min(jnp.where(unc, ib, big).reshape(V // RB, RB, NB, 128),
                    axis=(1, 3))                     # [RT, NB]
    u_max = jnp.max(jnp.where(unc, ib, -1).reshape(V // RB, RB, NB, 128),
                    axis=(1, 3))
    r0 = jnp.right_shift(u_min, 7).astype(jnp.int32)
    r1 = jnp.right_shift(u_max, 7)
    r1 = jnp.where(r1 < 0, -1, r1).astype(jnp.int32)

    basec3 = basec.reshape(V // RB, RB, NB)

    return pl.pallas_call(
        _kernel,
        grid=(V // RB, N // T_CH),
        in_specs=[
            pl.BlockSpec((n_chunks + WA, 128), lambda r, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, T_CH), lambda r, t: (r, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB, NB), lambda r, t: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, NB), lambda r, t: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, NB), lambda r, t: (r, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((RB, T_CH), lambda r, t: (r, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(tbl2d, idx, basec3, r0[:, None, :], r1[:, None, :])


V, N, K = 1024, 49152, 49152
TBL = jax.random.normal(jax.random.PRNGKey(6), (K,), jnp.float32)


def check(idx, label):
    run = lambda t, i: gather_big(t, i, K)
    out = run(TBL, idx)
    want = np.asarray(TBL)[np.asarray(idx)]
    ok = np.allclose(np.asarray(out), want)
    best, _ = timed(run, TBL, idx)
    rate = V * N / best / 1e9
    return f"{label} correct={ok} t={best*1e3:.1f}ms rate={rate:.2f}G/s"


def t_monotone():
    pos = (jnp.arange(N)[None] * 1.0 + jnp.arange(V)[:, None] * 37.0) % (K - 1)
    return check(pos.astype(jnp.int32), "monotone r=1")


def t_divergent():
    starts = jax.random.randint(jax.random.PRNGKey(9), (V, 1), 0, K)
    pos = (starts + jnp.arange(N)[None]) % (K - 1)
    return check(pos.astype(jnp.int32), "divergent r=1 (drums)")


def t_rates():
    starts = jax.random.randint(jax.random.PRNGKey(9), (V, 1), 0, K)
    rate = jnp.exp2(jax.random.uniform(jax.random.PRNGKey(10), (V, 1)) * 2 - 1)
    pos = (starts + jnp.arange(N)[None] * rate) % (K - 1)
    return check(pos.astype(jnp.int32), "rates 0.5-2")


def t_fast_rates():
    starts = jax.random.randint(jax.random.PRNGKey(9), (V, 1), 0, K)
    rate = jnp.exp2(jax.random.uniform(jax.random.PRNGKey(10), (V, 1)) * 2 + 1)
    pos = (starts + jnp.arange(N)[None] * rate) % (K - 1)
    return check(pos.astype(jnp.int32), "rates 2-8 (residual-heavy)")


def t_restarts():
    # sawtooth playback with staggered restarts every ~5000 samples
    period = 4800 + 173 * (jnp.arange(V)[:, None] % 11)
    t = jnp.arange(N)[None]
    pos = jnp.minimum((t % period) * 1.0, K - 1.0)
    return check(pos.astype(jnp.int32), "restart sawtooth")


def t_uniform():
    idx = jax.random.randint(jax.random.PRNGKey(11), (V, N), 0, K)
    return check(idx, "uniform random (worst)")


if __name__ == "__main__":
    attempt("G monotone", t_monotone)
    attempt("G divergent", t_divergent)
    attempt("G rates", t_rates)
    attempt("G fast rates", t_fast_rates)
    attempt("G restarts", t_restarts)
    attempt("G uniform", t_uniform)
