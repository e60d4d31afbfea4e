"""Probe round 2: tpu.dynamic_gather economics (same-shape 2D gather).

Mosaic lowers lax.gather -> tpu.dynamic_gather ONLY when idx.shape ==
src.shape (2D, axis 0 or 1).  Questions:
  P1. wide lane gather: src [R, 2048], idx in [0, 2048) -- cost?
  P2. narrow gather: src [R, 2048] tiled from a 128-entry chunk, idx < 128
  P3. windowed two-level at drums scale (dyn slice + same-shape gather)
  P4. sublane-axis gather (axis=0)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_gather2.py
"""
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


R, T = 32, 2048
V, N = 1024, 49152  # drums scale, N multiple of 2048


def gather_call(kern, inputs, out_sd):
    @jax.jit
    def run(*args):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=out_sd,
        )(*args)
    return run


def test_p1():
    src = jax.random.normal(jax.random.PRNGKey(0), (R, T), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (R, T), 0, T)

    def kern(s_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(s_ref[...], i_ref[...], axis=1)

    run = gather_call(kern, (src, idx), jax.ShapeDtypeStruct((R, T), jnp.float32))
    out = run(src, idx)
    want = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=1)
    ok = np.allclose(np.asarray(out), want)
    best, _ = timed(run, src, idx)
    return f"correct={ok} t={best*1e3:.2f}ms"


def test_p2():
    chunk = jax.random.normal(jax.random.PRNGKey(2), (R, 128), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(3), (R, T), 0, 128)

    def kern(c_ref, i_ref, o_ref):
        tiled = jnp.tile(c_ref[...], (1, T // 128))
        o_ref[...] = jnp.take_along_axis(tiled, i_ref[...], axis=1)

    run = gather_call(kern, (chunk, idx), jax.ShapeDtypeStruct((R, T), jnp.float32))
    out = run(chunk, idx)
    want = np.take_along_axis(np.asarray(chunk), np.asarray(idx), axis=1)
    ok = np.allclose(np.asarray(out), want)
    best, _ = timed(run, chunk, idx)
    return f"correct={ok} t={best*1e3:.2f}ms"


def test_p3():
    """Drums scale: windowed two-level, window = 2048 lanes, fori over
    cdiv(span, W) windows per tile (usually 1)."""
    K = 49152
    W = 2048
    T_CH = 2048
    RB = 8

    def kern(t_ref, i_ref, rng_ref, o_ref):
        ix = i_ref[...]
        r = pl.program_id(0)
        t = pl.program_id(1)
        w0 = rng_ref[r, t, 0]          # first window start (units of W)
        w1 = rng_ref[r, t, 1]          # last window start

        def body(w, acc):
            base = w * W
            win = t_ref[:, pl.ds(base, W)]            # [RB, W]
            lidx = jnp.clip(ix - base, 0, W - 1)
            g = jnp.take_along_axis(win, lidx, axis=1)
            inside = jnp.logical_and(ix >= base, ix < base + W)
            return jnp.where(inside, g, acc)

        o_ref[...] = jax.lax.fori_loop(w0, w1 + 1, body,
                                       jnp.zeros(ix.shape, jnp.float32))

    tbl = jax.random.normal(jax.random.PRNGKey(6), (K,), jnp.float32)
    pos = (jnp.arange(N)[None] * 1.0 + jnp.arange(V)[:, None] * 37.0) % (K - 1)
    idx = pos.astype(jnp.int32)

    @jax.jit
    def run(tbl, idx):
        ib = idx.reshape(V // RB, RB, N // T_CH, T_CH)
        lo = jnp.min(jnp.min(ib, axis=3), axis=1) // W
        hi = jnp.max(jnp.max(ib, axis=3), axis=1) // W
        rng = jnp.stack([lo, hi], axis=-1).astype(jnp.int32)
        tbl2 = jnp.broadcast_to(tbl[None], (RB, K))
        return pl.pallas_call(
            kern,
            grid=(V // RB, N // T_CH),
            in_specs=[
                pl.BlockSpec((RB, K), lambda r, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RB, T_CH), lambda r, t: (r, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((RB, T_CH), lambda r, t: (r, t),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((V, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(tbl2, idx, rng)

    out = run(tbl, idx)
    want = np.asarray(tbl)[np.asarray(idx)]
    ok = np.allclose(np.asarray(out), want)
    best, _ = timed(run, tbl, idx)
    rate = V * N / best / 1e9
    return f"correct={ok} t={best*1e3:.1f}ms rate={rate:.2f}G/s"


def test_p3b():
    """Same but divergent voices (random restarts per voice) to stress
    window spans."""
    K = 49152
    W = 2048
    T_CH = 2048
    RB = 8
    key = jax.random.PRNGKey(9)
    starts = jax.random.randint(key, (V, 1), 0, K)
    rate = jnp.exp2(jax.random.uniform(jax.random.PRNGKey(10), (V, 1)) * 2 - 1)
    pos = (starts + jnp.arange(N)[None] * rate) % (K - 1)
    idx = pos.astype(jnp.int32)

    def kern(t_ref, i_ref, rng_ref, o_ref):
        ix = i_ref[...]
        r = pl.program_id(0)
        t = pl.program_id(1)
        w0 = rng_ref[r, t, 0]
        w1 = rng_ref[r, t, 1]

        def body(w, acc):
            base = w * W
            win = t_ref[:, pl.ds(base, W)]
            lidx = jnp.clip(ix - base, 0, W - 1)
            g = jnp.take_along_axis(win, lidx, axis=1)
            inside = jnp.logical_and(ix >= base, ix < base + W)
            return jnp.where(inside, g, acc)

        o_ref[...] = jax.lax.fori_loop(w0, w1 + 1, body,
                                       jnp.zeros(ix.shape, jnp.float32))

    tbl = jax.random.normal(jax.random.PRNGKey(6), (K,), jnp.float32)

    @jax.jit
    def run(tbl, idx):
        ib = idx.reshape(V // RB, RB, N // T_CH, T_CH)
        lo = jnp.min(jnp.min(ib, axis=3), axis=1) // W
        hi = jnp.max(jnp.max(ib, axis=3), axis=1) // W
        rng = jnp.stack([lo, hi], axis=-1).astype(jnp.int32)
        tbl2 = jnp.broadcast_to(tbl[None], (RB, K))
        return pl.pallas_call(
            kern,
            grid=(V // RB, N // T_CH),
            in_specs=[
                pl.BlockSpec((RB, K), lambda r, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RB, T_CH), lambda r, t: (r, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((RB, T_CH), lambda r, t: (r, t),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((V, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(tbl2, idx, rng)

    out = run(tbl, idx)
    want = np.asarray(tbl)[np.asarray(idx)]
    ok = np.allclose(np.asarray(out), want)
    best, _ = timed(run, tbl, idx)
    rate_ = V * N / best / 1e9
    return f"correct={ok} t={best*1e3:.1f}ms rate={rate_:.2f}G/s"


def test_p4():
    src = jax.random.normal(jax.random.PRNGKey(7), (R, 128), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(8), (R, 128), 0, R)

    def kern(s_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(s_ref[...], i_ref[...], axis=0)

    run = gather_call(kern, (src, idx), jax.ShapeDtypeStruct((R, 128), jnp.float32))
    out = run(src, idx)
    want = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=0)
    ok = np.allclose(np.asarray(out), want)
    best, _ = timed(run, src, idx)
    return f"correct={ok} t={best*1e3:.2f}ms"


def test_p5():
    """Full-table single gather (K == T_CH == 2048 lanes) at drums scale:
    how fast is the wide dynamic_gather per element?"""
    K = 2048
    T_CH = 2048
    RB = 8

    def kern(t_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=1)

    tbl = jax.random.normal(jax.random.PRNGKey(6), (K,), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(11), (V, N), 0, K)

    @jax.jit
    def run(tbl, idx):
        tbl2 = jnp.broadcast_to(tbl[None], (RB, K))
        return pl.pallas_call(
            kern,
            grid=(V // RB, N // T_CH),
            in_specs=[
                pl.BlockSpec((RB, K), lambda r, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RB, T_CH), lambda r, t: (r, t),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((RB, T_CH), lambda r, t: (r, t),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((V, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(tbl2, idx)

    out = run(tbl, idx)
    want = np.asarray(tbl)[np.asarray(idx)]
    ok = np.allclose(np.asarray(out), want)
    best, _ = timed(run, tbl, idx)
    rate = V * N / best / 1e9
    return f"correct={ok} t={best*1e3:.1f}ms rate={rate:.2f}G/s"


if __name__ == "__main__":
    for name, fn in [("P1 wide lane gather", test_p1),
                     ("P2 tiled narrow gather", test_p2),
                     ("P4 sublane gather", test_p4),
                     ("P5 fulltable K=2048 drums-scale", test_p5),
                     ("P3 windowed monotone drums-scale", test_p3),
                     ("P3b windowed divergent drums-scale", test_p3b)]:
        attempt(name, fn)
