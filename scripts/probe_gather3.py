"""Probe round 3: single-vreg dynamic_gather building block.

Constraint from round 2: tpu.dynamic_gather needs src.shape == idx.shape
and <=128 lanes (ONE vreg) along the gather dim.  Plan: per 128-lane
column block of the output, fori over the (tiny, monotonicity-bounded)
range of 128-frame table chunks the block touches; each chunk = dynamic
lane-slice of the VMEM table + one [R,128] gather + select.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_gather3.py
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


def test_q1():
    R = 32
    src = jax.random.normal(jax.random.PRNGKey(0), (R, 128), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (R, 128), 0, 128)

    def kern(s_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(s_ref[...], i_ref[...], axis=1)

    @jax.jit
    def run(s, i):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        )(s, i)

    out = run(src, idx)
    want = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=1)
    ok = np.allclose(np.asarray(out), want)
    best, _ = timed(run, src, idx)
    return f"correct={ok} t={best*1e3:.2f}ms"


V, N = 1024, 49152
K = 49152


def make_windowed(RB, T_CH):
    """Column-block windowed gather kernel: shared [1, K] table."""
    n_blocks = T_CH // 128

    def kern(t_ref, i_ref, o_ref):
        for b in range(n_blocks):
            ix = i_ref[:, b * 128:(b + 1) * 128]
            lo = jnp.bitwise_and(ix, 127)
            hi = jnp.right_shift(ix, 7)
            c0 = jnp.min(hi)
            c1 = jnp.max(hi)

            def body(c, acc):
                start = pl.multiple_of(c * 128, 128)
                win = t_ref[0, pl.ds(start, 128)]          # [128]
                win2 = jnp.broadcast_to(win[None], (RB, 128))
                g = jnp.take_along_axis(win2, lo, axis=1)
                return jnp.where(hi == c, g, acc)

            o_ref[:, b * 128:(b + 1) * 128] = jax.lax.fori_loop(
                c0, c1 + 1, body, jnp.zeros((RB, 128), jnp.float32))

    @jax.jit
    def run(tbl, idx):
        return pl.pallas_call(
            kern,
            grid=(V // RB, N // T_CH),
            in_specs=[
                pl.BlockSpec((1, K), lambda r, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RB, T_CH), lambda r, t: (r, t),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((RB, T_CH), lambda r, t: (r, t),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((V, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(tbl[None], idx)

    return run


def test_q2(RB=32, T_CH=2048):
    tbl = jax.random.normal(jax.random.PRNGKey(6), (K,), jnp.float32)
    pos = (jnp.arange(N)[None] * 1.0 + jnp.arange(V)[:, None] * 37.0) % (K - 1)
    idx = pos.astype(jnp.int32)
    run = make_windowed(RB, T_CH)
    out = run(tbl, idx)
    want = np.asarray(tbl)[np.asarray(idx)]
    ok = np.allclose(np.asarray(out), want)
    best, _ = timed(run, tbl, idx)
    rate = V * N / best / 1e9
    return f"RB={RB} T_CH={T_CH} correct={ok} t={best*1e3:.1f}ms rate={rate:.2f}G/s"


def test_q3(RB=32, T_CH=2048):
    """Divergent voices: random starts, random rates in [0.5, 2]."""
    starts = jax.random.randint(jax.random.PRNGKey(9), (V, 1), 0, K)
    rate = jnp.exp2(jax.random.uniform(jax.random.PRNGKey(10), (V, 1)) * 2 - 1)
    pos = (starts + jnp.arange(N)[None] * rate) % (K - 1)
    idx = pos.astype(jnp.int32)
    tbl = jax.random.normal(jax.random.PRNGKey(6), (K,), jnp.float32)
    run = make_windowed(RB, T_CH)
    out = run(tbl, idx)
    want = np.asarray(tbl)[np.asarray(idx)]
    ok = np.allclose(np.asarray(out), want)
    best, _ = timed(run, tbl, idx)
    rate_ = V * N / best / 1e9
    return f"RB={RB} T_CH={T_CH} correct={ok} t={best*1e3:.1f}ms rate={rate_:.2f}G/s"


def test_q4():
    """Uniform random idx (worst case: every block spans the whole table)."""
    idx = jax.random.randint(jax.random.PRNGKey(11), (V, N), 0, K)
    tbl = jax.random.normal(jax.random.PRNGKey(6), (K,), jnp.float32)
    run = make_windowed(32, 2048)
    out = run(tbl, idx)
    want = np.asarray(tbl)[np.asarray(idx)]
    ok = np.allclose(np.asarray(out), want)
    best, _ = timed(run, tbl, idx)
    rate_ = V * N / best / 1e9
    return f"correct={ok} t={best*1e3:.1f}ms rate={rate_:.2f}G/s"


if __name__ == "__main__":
    attempt("Q1 single-vreg gather", test_q1)
    attempt("Q2 windowed monotone RB32 T2048", lambda: test_q2(32, 2048))
    attempt("Q2 windowed monotone RB8 T2048", lambda: test_q2(8, 2048))
    attempt("Q3 windowed divergent RB32", lambda: test_q3(32, 2048))
    attempt("Q3 windowed divergent RB8", lambda: test_q3(8, 2048))
    attempt("Q4 uniform-random worst case", test_q4)
