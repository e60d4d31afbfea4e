"""Probe Mosaic (Pallas TPU) support for dynamic-gather primitives.

Round-3 groundwork for killing the sample player's 1024-frame cliff
(modules/sample.py): we need out[r, t] = table[idx[r, t]] for big K at
VPU speed.  Candidate mechanisms, cheapest first:

  A. jnp.take_along_axis along lanes inside a kernel (tpu.dynamic_gather?)
  B. same, with a wide (multi-tile) table axis
  C. traced-bound fori_loop + dynamic slice of a VMEM table ref
  D. one-hot matmul two-level gather (always works; measure MXU cost)

Run on the real TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_gather.py
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
    jax.block_until_ready(out)
    float(jnp.abs(out).max())  # force fetch (axon: block_until_ready unreliable)
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
        return True
    except Exception as e:
        log(f"[ERR] {name}: {type(e).__name__}: {str(e)[:500]}")
        return False


R, T = 32, 2048

# ---------------------------------------------------------------- A
def test_a():
    def kern(t_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=1)

    tbl = jnp.broadcast_to(jnp.arange(128, dtype=jnp.float32)[None] * 10.0,
                           (R, 128))
    idx = jax.random.randint(jax.random.PRNGKey(0), (R, T), 0, 128)

    @jax.jit
    def run(tbl, idx):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, T), jnp.float32),
        )(tbl, idx)

    out = run(tbl, idx)
    want = np.take_along_axis(np.asarray(tbl), np.asarray(idx), axis=1)
    ok = np.allclose(np.asarray(out), want)
    best, _ = timed(run, tbl, idx)
    return f"correct={ok} t={best*1e3:.2f}ms"


# ---------------------------------------------------------------- A2: big T tile, per-row distinct tables
def test_a2():
    K = 512  # multi-tile lane axis for the source

    def kern(t_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=1)

    tbl = jax.random.normal(jax.random.PRNGKey(1), (R, K), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(2), (R, T), 0, K)

    @jax.jit
    def run(tbl, idx):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, T), jnp.float32),
        )(tbl, idx)

    out = run(tbl, idx)
    want = np.take_along_axis(np.asarray(tbl), np.asarray(idx), axis=1)
    ok = np.allclose(np.asarray(out), want)
    best, _ = timed(run, tbl, idx)
    return f"K={K} correct={ok} t={best*1e3:.2f}ms"


# ---------------------------------------------------------------- C: windowed two-level w/ traced fori bounds
def test_c():
    K = 49152  # 384 chunks of 128

    def kern(t_ref, i_ref, lo_ref, hi_ref, o_ref):
        ix = i_ref[...]
        hi = ix >> 7
        lo = ix & 127
        acc0 = jnp.zeros(ix.shape, jnp.float32)

        def body(c, acc):
            chunk = t_ref[:, pl.ds(c * 128, 128)]  # [R, 128] dynamic slice
            g = jnp.take_along_axis(chunk, lo, axis=1)
            return jnp.where(hi == c, g, acc)

        o_ref[...] = jax.lax.fori_loop(lo_ref[0], hi_ref[0] + 1, body, acc0)

    tbl = jax.random.normal(jax.random.PRNGKey(3), (R, K), jnp.float32)
    # monotone playback-like indices: base + ~1.0 rate
    base = 9000
    idx = (base + jnp.arange(T) * 1.37).astype(jnp.int32)
    idx = jnp.broadcast_to(idx[None], (R, T))

    @jax.jit
    def run(tbl, idx):
        lo = (jnp.min(idx) >> 7).reshape(1)
        hi = (jnp.max(idx) >> 7).reshape(1)
        return pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, T), jnp.float32),
        )(tbl, idx, lo, hi)

    out = run(tbl, idx)
    want = np.take_along_axis(np.asarray(tbl), np.asarray(idx), axis=1)
    ok = np.allclose(np.asarray(out), want)
    best, _ = timed(run, tbl, idx)
    return f"K={K} correct={ok} t={best*1e3:.2f}ms"


# ---------------------------------------------------------------- D: one-hot matmul within 128-chunk
def test_d():
    def kern(t_ref, i_ref, o_ref):
        # t: [R,128] per-row chunk; i: [R,T] lo idx
        lo = i_ref[...]
        oh = (lo[:, :, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (R, T, 128), 2))
        # per-row matmul [T,128]x[128] -> too 3-D; try reduce instead
        g = jnp.sum(jnp.where(oh, t_ref[...][:, None, :], 0.0), axis=2)
        o_ref[...] = g

    tbl = jax.random.normal(jax.random.PRNGKey(4), (R, 128), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(5), (R, T), 0, 128)

    @jax.jit
    def run(tbl, idx):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, T), jnp.float32),
        )(tbl, idx)

    out = run(tbl, idx)
    want = np.take_along_axis(np.asarray(tbl), np.asarray(idx), axis=1)
    ok = np.allclose(np.asarray(out), want)
    best, _ = timed(run, tbl, idx)
    return f"correct={ok} t={best*1e3:.2f}ms"


# ---------------------------------------------------------------- E: full-scale timing of C at drums scale
def test_e():
    K = 49152
    V, N = 1024, 48000  # voices x samples
    T_CH = 2048
    RB = 8

    def kern(t_ref, i_ref, rng_ref, o_ref):
        ix = i_ref[...]
        hi = ix >> 7
        lo = ix & 127
        acc0 = jnp.zeros(ix.shape, jnp.float32)
        r = pl.program_id(0)
        t = pl.program_id(1)
        g0 = rng_ref[r, t, 0]
        g1 = rng_ref[r, t, 1]

        def body(c, acc):
            chunk = t_ref[:, pl.ds(c * 128, 128)]
            g = jnp.take_along_axis(chunk, lo, axis=1)
            return jnp.where(hi == c, g, acc)

        o_ref[...] = jax.lax.fori_loop(g0, g1 + 1, body, acc0)

    tbl = jax.random.normal(jax.random.PRNGKey(6), (K,), jnp.float32)
    # per-voice positions: staggered monotone w/ wrap (drums-like)
    pos = (jnp.arange(N)[None] * 1.0
           + jnp.arange(V)[:, None] * 37.0) % (K - 1)
    idx = pos.astype(jnp.int32)

    @jax.jit
    def run(tbl, idx):
        ib = idx.reshape(V // RB, RB, N // T_CH, T_CH)
        lo = jnp.min(jnp.min(ib, axis=3), axis=1) >> 7   # [V/RB, N/T_CH]
        hi = jnp.max(jnp.max(ib, axis=3), axis=1) >> 7
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
    return f"V={V} N={N} K={K} correct={ok} t={best*1e3:.1f}ms rate={rate:.2f}G/s"


if __name__ == "__main__":
    results = {}
    for name, fn in [("A take_along_axis 128", test_a),
                     ("A2 take_along_axis K=512", test_a2),
                     ("C windowed fori K=49k", test_c),
                     ("D onehot reduce", test_d),
                     ("E drums-scale windowed", test_e)]:
        results[name] = attempt(name, fn)
    log("summary:", results)
