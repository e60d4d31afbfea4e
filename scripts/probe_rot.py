"""Micro-probes for in-kernel per-row rotation + paired-gather timing.

R1: ref dynamic lane-START slice (unaligned): hcat_ref[r, pl.ds(idx, L)]
R2: pltpu.roll with a TRACED shift amount
R3: paired-gather (G=2/WA=5) production kernel at sampler scale
R4: true-cold unroll=32 compile (never-seen n busts every cache)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_rot.py
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


def attempt(name, f):
    try:
        r = f()
        log(f"[OK ] {name}: {r}")
    except Exception:
        log(f"[ERR] {name}:")
        traceback.print_exc(file=sys.stderr)


def test_r1():
    R, L = 8, 1218

    def kern(h2_ref, i_ref, o_ref):
        rows = []
        for r in range(R):
            start = i_ref[0, r]
            rows.append(h2_ref[r:r + 1, pl.ds(start, L)])
        o_ref[...] = jnp.concatenate(rows, axis=0)

    buf = jax.random.normal(jax.random.PRNGKey(0), (R, L), jnp.float32)
    h2 = jnp.concatenate([buf, buf], axis=1)
    idx = jax.random.randint(jax.random.PRNGKey(1), (1, R), 0, L)

    @jax.jit
    def run(h2, idx):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
        )(h2, idx)

    out = np.asarray(run(h2, idx))
    want = np.stack([np.roll(np.asarray(buf)[r], -int(idx[0, r]))
                     for r in range(R)])
    return f"correct={np.allclose(out, want)}"


def test_r2():
    R, L = 8, 1280

    def kern(b_ref, i_ref, o_ref):
        s = i_ref[0, 0]
        o_ref[...] = pltpu.roll(b_ref[...], -s, axis=1)

    buf = jax.random.normal(jax.random.PRNGKey(0), (R, L), jnp.float32)
    idx = jnp.asarray([[37]], jnp.int32)

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
    want = np.roll(np.asarray(buf), -37, axis=1)
    return f"correct={np.allclose(out, want)}"


def test_r3():
    from srack_tpu.ops import sample_gather
    V, N, K = 1024, 96256, 48000
    tbl = jax.random.normal(jax.random.PRNGKey(6), (K,), jnp.float32)
    period = 4800 + 173 * (jnp.arange(V)[:, None] % 11)
    idx = jnp.minimum((jnp.arange(N)[None] % period) * 1.0, K - 1.0
                      ).astype(jnp.int32)
    tbl8 = jnp.broadcast_to(tbl[None], (32, K))
    idx32 = idx[:32]

    run = jax.jit(lambda t, i: sample_gather._gather_rows(t, i, False))
    # full scale via the batched entry
    big = jax.jit(lambda t, i: sample_gather._gather_rows(
        jnp.broadcast_to(t[None], (V, K)).reshape(V, K), i, False))
    out = big(tbl, idx)
    ok = np.allclose(np.asarray(out[:8]), np.asarray(tbl)[np.asarray(idx[:8])])
    float(jnp.abs(out).max())
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = big(tbl, idx)
        float(jnp.abs(out).max())
        best = min(best, time.perf_counter() - t0)
    return f"paired G2/WA5 correct={ok} t={best*1e3:.1f}ms rate={V*N/best/1e9:.2f}G/s"


def test_r4():
    import srack_tpu as st
    from srack_tpu.ops import fused
    from srack_tpu.presets import farm_params, subtractive_voice
    V, N = 1024, 1440000 + 1536  # fresh n: busts every compile cache layer
    CFG = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                         precision="fast")
    patch = subtractive_voice(CFG)
    compiled = st.compile_patch(patch)
    params = farm_params(patch, V)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape),
                         compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), V)
    fn = jax.jit(fused.make_fused_render(compiled, N))
    meter = jax.jit(lambda p, s, k: jnp.abs(fn(p, s, k, {})[0]).max())
    t0 = time.perf_counter()
    peak = float(meter(params, state, keys))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    peak = float(meter(params, state, keys))
    best = time.perf_counter() - t0
    return (f"auto-unroll cold compile={compile_s:.1f}s best={best*1e3:.1f}ms "
            f"rate={V*N/best/1e9:.2f}G/s")


if __name__ == "__main__":
    attempt("R1 ref dyn lane-start slice", test_r1)
    attempt("R2 pltpu.roll traced shift", test_r2)
    attempt("R3 paired gather sampler-scale", test_r3)
    attempt("R4 true-cold auto-unroll", test_r4)
