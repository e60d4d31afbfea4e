"""Isolate the Freeverb kernel's per-grid-invocation floor.

probe_fv_parts measured: full 40 ms, bare (no scan/roll/allpass) 27 ms at
grid (32 tiles x 41 chunks) = 1312 invocations (~20 us each) -- and
removing 4 of 11 scan passes changed nothing.  Hypothesis: a fixed
per-invocation cost (grid step + resident-line access patterns)
dominates.  Variants:

* trivial: same block/line specs, kernel only copies mixed -> out_l/out_r
  (lines copied at t==0 only) -- the pure DMA + invocation floor;
* bare at t_c x2 / x4 (reads fudged to keep shapes legal; timing only) --
  does halving invocations halve the floor?

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_fv_floor.py
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

LANES, VB = 128, 32
V, SR = 1024, 48000
cl, cr, al, ar = line_lengths(SR)
comb_lens = tuple(cl) + tuple(cr)
ap_lens = tuple(al) + tuple(ar)
all_lens = comb_lens + ap_lens
base_tc = (min(comb_lens) // 128) * 128      # 1152

rng = np.random.default_rng(0)


def build(t_c, mode):
    """mode: 'trivial' (copy only) or 'bare' (16 comb-ish reads + one-pole
    carry + write, no scan/roll/allpass; sub-piece reads when t_c exceeds
    the line)."""
    n = (SR // t_c) * t_c
    n_chunks = n // t_c

    def kernel(*refs):
        mixed_ref = refs[0]
        fs_in_ref, gp_ref = refs[1], refs[2]
        hin_refs = refs[3:3 + 24]
        out_l_ref, out_r_ref, fs_ref = refs[3 + 24:6 + 24]
        h_refs = refs[6 + 24:]
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            fs_ref[...] = fs_in_ref[...]
            for hr, hi in zip(h_refs, hin_refs):
                hr[...] = hi[...]

        mixed = mixed_ref[...]
        if mode == "trivial":
            out_l_ref[...] = mixed
            out_r_ref[...] = mixed * 0.5
            return
        damp = gp_ref[:, 0:1]
        feed = gp_ref[:, 1:2]
        ys = []
        for j in range(16):
            h = h_refs[j][...]
            L = h.shape[1]
            if L >= t_c:
                y = h[:, :t_c]
            else:
                reps = -(-t_c // L)
                y = jnp.concatenate([h] * reps, axis=1)[:, :t_c]
            B = y * (1.0 - damp)
            fs_t = B + damp * fs_ref[:, j:j + 1]
            w = mixed + fs_t * feed
            h_refs[j][:, :min(L, t_c)] = w[:, :min(L, t_c)]
            fs_ref[:, j:j + 1] = fs_t[:, -1:]
            ys.append(y)
        out_l_ref[...] = sum(ys[:8])
        out_r_ref[...] = sum(ys[8:])

    def lane_spec():
        return pl.BlockSpec((VB, t_c), lambda vt, tt: (vt, tt),
                            memory_space=pltpu.VMEM)

    def state_spec(width):
        return pl.BlockSpec((VB, width), lambda vt, tt: (vt, 0),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def run(mixed, fs, gp, *hists):
        vp = mixed.shape[0]
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
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(mixed, fs, gp, *hists)
        return outs[0]

    return run, n, n_chunks


fs0 = jnp.zeros((V, LANES), jnp.float32)
gp = jnp.zeros((V, LANES), jnp.float32).at[:, 0].set(0.2).at[:, 1].set(0.84)
hists = [jnp.asarray(rng.normal(size=(V, l)).astype(np.float32) * 0.01)
         for l in all_lens]

float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))

def build_nolines(t_c):
    """Trivial copy kernel with NO delay-line refs at all: isolates the
    lane-stream DMA floor from the resident-line machinery."""
    n = (SR // t_c) * t_c
    n_chunks = n // t_c

    def kernel(mixed_ref, out_l_ref, out_r_ref):
        mixed = mixed_ref[...]
        out_l_ref[...] = mixed
        out_r_ref[...] = mixed * 0.5

    def lane_spec():
        return pl.BlockSpec((VB, t_c), lambda vt, tt: (vt, tt),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def run(mixed):
        outs = pl.pallas_call(
            kernel, grid=(V // VB, n_chunks),
            in_specs=[lane_spec()], out_specs=[lane_spec(), lane_spec()],
            out_shape=[jax.ShapeDtypeStruct((V, n), jnp.float32)] * 2,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(mixed)
        return outs[0]

    return run, n, n_chunks


def build_contig(t_c):
    """Trivial copy with block-contiguous layout [g, VB, t_c] (the fused
    kernel's shape family): is the [V, n]/[VB, t_c] 25 GB/s floor a DMA
    striding artifact?"""
    n = (SR // t_c) * t_c
    g = (V // VB) * (n // t_c)

    def kernel(mixed_ref, out_l_ref, out_r_ref):
        mixed = mixed_ref[...]
        out_l_ref[...] = mixed
        out_r_ref[...] = mixed * 0.5

    spec = pl.BlockSpec((1, VB, t_c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)

    @jax.jit
    def run(mixed3):
        outs = pl.pallas_call(
            kernel, grid=(g,),
            in_specs=[spec], out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((g, VB, t_c), jnp.float32)] * 2,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(mixed3)
        return outs[0]

    return run, n, g


for t_c in (base_tc,):
    run, n, g = build_contig(t_c)
    mixed3 = jnp.asarray(rng.normal(size=(g, VB, t_c)).astype(np.float32)
                         * 0.01)
    meter = jax.jit(lambda m: jnp.abs(run(m)).max())
    t0 = time.perf_counter()
    float(meter(mixed3))
    c = time.perf_counter() - t0
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(meter(mixed3))
        best = min(best, time.perf_counter() - t0)
    gb = 3 * g * VB * t_c * 4 / 1e9
    log(f"[contig   t_c={t_c:5d}] n={n} inv={g:5d} compile={c:5.1f}s "
        f"best={best*1e3:6.1f}ms ({gb/best:6.1f}GB/s) "
        f"rate={V*n/best/1e9:.2f}G/s")

    # XLA-native streaming baseline at the same shape
    f = jax.jit(lambda m: jnp.abs(m * 2.0 + 1.0).max())
    big = jnp.asarray(rng.normal(size=(V, n)).astype(np.float32))
    float(f(big))
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(big))
        best = min(best, time.perf_counter() - t0)
    log(f"[xla mul+max [V,n]] best={best*1e3:6.1f}ms "
        f"({V*n*4/1e9/best:6.1f}GB/s read)")

for t_c in (base_tc,):
    run, n, n_chunks = build_nolines(t_c)
    mixed = jnp.asarray(rng.normal(size=(V, n)).astype(np.float32) * 0.01)
    meter = jax.jit(lambda m: jnp.abs(run(m)).max())
    t0 = time.perf_counter()
    float(meter(mixed))
    c = time.perf_counter() - t0
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(meter(mixed))
        best = min(best, time.perf_counter() - t0)
    inv = (V // VB) * n_chunks
    log(f"[nolines  t_c={t_c:5d}] n={n} inv={inv:5d} compile={c:5.1f}s "
        f"best={best*1e3:6.1f}ms ({best/inv*1e6:5.1f}us/inv) "
        f"rate={V*n/best/1e9:.2f}G/s")

for t_c, mode in ((base_tc, "trivial"), (base_tc, "bare"),
                  (2 * base_tc, "bare"), (4 * base_tc, "bare"),
                  (4 * base_tc, "trivial")):
    run, n, n_chunks = build(t_c, mode)
    mixed = jnp.asarray(rng.normal(size=(V, n)).astype(np.float32) * 0.01)
    meter = jax.jit(lambda m, *a: jnp.abs(run(m, *a)).max())
    try:
        t0 = time.perf_counter()
        float(meter(mixed, fs0, gp, *hists))
        c = time.perf_counter() - t0
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            float(meter(mixed, fs0, gp, *hists))
            best = min(best, time.perf_counter() - t0)
        inv = (V // VB) * n_chunks
        log(f"[{mode:8s} t_c={t_c:5d}] n={n} inv={inv:5d} "
            f"compile={c:5.1f}s best={best*1e3:6.1f}ms "
            f"({best/inv*1e6:5.1f}us/inv) rate={V*n/best/1e9:.2f}G/s")
    except Exception as e:
        log(f"[{mode} t_c={t_c}] FAILED: {type(e).__name__} "
            f"{str(e)[:160]}")
log("DONE")
