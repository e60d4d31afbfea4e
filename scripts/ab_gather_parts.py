"""Interleaved intra-kernel attribution for the windowed gather
(ops/sample_gather._make_kernel) at the sampler-bench shape: which part
binds -- the 32 per-row dynamic slab reads + stack, the WA+WB
take_along_axis/select chains, or the residual loop machinery?

Variants (timing-only, NOT semantics-preserving except "full"):
  full        -- the real kernel
  shared-slab -- ONE slab read (row 0's base) broadcast to all rows
  no-slab     -- skip the per-row window entirely (head window only)
  no-gather   -- slab reads kept, take_along_axis/selects dropped
  bare        -- index in, zeros out (loop + IO floor)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_gather_parts.py
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

from srack_tpu.ops import sample_gather as sg

LANES, T_CH, NBLK, G, WA, WB = (sg.LANES, sg.T_CH, sg.NBLK, sg.G, sg.WA,
                                sg.WB)


def make_kernel(n_chunks_padded, RB, *, slab="rows", gather=True,
                head=True, residual=True):
    def kernel(tbl_ref, i_ref, csm_ref, r0_ref, r1_ref, o_ref):
        t = pl.program_id(1)
        for kk in range(NBLK // G):
            col0 = t * NBLK + kk * G
            if slab == "rows":
                bases = [csm_ref[0, r, col0] for r in range(RB)]
                base_v = jnp.stack(bases).reshape(RB, 1)
                slabs = jnp.stack(
                    [tbl_ref[r, pl.ds(bases[r], WA), :] for r in range(RB)])
            elif slab == "shared":
                b0 = csm_ref[0, 0, col0]
                base_v = jnp.full((RB, 1), b0, jnp.int32)
                one = tbl_ref[0, pl.ds(b0, WA), :]          # [WA, 128]
                slabs = jnp.broadcast_to(one[None], (RB, WA, LANES))
            else:
                base_v = jnp.zeros((RB, 1), jnp.int32)
                slabs = None
            for g_i in range(G):
                b = kk * G + g_i
                col = col0 + g_i
                ix = i_ref[:, b * LANES:(b + 1) * LANES]
                hi = jnp.right_shift(ix, 7)
                lo = jnp.bitwise_and(ix, 127)
                acc = jnp.zeros((RB, LANES), jnp.float32)
                if slab is not None and gather:
                    for w in range(WA):
                        win = slabs[:, w, :]
                        gth = jnp.take_along_axis(win, lo, axis=1)
                        acc = jnp.where(hi == base_v + w, gth, acc)
                if head and gather:
                    for c in range(WB):
                        gth = jnp.take_along_axis(tbl_ref[:, c, :], lo,
                                                  axis=1)
                        acc = jnp.where(hi == c, gth, acc)
                if residual:
                    r0 = r0_ref[0, 0, col]
                    r1 = r1_ref[0, 0, col]

                    def body(c, acc):
                        win = tbl_ref[:, pl.ds(c, 1), :].reshape(RB, LANES)
                        gth = jnp.take_along_axis(win, lo, axis=1)
                        return jnp.where(hi == c, gth, acc)

                    acc = jax.lax.fori_loop(r0, r1 + 1, body, acc)
                o_ref[:, b * LANES:(b + 1) * LANES] = acc

    return kernel


def build(r, k, n, **kw):
    RB = sg._pick_rb(k) or 8
    rp = sg._ceil_to(max(r, 1), RB)
    np_ = sg._ceil_to(n, T_CH)
    n_chunks = sg._ceil_to(k, LANES) // LANES

    def run(table, idx, basec, r0, r1):
        tbl3d = jnp.pad(
            table, ((0, rp - r), (0, (n_chunks + WA) * LANES - k))
        ).reshape(rp, n_chunks + WA, LANES)
        basec3 = basec.reshape(rp // RB, RB, np_ // LANES)
        out = pl.pallas_call(
            make_kernel(n_chunks + WA, RB, **kw),
            grid=(rp // RB, np_ // T_CH),
            in_specs=[
                pl.BlockSpec((RB, n_chunks + WA, LANES),
                             lambda rr, tt: (rr, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RB, T_CH), lambda rr, tt: (rr, tt),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, RB, np_ // LANES),
                             lambda rr, tt: (rr, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, np_ // LANES), lambda rr, tt: (rr, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, np_ // LANES), lambda rr, tt: (rr, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((RB, T_CH), lambda rr, tt: (rr, tt),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rp, np_), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(tbl3d, idx, basec3, r0, r1)
        return out

    return jax.jit(run), RB, rp, np_


V, K, SECS = 1024, 48000, 10
SR = 48000
n = SECS * SR

rng = np.random.default_rng(0)
table = jnp.asarray(rng.normal(size=(V, K)).astype(np.float32))
# monotone playback at rate ~1 with periodic restarts (drums-like)
pos = (np.arange(n, dtype=np.float64) % K).astype(np.int32)
idx_np = np.broadcast_to(pos, (V, n)).copy()
_, RB0, rp, np_ = build(V, K, n)
idxp = jnp.asarray(np.pad(idx_np, ((0, rp - V), (0, np_ - n))))
nb = np_ // LANES
ib = np.asarray(idxp).reshape(rp, nb, LANES)
base_pair = (ib[:, ::G, 0] >> 7)
basec = jnp.asarray(np.repeat(base_pair, G, axis=1).astype(np.int32))
local = ib - (np.asarray(basec) << 7)[:, :, None]
covered = ((local >= 0) & (local < WA * LANES)) | (ib < WB * LANES)
unc = ~covered
big = np.int32(2 ** 30)
u_min = np.where(unc, ib, big).reshape(rp // RB0, RB0, nb, LANES).min(
    axis=(1, 3))
u_max = np.where(unc, ib, -1).reshape(rp // RB0, RB0, nb, LANES).max(
    axis=(1, 3))
r0 = jnp.asarray((u_min >> 7).astype(np.int32)[:, None, :])
r1 = jnp.asarray((np.maximum(u_max, -1) >> 7).astype(np.int32)[:, None, :])

float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
log(f"warmed; RB={RB0} rp={rp} np={np_}")

VARIANTS = [
    ("full", dict()),
    ("shared-slab", dict(slab="shared")),
    ("no-slab", dict(slab=None)),
    ("no-gather", dict(gather=False)),
    ("no-residual", dict(residual=False)),
    ("bare", dict(slab=None, gather=False, residual=False, head=False)),
]
meters = {}
for name, kw in VARIANTS:
    try:
        run, *_ = build(V, K, n, **kw)
        m = jax.jit(lambda t_, i_, b_, q0, q1, _r=run:
                    jnp.abs(_r(t_, i_, b_, q0, q1)).max())
        t0 = time.perf_counter()
        float(m(table, idxp, basec, r0, r1))
        log(f"built {name} compile={time.perf_counter()-t0:.1f}s")
        meters[name] = m
    except Exception as e:
        log(f"[{name}] FAILED: {type(e).__name__}: {str(e)[:200]}")

best = {kname: 1e9 for kname in meters}
order = list(meters)
for rr in range(8):
    for kname in (order if rr % 2 == 0 else order[::-1]):
        t0 = time.perf_counter()
        float(meters[kname](table, idxp, basec, r0, r1))
        dt = time.perf_counter() - t0
        best[kname] = min(best[kname], dt)
full = best.get("full", 0)
log("")
for kname, b in best.items():
    log(f"BEST {kname:12s}: {b*1e3:6.1f}ms  delta={-(full-b)*1e3:+7.1f}ms  "
        f"device~{(b-0.028)*1e3/SECS:5.2f}ms/s-audio")
