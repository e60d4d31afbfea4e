"""Windowed two-level table gather for long sample playback (Pallas TPU).

Kills the sample player's 1024-frame perf cliff (round-2 verdict item 1):
``out[r, t] = table[r, idx[r, t]]`` for tables of tens/hundreds of
thousands of frames at >1 G samples/s, where the XLA gather runs at ~50 M
scalar loads/s and the VMEM select chain (ops/scan_kernel._gather_rows) is
O(K) vector ops per tile.

Mechanism -- built on the one hardware gather Mosaic exposes,
``tpu.dynamic_gather`` (same-shape 2-D src/idx, ONE vreg along the gather
dim, i.e. each of 8 sublane rows gathers within its own 128 lanes):

* the table is laid out as [rows, K/128, 128] -- 128-frame *chunks* on the
  sublane axis, so a chunk is one dynamic sublane slice (cheap), not a
  dynamic lane slice across hundreds of vregs (a select tree);
* per 128-sample column block of each 8-voice tile, each row gets its OWN
  window of ``WA`` consecutive chunks starting at the chunk of the row's
  first index in the block (playback positions are monotone between gate
  edges, sample.rs:228-234, so a block touches ~rate+1 chunks).  One
  [8, 128] take_along_axis per window chunk covers all 8 per-row windows
  at once;
* a static table-head window (chunks 0..WB-1) catches trigger restarts and
  the end-of-sample reset-to-zero (sample.rs:223-226);
* any element the static windows miss (rates above ~WA-1, pathological
  index patterns) is caught by a dynamic residual chunk loop whose bounds
  are precomputed in XLA per block -- EMPTY (zero iterations) for normal
  playback, full-table-scan correct in the worst case.

Measured (scripts/probe_gather4.py, v5e, [1024 voices x 49152 samples],
49152-frame table): 1.2 G samples/s for monotone, trigger-staggered
(drums) and restart patterns vs 0.05 G for the XLA gather; bit-exact
against numpy indexing on every pattern.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
T_CH = 2048      # time lanes per grid step
NBLK = T_CH // LANES
G = 2            # column blocks sharing one per-row window-slab fetch
WA = 5           # per-row window chunks (covers playback rates < ~2 over
                 # a G-block span; the dominant per-block cost is the RB
                 # dynamic slab reads, so G blocks share one fetch)
WB = 2           # table-head chunks (trigger restarts / end-of-sample)

# tables at or under this many 128-frame chunks skip the windowed
# machinery entirely: every chunk is matched statically (3 vector ops per
# chunk per block), which beats the per-row dynamic slab reads that
# dominate the windowed path (ops/sample_kernel skips computing window
# summaries for these too)
SMALL_CHUNKS = 12

# per-row tables must fit VMEM alongside the idx/out tiles
_VMEM_TABLE_BUDGET = 12 * 1024 * 1024


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_rb(k: int) -> int:
    """Rows per tile: more rows amortize per-block loop/scalar overhead
    (measured RB=32 1.6x over RB=8 at K=48k, scripts/probe_gather5.py),
    but the per-row table tile [RB, K] must fit VMEM -- shrink RB for
    long tables."""
    n_chunks = _ceil_to(k, LANES) // LANES + WA
    for rb in (32, 16, 8):
        if rb * n_chunks * LANES * 4 <= _VMEM_TABLE_BUDGET:
            return rb
    return 0


def eligible(table, idx) -> bool:
    """1-D logical table/idx (batch axes fold into rows via custom_vmap),
    f32 table, long enough to amortize the kernel, table fits VMEM."""
    if not (table.ndim == 1 and idx.ndim == 1):
        return False
    k = table.shape[0]
    return (idx.shape[0] >= T_CH
            and k >= 2
            and table.dtype == jnp.float32
            and _pick_rb(k) > 0
            and jax.default_backend() == "tpu")


def _make_small_kernel(n_chunks: int, RB: int):
    """Static whole-table gather for tables of <= SMALL_CHUNKS chunks:
    every 128-frame chunk is a static sublane row matched against the
    index high bits -- no per-row dynamic slabs, no residual loop."""
    def kernel(tbl_ref, i_ref, o_ref):
        for b in range(NBLK):
            ix = i_ref[:, b * LANES:(b + 1) * LANES]
            hi = jnp.right_shift(ix, 7)
            lo = jnp.bitwise_and(ix, 127)
            acc = jnp.zeros((RB, LANES), jnp.float32)
            for c in range(n_chunks):
                gth = jnp.take_along_axis(tbl_ref[:, c, :], lo, axis=1)
                acc = jnp.where(hi == c, gth, acc)
            o_ref[:, b * LANES:(b + 1) * LANES] = acc

    return kernel


def _make_kernel(n_chunks_padded: int, RB: int):
    def kernel(tbl_ref, i_ref, csm_ref, r0_ref, r1_ref, o_ref):
        t = pl.program_id(1)
        for k in range(NBLK // G):
            # one [WA, 128] sublane slab per row serves G column blocks
            # (the per-row dynamic reads dominate; bases are snapshotted
            # at the pair's first sample in the XLA precompute)
            col0 = t * NBLK + k * G
            bases = [csm_ref[0, r, col0] for r in range(RB)]
            base_v = jnp.stack(bases).reshape(RB, 1)
            slabs = jnp.stack(
                [tbl_ref[r, pl.ds(bases[r], WA), :] for r in range(RB)])
            for g_i in range(G):
                b = k * G + g_i
                col = col0 + g_i
                ix = i_ref[:, b * LANES:(b + 1) * LANES]
                hi = jnp.right_shift(ix, 7)
                lo = jnp.bitwise_and(ix, 127)  # gather lane; misses are
                acc = jnp.zeros((RB, LANES), jnp.float32)  # masked below
                for w in range(WA):
                    win = slabs[:, w, :]
                    gth = jnp.take_along_axis(win, lo, axis=1)
                    acc = jnp.where(hi == base_v + w, gth, acc)
                # table-head window (static rows, per-row tables)
                for c in range(WB):
                    gth = jnp.take_along_axis(tbl_ref[:, c, :], lo, axis=1)
                    acc = jnp.where(hi == c, gth, acc)
                # residual chunk loop: zero iterations when the static
                # windows covered everything (r0 > r1).  The loop is
                # predicated whole-block: even a zero-iteration fori_loop
                # costs real setup per block (measured 8.7 ms of the full
                # kernel's 57.1 ms at [1024 x 480k], always-empty --
                # scripts/ab_gather_parts.py), so the common all-covered
                # case must not touch it.  The store runs in both regions
                # (values can flow in but not out of a pl.when).
                r0 = r0_ref[0, 0, col]
                r1 = r1_ref[0, 0, col]
                sl = slice(b * LANES, (b + 1) * LANES)

                @pl.when(r1 < r0)
                def _(acc=acc, sl=sl):
                    o_ref[:, sl] = acc

                @pl.when(r1 >= r0)
                def _(acc=acc, sl=sl):
                    def body(c, a):
                        win = tbl_ref[:, pl.ds(c, 1), :].reshape(RB, LANES)
                        gth = jnp.take_along_axis(win, lo, axis=1)
                        return jnp.where(hi == c, gth, a)

                    o_ref[:, sl] = jax.lax.fori_loop(r0, r1 + 1, body, acc)

    return kernel


@functools.partial(jax.jit, static_argnums=(2,))
def _gather_rows(table, idx, interpret):
    """[R, K] per-row tables, [R, n] int32 indices already in [0, K)."""
    r, k = table.shape
    _, n = idx.shape
    RB = _pick_rb(k) or 8
    rp = _ceil_to(max(r, 1), RB)
    np_ = _ceil_to(n, T_CH)
    idx = jnp.pad(idx, ((0, rp - r), (0, np_ - n)))

    nb = np_ // LANES
    ib = idx.reshape(rp, nb, LANES)
    # window base = chunk of the first sample of each G-block PAIR (both
    # blocks of a pair share one slab fetch in the kernel)
    base_pair = jnp.right_shift(ib[:, ::G, 0], 7)      # [rp, nb/G]
    basec = jnp.repeat(base_pair, G, axis=1)           # [rp, nb]
    local = ib - (basec << 7)[:, :, None]
    covered = jnp.logical_or(
        jnp.logical_and(local >= 0, local < WA * LANES),
        ib < WB * LANES)
    unc = jnp.logical_not(covered)
    big = jnp.int32(2 ** 30)
    u_min = jnp.min(jnp.where(unc, ib, big).reshape(rp // RB, RB, nb, LANES),
                    axis=(1, 3))                       # [RT, nb]
    u_max = jnp.max(jnp.where(unc, ib, -1).reshape(rp // RB, RB, nb, LANES),
                    axis=(1, 3))
    r0 = jnp.right_shift(u_min, 7).astype(jnp.int32)[:, None, :]
    r1 = jnp.right_shift(jnp.maximum(u_max, -1), 7).astype(
        jnp.int32)[:, None, :]
    out = _gather_precomputed(table, idx, basec, r0, r1, n, interpret)
    return out[:, :n]


def _gather_precomputed(table, idx, basec, r0, r1, n, interpret):
    """Core windowed gather with window summaries already computed --
    either by :func:`_gather_rows` above (XLA reductions over the index
    array) or in-kernel by ops/sample_kernel's position pipeline.

    ``table``: [R, K]; ``idx``: [rp, np_] padded clipped indices;
    ``basec``: [rp, nb] per-row window-base chunks; ``r0``/``r1``:
    [rp//RB, 1, nb] residual chunk ranges.  Returns [R, np_] (caller
    slices off the time padding)."""
    r, k = table.shape
    RB = _pick_rb(k) or 8
    rp, np_ = idx.shape
    nb = np_ // LANES
    n_chunks = _ceil_to(k, LANES) // LANES

    if n_chunks <= SMALL_CHUNKS:
        tbl3d = jnp.pad(
            table, ((0, rp - r), (0, n_chunks * LANES - k))
        ).reshape(rp, n_chunks, LANES)
        out = pl.pallas_call(
            _make_small_kernel(n_chunks, RB),
            grid=(rp // RB, np_ // T_CH),
            in_specs=[
                pl.BlockSpec((RB, n_chunks, LANES),
                             lambda rr, tt: (rr, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RB, T_CH), lambda rr, tt: (rr, tt),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((RB, T_CH), lambda rr, tt: (rr, tt),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rp, np_), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=interpret,
        )(tbl3d, idx)
        return out[:r, :n]

    tbl3d = jnp.pad(
        table, ((0, rp - r), (0, (n_chunks + WA) * LANES - k))
    ).reshape(rp, n_chunks + WA, LANES)
    basec3 = basec.reshape(rp // RB, RB, nb)

    out = pl.pallas_call(
        _make_kernel(n_chunks + WA, RB),
        grid=(rp // RB, np_ // T_CH),
        in_specs=[
            pl.BlockSpec((RB, n_chunks + WA, LANES), lambda rr, tt: (rr, 0, 0),
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
        out_shape=jax.ShapeDtypeStruct((rp, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(tbl3d, idx, basec3, r0, r1)
    return out[:r, :n]


@jax.custom_batching.custom_vmap
def _gather2d(table, idx):
    return _gather_rows(table, idx, jax.default_backend() != "tpu")


@_gather2d.def_vmap
def _gather_rule(axis_size, in_batched, table, idx):
    table, idx = (a if b else
                  jnp.broadcast_to(a[None], (axis_size,) + a.shape)
                  for a, b in zip((table, idx), in_batched))
    out = _gather2d(table.reshape((-1, table.shape[-1])),
                    idx.reshape((-1, idx.shape[-1])))
    return out.reshape((axis_size, -1, out.shape[-1])), True


def gather_1d(table, idx):
    """``table[idx]`` -- 1-D table and indices (idx clipped by caller).
    Batch axes (vmap over voices) fold into kernel rows."""
    out = _gather2d(table[None], idx.astype(jnp.int32)[None])
    return out[0]
