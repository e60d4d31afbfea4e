"""Fused whole-Sample position pipeline (Pallas TPU).

``modules/sample.py _block`` computes playback positions from gate/CV
lanes with a chain of primitives -- edge detection, rate ``exp2``,
prefix-sum, trigger forward-fill, threshold/clip -- that XLA + the
individual scan kernels execute as ~8 separate HBM round trips over the
[voices, n] lanes (measured ~19 ms of the ~30 ms Sample block at
[1024 x 96000], scripts/probe_sample_parts.py).  This kernel computes the
entire pipeline AND the windowed table read in ONE chunked VMEM pass
(gate+cv lanes in, audio out): the gather indices and their window
summaries never leave registers -- see :func:`_make_kernel` for why the
two-kernel split was the sampler_kit's binding cost.

Semantics are the Sample block path's, which are the reference's serial
player (src/synth/sample.rs:215-236): rising gate edge restarts playback,
position is a segmented prefix sum of ``(wav_sr/sr) * 2^cv`` rates,
running past the end emits ``samples[0]`` and stops -- folded here into
``idx = 0`` where crossed (``samples[0]`` IS the read at index 0).

The in-chunk rate prefix sum replicates ops/scan_kernel's exact structure
(same T_CHUNK, same Hillis-Steele shift order, carry folded after the
chunk scan) so results match the unfused path bit-for-bit; the
last-trigger fill is a running max (ops/basic.monotone_fill -- max is
order-free, so any chunking matches exactly), and an unconnected CV input
collapses the prefix sum to ``base * iota`` (bit-exact elementwise
multiply in both paths).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import sample_gather
from .sample_gather import LANES, NBLK, T_CH, WA, WB, _ceil_to

BIG = 2 ** 30


def _shift(x, s, fill):
    rows, n = x.shape
    if s >= n:
        return jnp.full_like(x, fill)
    pad = jnp.full((rows, s), fill, x.dtype)
    return jnp.concatenate([pad, x[:, : n - s]], axis=1)


def _make_kernel(rb: int, n: int, k: int, cv_none: bool):
    """FUSED position+gather kernel: gate (+cv) lanes in, audio out --
    grid (rows/rb, n_pad/T_CH); per-row-tile carries in scratch.

    The gather indices and their window summaries never leave registers:
    the two-kernel split (position kernel -> idx/summaries through
    HBM+SMEM -> windowed gather kernel) paid the idx lanes' HBM write AND
    re-read plus a second kernel's streaming setup -- ~18 ms per pair at
    [1024 x 96000] vs 12-14 ms fused, device k=1 13.9 ms (~7.1 G
    samples/s per 48k-frame Sample; scripts/probe_smp_scaling.py, linear
    in the number of Samples).  Per column block the
    kernel computes idx, takes the per-row window slabs (scalar chunk
    bases via a [rb, 1] VMEM scratch round-trip -- Mosaic supports scalar
    reads of just-written VMEM, scripts/probe_scalar_extract.py; SMEM
    scratch only stores scalars), and falls back to a predicated
    residual-chunk loop exactly like ops/sample_gather._make_kernel.

    ``cv_none``: the module's CV input is unconnected, so the rate is the
    per-row constant ``base`` and the position prefix sum collapses to
    ``base * global_iota`` (one fma instead of the log2(T_CH)-pass
    Hillis-Steele sum; also drops the cv lane's HBM read).  Bit-exact with
    the unfused path's ``base * arange(n)`` (elementwise multiply of the
    same exactly-representable iota -- no summation order involved)."""
    t_last = (n - 1) // T_CH
    j_last = (n - 1) % T_CH
    n_chunks = _ceil_to(k, LANES) // LANES
    small = n_chunks <= sample_gather.SMALL_CHUNKS

    def kernel(*refs):
        if cv_none:
            gate_ref, par_ref, tbl_ref, out_ref, st_ref = refs[:5]
            scr = refs[5:]
            cv_ref = c_cum = None
        else:
            gate_ref, cv_ref, par_ref, tbl_ref, out_ref, st_ref = refs[:6]
            c_cum, scr = refs[6], refs[7:]
        c_max, c_last = scr[0], scr[1]
        b_scr = None if small else scr[2]
        t = pl.program_id(1)

        # per-row params from SMEM
        base = jnp.stack([par_ref[r, 0] for r in range(rb)]).reshape(rb, 1)
        pos0 = jnp.stack([par_ref[r, 1] for r in range(rb)]).reshape(rb, 1)
        play0 = jnp.stack([par_ref[r, 2] for r in range(rb)]).reshape(rb, 1)
        len_f = jnp.stack([par_ref[r, 3] for r in range(rb)]).reshape(rb, 1)
        last0 = jnp.stack([par_ref[r, 4] for r in range(rb)]).reshape(rb, 1)

        @pl.when(t == 0)
        def _():
            if not cv_none:
                c_cum[...] = jnp.zeros(c_cum.shape, jnp.float32)
            c_max[...] = jnp.full(c_max.shape, -1.0, jnp.float32)
            # carried TransitionDetector state (transition_init() is True
            # for a fresh render: a high gate at t=0 does not fire)
            c_last[...] = jnp.broadcast_to(
                (last0 > 0.0).astype(jnp.int32), c_last.shape)

        # n need not be a T_CH multiple: lanes arrive UNPADDED (a whole-
        # segment jnp.pad cost a fresh [V, n] HBM copy per Sample -- 1.84 G
        # each at [1024 x 480k], the allocations that OOMed 30 s segmented
        # renders).  Pallas masks the ragged block's OOB writes; OOB *reads*
        # are garbage, so zero the tail explicitly -- every per-column value
        # here is causal (prefix sum / running max / edge detect look left
        # only) and the end-state reads column j_last, so zeroed tail
        # columns change nothing that survives.
        gate = gate_ref[...]
        if n % T_CH:
            j_i = jax.lax.broadcasted_iota(jnp.int32, gate.shape, 1)
            valid = (t * T_CH + j_i) < n
            gate = jnp.where(valid, gate, 0.0)
        above = (gate > 0.0).astype(jnp.int32)
        prev = jnp.concatenate([c_last[:, :1], above[:, :-1]], axis=1)
        trig = above * (1 - prev)

        if cv_none:
            # constant per-row rate: the prefix sum IS base * global_iota
            # (exact f32 iota up to 2^24 -- the f32 position breaks there
            # in every path anyway)
            rate = base
            iota_g = (jax.lax.broadcasted_iota(jnp.int32, gate.shape, 1)
                      + t * T_CH).astype(jnp.float32)
            cum_ex = base * iota_g
        else:
            cv = cv_ref[...]
            if n % T_CH:
                cv = jnp.where(valid, cv, 0.0)
            rate = base * jnp.exp2(cv)
            # inclusive prefix sum of rate (scan_kernel "sum" structure)
            cum = rate
            s = 1
            while s < T_CH:
                cum = cum + _shift(cum, s, 0.0)
                s <<= 1
            cum = cum + c_cum[:, :1]
            cum_ex = cum - rate

        # last-trigger fill of cum_ex = running MAX of cum_ex at triggers:
        # rates are non-negative so cum_ex is non-decreasing, and max is
        # exact/order-free, so this picks the identical value the
        # forward-fill did in 2 ops/pass instead of 5 (cum_ex >= 0, so
        # -1.0 is the "no trigger yet" identity)
        m = jnp.where(trig != 0, cum_ex, -1.0)
        s = 1
        while s < T_CH:
            m = jnp.maximum(m, _shift(m, s, -1.0))
            s <<= 1
        m = jnp.maximum(m, c_max[:, :1])
        htr = (m >= 0.0).astype(jnp.int32)

        pos = jnp.where(htr != 0, cum_ex - m,
                        jnp.where(play0 > 0.0, cum_ex + pos0, pos0))
        crossed = pos >= len_f
        idx = jnp.clip(pos.astype(jnp.int32), 0, k - 1)
        idx = jnp.where(crossed, 0, idx)

        # ---- in-register windowed gather (ops/sample_gather semantics,
        # same read values -> bit-identical output) ----
        #
        # Per column block, one of three predicated tiers runs (tile-wide
        # scalar conditions; the common tiers are 3-6x fewer vector ops
        # than the general window):
        #   stopped: idx == 0 everywhere (silent tail / not yet
        #     triggered) -> broadcast table[0];
        #   consecutive: idx == idx[:,0] + lane (rate exactly 1.0 steady
        #     state -- the wav_sr == sr, CV-unconnected case every drum
        #     kit hits, sample.rs:233-234 law) -> the read is a shifted
        #     window copy: one 2-chunk slab + 2 take_alongs (the span of
        #     128 consecutive indices crosses at most one chunk edge);
        #   general: the WA-slab + WB-head + residual-loop window
        #     (trigger-edge and non-unit-rate blocks).
        # Benchmarks replicate one patch across voices, so edges land in
        # the same block tile-wide and ~98% of playing blocks take the
        # consecutive tier at kit trigger densities.
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 1)
        # loop-invariant slim-tier condition, hoisted out of the per-block
        # loop (16 redundant reductions per grid step otherwise)
        slim = (jnp.max(base) <= 1.0) if cv_none else None

        def _per_block_tiers():
            for b in range(NBLK):
                ix = idx[:, b * LANES:(b + 1) * LANES]
                sl = slice(b * LANES, (b + 1) * LANES)
                first = ix[:, :1]
                hi = jnp.right_shift(ix, 7)
                lo = jnp.bitwise_and(ix, 127)
                zb = jnp.all(ix == 0)
                # zb implies not-consec (0 != 0 + lane for lane > 0), so
                # the three tiers are mutually exclusive and exhaustive
                consec = jnp.all(ix == first + lane_i)

                @pl.when(zb)
                def _(sl=sl):
                    out_ref[:, sl] = jnp.broadcast_to(
                        tbl_ref[:, 0, 0:1], (rb, LANES))

                @pl.when(consec)
                def _(first=first, hi=hi, lo=lo, sl=sl):
                    # 128 consecutive indices span chunks {h0, h0+1};
                    # per-row scalar chunk bases via the [rb, 1] VMEM
                    # scratch round-trip (probe_scalar_extract.py).
                    # ds(h0, 2) stays in bounds: h0 <= n_chunks-1 and the
                    # table is padded to n_chunks + WA chunks.
                    h0 = jnp.right_shift(first, 7)
                    b_scr[...] = h0
                    slab = jnp.stack(
                        [tbl_ref[r, pl.ds(b_scr[r, 0], 2), :]
                         for r in range(rb)])
                    g0 = jnp.take_along_axis(slab[:, 0, :], lo, axis=1)
                    g1 = jnp.take_along_axis(slab[:, 1, :], lo, axis=1)
                    out_ref[:, sl] = jnp.where(hi == h0, g0, g1)

                def general(wa, ix=ix, first=first, hi=hi, lo=lo, sl=sl):
                    # general window, anchored at the block's own first
                    # index: in-window rows take from the slab, trigger
                    # restarts / end resets land in the WB head chunks,
                    # anything else in the predicated residual loop
                    base_v = jnp.right_shift(first, 7)
                    b_scr[...] = base_v
                    slabs = jnp.stack(
                        [tbl_ref[r, pl.ds(b_scr[r, 0], wa), :]
                         for r in range(rb)])
                    acc = jnp.zeros((rb, LANES), jnp.float32)
                    for w in range(wa):
                        gth = jnp.take_along_axis(slabs[:, w, :], lo,
                                                  axis=1)
                        acc = jnp.where(hi == base_v + w, gth, acc)
                    # table-head window (trigger restarts / end reset)
                    for c in range(WB):
                        gth = jnp.take_along_axis(tbl_ref[:, c, :], lo,
                                                  axis=1)
                        acc = jnp.where(hi == c, gth, acc)
                    # residual chunk range: full-tile reduction of the
                    # uncovered indices
                    local = ix - (base_v << 7)
                    covered = jnp.logical_or(
                        jnp.logical_and(local >= 0, local < wa * LANES),
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

                gen_cond = jnp.logical_and(jnp.logical_not(zb),
                                           jnp.logical_not(consec))
                if cv_none:
                    # slim tier (scattered-trigger workloads): at rate
                    # <= 1 a block's non-reset indices ascend < 128 from
                    # `first` (2 chunks) and reset rows land in the WB
                    # head, so a 2-chunk slab replaces the WA-chunk one
                    # -- 4 take_alongs instead of WA+WB=7 per general
                    # block (rate is the per-row constant `base` here;
                    # with CV it varies per sample, no static bound)
                    @pl.when(jnp.logical_and(gen_cond, slim))
                    def _():
                        general(2)

                    @pl.when(jnp.logical_and(gen_cond,
                                             jnp.logical_not(slim)))
                    def _():
                        general(WA)
                else:
                    @pl.when(gen_cond)
                    def _():
                        general(WA)

        if small:
            # static whole-table match (sample_gather._make_small_kernel)
            # with the stopped tier predicating away the select chain
            for b in range(NBLK):
                ix = idx[:, b * LANES:(b + 1) * LANES]
                sl = slice(b * LANES, (b + 1) * LANES)
                zb = jnp.all(ix == 0)

                @pl.when(zb)
                def _(sl=sl):
                    out_ref[:, sl] = jnp.broadcast_to(
                        tbl_ref[:, 0, 0:1], (rb, LANES))

                @pl.when(jnp.logical_not(zb))
                def _(ix=ix, sl=sl):
                    hi = jnp.right_shift(ix, 7)
                    lo = jnp.bitwise_and(ix, 127)
                    acc = jnp.zeros((rb, LANES), jnp.float32)
                    for c in range(n_chunks):
                        gth = jnp.take_along_axis(tbl_ref[:, c, :], lo,
                                                  axis=1)
                        acc = jnp.where(hi == c, gth, acc)
                    out_ref[:, sl] = acc
        else:
            # whole-step consecutive fast path: at steady rate 1.0 (the
            # wav_sr == sr, CV-unconnected case every drum kit hits) with
            # no trigger/stop in the step, idx == first0 + iota across the
            # ENTIRE T_CH block, so all NBLK column blocks share ONE
            # (NBLK+1)-chunk slab, one scratch round-trip, and one lo
            # vector (128b doesn't touch the low 7 bits) -- vs NBLK
            # round-trips + NBLK per-row 2-chunk slab stacks in the
            # per-block tiers below.  Bounds: consec implies the step's
            # last index first0 + T_CH-1 <= k-1, so h0 + NBLK <= n_chunks
            # (equality exactly when first0 is 128-aligned, lo0 == 0: the
            # slab's top chunk is then the FIRST pad chunk -- read but
            # never selected, since cross is all-false at lo0 == 0).
            # ds(h0, NBLK+1) therefore needs the table padded to at least
            # n_chunks + 1 chunks; it is padded to n_chunks + WA (WA >= 1).
            iota_t = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1)
            first0 = idx[:, :1]
            consec_all = jnp.all(idx == first0 + iota_t)

            @pl.when(consec_all)
            def _():
                h0 = jnp.right_shift(first0, 7)
                b_scr[...] = h0
                slab = jnp.stack(
                    [tbl_ref[r, pl.ds(b_scr[r, 0], NBLK + 1), :]
                     for r in range(rb)])
                lo0 = jnp.bitwise_and(first0, 127)
                lo = jnp.bitwise_and(first0 + lane_i, 127)
                cross = lane_i >= (LANES - lo0)
                for b in range(NBLK):
                    g0 = jnp.take_along_axis(slab[:, b, :], lo, axis=1)
                    g1 = jnp.take_along_axis(slab[:, b + 1, :], lo, axis=1)
                    out_ref[:, b * LANES:(b + 1) * LANES] = jnp.where(
                        cross, g1, g0)

            @pl.when(jnp.logical_not(consec_all))
            def _():
                _per_block_tiers()

        # end-of-render state at the true last sample (n-1)
        @pl.when(t == t_last)
        def _():
            s_j = pos[:, j_last:j_last + 1]
            rate_j = rate if cv_none else rate[:, j_last:j_last + 1]
            cross_j = crossed[:, j_last:j_last + 1]
            htr_j = htr[:, j_last:j_last + 1] != 0
            active = jnp.logical_or(htr_j, play0 > 0.0)
            playing_end = jnp.logical_and(active,
                                          jnp.logical_not(cross_j))
            pos_end = jnp.where(playing_end, s_j + rate_j,
                                jnp.where(cross_j, 0.0, pos0))
            st_ref[:, 0:1] = pos_end
            st_ref[:, 1:2] = playing_end.astype(jnp.float32)
            st_ref[:, 2:3] = above[:, j_last:j_last + 1].astype(jnp.float32)

        # chunk carries
        if not cv_none:
            c_cum[...] = jnp.broadcast_to(cum[:, -1:], c_cum.shape)
        c_max[...] = jnp.broadcast_to(m[:, -1:], c_max.shape)
        c_last[...] = jnp.broadcast_to(above[:, -1:], c_last.shape)

    return kernel


@functools.partial(jax.jit, static_argnums=(8, 9))
def _fused_rows(gate, cv, table, base_rate, pos0, playing0, gate_last0,
                length, k, interpret):
    """[R, n] lanes + [R, K] tables + [R] per-row params -> ONE kernel
    dispatch producing (read [R, np_], pos_end [R], playing_end [R] bool,
    gate_last [R] bool).

    ``cv`` may be ``None`` (unconnected CV input): the kernel takes the
    constant-rate path (positions = base * iota, no prefix-sum passes, no
    cv lane streamed from HBM)."""
    r, n = gate.shape
    cv_none = cv is None
    rb = sample_gather._pick_rb(k) or 8
    rp = _ceil_to(max(r, 1), rb)
    np_ = _ceil_to(n, T_CH)
    n_chunks = _ceil_to(k, LANES) // LANES
    small = n_chunks <= sample_gather.SMALL_CHUNKS
    nc_eff = n_chunks if small else n_chunks + WA

    def padv(a, fill=0.0):
        return jnp.pad(a, ((0, rp - a.shape[0]),) + ((0, 0),) * (a.ndim - 1),
                       constant_values=fill)

    # column dim stays UNPADDED (ragged final block handled in-kernel):
    # whole-segment pads were fresh [V, n] HBM copies per Sample
    gate_p = padv(gate)
    cv_p = None if cv_none else padv(cv)
    par = padv(jnp.stack([
        base_rate.astype(jnp.float32),
        pos0.astype(jnp.float32),
        playing0.astype(jnp.float32),
        length.astype(jnp.float32),
        gate_last0.astype(jnp.float32),
    ], axis=1))
    tbl3d = jnp.pad(
        table, ((0, rp - r), (0, nc_eff * LANES - k))
    ).reshape(rp, nc_eff, LANES)

    lane = pl.BlockSpec((rb, T_CH), lambda rr, tt: (rr, tt),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _make_kernel(rb, n, k, cv_none),
        grid=(rp // rb, np_ // T_CH),
        in_specs=([lane] if cv_none else [lane, lane]) + [
            pl.BlockSpec((rb, 5), lambda rr, tt: (rr, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((rb, nc_eff, LANES), lambda rr, tt: (rr, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            lane,
            pl.BlockSpec((rb, LANES), lambda rr, tt: (rr, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rp, n), jnp.float32),
            jax.ShapeDtypeStruct((rp, LANES), jnp.float32),
        ],
        scratch_shapes=(
            ([] if cv_none else [pltpu.VMEM((rb, LANES), jnp.float32)])
            + [pltpu.VMEM((rb, LANES), jnp.float32),
               pltpu.VMEM((rb, LANES), jnp.int32)]
            + ([] if small else [pltpu.VMEM((rb, 1), jnp.int32)])),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*([gate_p] if cv_none else [gate_p, cv_p]), par, tbl3d)
    read, st = outs
    read = read[:r]
    pos_end = st[:r, 0]
    playing_end = st[:r, 1] > 0.0
    gate_last = st[:r, 2] > 0.0
    return read, pos_end, playing_end, gate_last


def eligible(table, gate, n: int) -> bool:
    """Fast-mode TPU path: long-enough render, gatherable table, f32
    lanes (exact precision's f64 lanes stay on the unfused path)."""
    return (table.ndim == 1 and gate.ndim == 1
            and n >= T_CH
            and table.shape[0] >= 2
            and table.dtype == jnp.float32
            and gate.dtype == jnp.float32
            and sample_gather._pick_rb(table.shape[0]) > 0
            and jax.default_backend() == "tpu")


def _play_impl(gate, cv, table, base_rate, pos0, playing0, gate_last0,
               length):
    interpret = jax.default_backend() != "tpu"
    _, n = gate.shape
    k = table.shape[-1]
    read, pos_end, playing_end, gate_last = _fused_rows(
        gate, cv, table, base_rate, pos0, playing0, gate_last0, length, k,
        interpret)
    out = jnp.where(length[:, None] > 0, read[:, :n], 0.0)
    return out, pos_end, playing_end, gate_last


def _make_rows_entry(with_cv: bool):
    @jax.custom_batching.custom_vmap
    def rows(*args):
        """[R, n] lanes + [R, K] tables + [R] params -> (audio [R, n],
        pos_end [R], playing_end [R] bool, gate_last [R] bool).  The
        position kernel feeds the windowed gather its precomputed window
        summaries.  Batch axes (vmap over voices) fold into rows."""
        if with_cv:
            gate, cv, *rest = args
        else:
            (gate, *rest), cv = args, None
        return _play_impl(gate, cv, *rest)

    @rows.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = [a if b else
                jnp.broadcast_to(jnp.asarray(a)[None],
                                 (axis_size,) + jnp.shape(a))
                for a, b in zip(args, in_batched)]
        flat = [a.reshape((-1,) + a.shape[2:]) for a in args]
        outs = rows(*flat)
        return (tuple(o.reshape((axis_size, -1) + o.shape[1:])
                      for o in outs), (True,) * len(outs))

    return rows


_play_rows_cv = _make_rows_entry(True)
_play_rows_const = _make_rows_entry(False)


def play_rows(gate, cv, table, base_rate, pos0, playing0, gate_last0,
              length):
    """Row-folded entry; ``cv=None`` takes the constant-rate kernel."""
    if cv is None:
        return _play_rows_const(gate, table, base_rate, pos0, playing0,
                                gate_last0, length)
    return _play_rows_cv(gate, cv, table, base_rate, pos0, playing0,
                         gate_last0, length)


def play_table(gate, cv, table, base_rate, pos0, playing0, gate_last0,
               length):
    """Logical single-voice entry: [n] gate/cv, [K] table, scalar params;
    ``cv=None`` = unconnected CV input (constant-rate fast path).  Under
    the block engine's vmap the custom rule folds voices to rows."""
    outs = play_rows(gate[None], None if cv is None else cv[None],
                     table[None],
                     jnp.asarray(base_rate)[None], jnp.asarray(pos0)[None],
                     jnp.asarray(playing0)[None],
                     jnp.asarray(gate_last0)[None],
                     jnp.asarray(length)[None])
    return tuple(o[0] for o in outs)
