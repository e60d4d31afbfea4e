"""Whole-Freeverb Pallas kernel: all 24 delay lines VMEM-resident.

The XLA block path (modules/freeverb.py _block) keeps each delay line in
HBM and rebuilds it once per chunk -- at farm scale the 24-line churn plus
the comb-damping scans dominate (measured ~180 ms for 1 s x 1024 voices
even with the Pallas scan primitives).  This kernel keeps every line in
VMEM across the whole render:

* grid = (voice_tiles, time_chunks); voices are rows, time is lanes;
* the delay lines live in the kernel's *output* refs (their block index is
  constant along the time axis, so Pallas keeps them resident in VMEM;
  chunk 0 copies the incoming state in);
* per chunk: the 16 comb reads are the oldest ``t_c`` samples of each
  line; the damping one-pole is a log-doubling affine scan in VMEM; lines
  roll by concat; the 8 series allpasses process the chunk in sub-pieces
  no longer than the shortest allpass line (series causality preserved --
  same two-level chunking as the XLA path);
* HBM traffic = the mixed input lane in + two output lanes out (plus one
  state copy at the edges): the speed-of-light for this recurrence.

Reference semantics: freeverb crate comb/allpass ticks
(src/synth/freeverb.rs wraps them; see modules/freeverb.py).  Fast
(f32) precision only -- exact mode stays on the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
VB = 32             # voices (rows) per kernel instance
ALLPASS_FEEDBACK = 0.5
# Damping-scan window: the comb one-pole coefficient is
# damp = dampening * 0.4 with the dampening slider spanning 0..=2
# (modules/freeverb.py freeverb_gains; freeverb crate scaledamp), so
# damp <= 0.8 and contributions older than 128 samples carry weight
# < 0.8^128 ~ 4e-13 -- far below f32 rounding of the running sum.
# Truncating the log-doubling at a 128-sample window saves
# log2(t_c/128) passes per comb per chunk (the kernel's dominant cost:
# 11 -> 7 passes at the 48 kHz t_c of 1152).  Chunk-boundary carry
# stays exact (the damp^(t+1) factor P covers all older history).
DAMP_WINDOW = 128
# The scan dominates the whole kernel (interleaved A/B, scripts/
# ab_fv_parts10.py: no-scan saves 11.7 of the 17.9 ms/s-audio device
# time), and most patches sit far below the damp=0.8 worst case (the
# default dampening 0.5 -> damp 0.2, whose window-16 truncation error is
# damp^16/(1-damp) ~ 8e-12).  The whole comb-update section therefore
# runs in ONE of several ``pl.when`` tiers chosen per voice tile: the
# narrowest window W in DAMP_TIERS with max(damp)^W/(1-max(damp)) <=
# DAMP_EPS (the truncation error a window-W scan leaves on unit-scale
# inputs), else the full DAMP_WINDOW tier.  The comb *output* taps don't
# depend on the scan (y is the oldest t_c samples, read before the
# writeback), so the tiers predicate only ref writes -- no cross-region
# value spills.  (Per-comb predicated tails with scratch spills measured
# +30% at damp=0.8, scripts/ab_fv_new.py; whole-section tiers replace
# them.)  Measured (scripts/ab_fv_new.py, 10 s x 1024 voices, v5e):
# 12.15 ms/s-audio device at damp 0.16 (window 8) / 13.21 at 0.2
# (window 16) / 18.43 at 0.8 (full; +3.6% over the old always-full scan's
# 17.7 -- the predicate's cost).  Worst-case all 7 passes run.
#
# DAMP_EPS = 1e-6: the truncated term feeds the comb's feedback loop
# (gain feed <= 0.84 -> amplification <= ~6x), so worst-case output error
# is ~6e-6 on full-scale audio -- 3x under the kernel's own parity
# tolerance (2e-5, tests/test_freeverb_kernel.py) and of the same order
# as the scan's inherent f32 reassociation noise.  Tier coverage at this
# eps: W=8 reaches damp <= ~0.17 (bench reverb preset: dampening 0.4 ->
# damp 0.16), W=16 reaches damp <= ~0.42 (default dampening 0.5 -> 0.2),
# everything else (damp <= 0.8 by construction) runs the full window,
# whose own truncation (0.8^128 ~ 4e-13) stays sub-f32-rounding.
DAMP_TIERS = (8, 16)
DAMP_EPS = 1e-6


def _shift(x, s, fill):
    rows, n = x.shape
    if s >= n:
        return jnp.full_like(x, fill)
    pad = jnp.full((rows, s), fill, x.dtype)
    return jnp.concatenate([pad, x[:, : n - s]], axis=1)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


# 2-slot ring combs (see _build): parity-verified in interpret mode
# (tests/test_freeverb_kernel.py ring cases) but the ring kernel CRASHES
# the on-platform Mosaic compiler (tpu_compile_helper exit 1) in both the
# ref-slice and value-slice formulations -- scripts/r5_mosaic_bisect.py
# isolates the construct.  Keep OFF until a formulation compiles on TPU.
RING_DEFAULT = False


@functools.lru_cache(maxsize=None)
def _build(comb_lens, ap_lens, n, t_c, interpret, fuse_mix=False,
           mono=False, skip_r=False, k_c=1, ring=None):
    """comb_lens: 16 lengths (cl0..7, cr0..7); ap_lens: 8 (al0..3, ar0..3);
    n: total samples (multiple of ``k_c * t_c``); t_c: chunk (multiple of
    128, <= min(comb_lens)); ``k_c``: causal sub-chunks processed per grid
    invocation.  The causality cap (every comb read must predate the
    chunk) limits t_c, NOT the grid step: the kernel's bare floor is
    per-invocation overhead (~6 ms/s-audio at k_c=1 vs a ~0.2 ms op-count
    bound, scripts/probe_fv_parts.py -- 54 block refs re-bound 1333
    times/s-audio), so each grid step runs ``k_c`` full chunk bodies over
    static lane slices, dividing that overhead by ``k_c``.  Returns
    ``run(mixed [V, n], fs [V, 16], damp [V], feed [V], *hists [V, len])
    -> (out_l, out_r, fs_final, *hists_final)``.

    ``fuse_mix``: stream the RAW input lane(s) instead of the premixed
    bus and fold the whole module's elementwise shell into the kernel --
    ``mixed = (l+r)*in_gain`` on the way in, the stereo wet/dry mix
    (``raw*wet1 + cross*wet2 + in*dry``) on the way out.  The unfused
    shell costs ~11 whole-render [V, n] HBM passes per segment outside
    the kernel (input mix 3, output mix 8 -- the reverb config's largest
    non-kernel cost); fused they ride the lanes already resident in VMEM.
    Signature becomes ``run(l, r?, fs, damp, feed, in_gain, wet1, wet2,
    dry, *hists) -> (final_l, final_r?, fs_final, *hists_final)`` (``r``
    omitted when ``mono``: both module inputs are the same wire -- the
    common send topology -- so one lane streams instead of two).

    ``skip_r`` (fuse_mix only): the module's Right output feeds nothing
    (block_outs_hint elision), so the kernel drops the final_r output --
    a whole [V, n] HBM store XLA cannot DCE out of a pallas_call.  All
    DSP still runs (the right comb/allpass chain feeds final_l via wet2,
    and its delay-line state must advance identically)."""
    n_comb = len(comb_lens)
    n_ap = len(ap_lens)
    half_c = n_comb // 2
    half_a = n_ap // 2
    assert t_c % LANES == 0 and t_c <= min(comb_lens)
    assert n % (k_c * t_c) == 0
    n_chunks = n // t_c
    # allpass sub-pieces: static spans no longer than the shortest line
    min_ap = min(ap_lens)
    spans = []
    s0 = 0
    while s0 < t_c:
        m = min(min_ap, t_c - s0)
        spans.append((s0, m))
        s0 += m

    n_in = 1 if (not fuse_mix or mono) else 2
    n_out_lanes = 1 if skip_r else 2
    assert not skip_r or fuse_mix  # raw out_r always feeds out_l's wet2

    all_lens = tuple(comb_lens) + tuple(ap_lens)
    n_lines = len(all_lens)
    # NOTE (round-5 negative result): packing all 24 delay lines into ONE
    # ref (flat [VB, sum_pad] or 3D [VB, n_lines, max_pad]) crashes the
    # on-platform Mosaic compiler (tpu_compile_helper exit 1;
    # scripts/r5_fv_pack1.py, r5_tpu_batch1.py) while interpret mode
    # passes parity, and the per-invocation-floor hypothesis it targeted
    # died anyway (k_c=1 == k_c=2 single-segment within noise).  The
    # experimental pack_lines code was removed; see git history.

    # -- 2-slot comb rings (round 5) ------------------------------------
    # The comb writeback used to ROLL the whole line per chunk
    # (read L + write L), the kernel's second-largest term (~4.3 of
    # 11.0 ms/s-audio device, scripts/r5_fv_parts2.py knockouts).  With
    # k_c == 2 and t_c < L < 2*t_c (true for every comb at standard
    # sample rates), the line lives in a [VB, 2*t_c] TWO-SLOT RING whose
    # slot phase is STATIC per sub-chunk: global chunk c = 2*t + kk, the
    # write slot is c % 2 == kk, and the tap (the oldest t_c samples,
    # c*t_c - L ..) spans slot kk from static offset o = 2*t_c - L plus
    # the head of slot 1-kk -- read-before-write, two static slices and
    # one aligned slot store instead of a full-line roll.  Entry packs
    # the canonical [V, L] history as pad-left zeros (never read);
    # exit unpacks the final [V, L] from the two slots.
    ring_eligible = (k_c == 2
                     and all(t_c < l < 2 * t_c for l in comb_lens))
    use_ring = ring_eligible and (RING_DEFAULT if ring is None else ring)
    ring_off = [2 * t_c - l for l in comb_lens]

    def kernel(*refs):
        in_refs = refs[:n_in]
        fs_in_ref, gp_ref = refs[n_in:n_in + 2]
        base = n_in + 2
        hin_refs = refs[base:base + n_lines]
        o = base + n_lines
        out_lane_refs = refs[o:o + n_out_lanes]
        fs_ref = refs[o + n_out_lanes]
        h_refs = refs[o + n_out_lanes + 1:-1]
        pow_scr = refs[-1]

        def h_read(j):
            return h_refs[j][...]

        def h_tap(j):
            return h_refs[j][:, :t_c]

        def h_write(j, val):
            h_refs[j][...] = val

        def comb_tap(j, kk):
            return h_tap(j)

        def comb_write(j, kk, w):
            h = h_read(j)
            # (empty [rows, 0] slices are invalid Mosaic vectors)
            h_write(j, w if t_c == h.shape[1] else
                    jnp.concatenate([h[:, t_c:], w], axis=1))

        t = pl.program_id(1)

        damp = gp_ref[:, 0:1]
        feed = gp_ref[:, 1:2]
        one_m = 1.0 - damp

        @pl.when(t == 0)
        def _():
            fs_ref[...] = fs_in_ref[...]
            for hr, hi in zip(h_refs, hin_refs):
                hr[...] = hi[...]
            # damp^(t+1) lane vector, shared by all 16 combs and constant
            # across chunks: one doubling per voice tile instead of one
            # general affine chain per comb per chunk
            P = jnp.broadcast_to(damp, (damp.shape[0], t_c))
            s = 1
            while s < t_c:
                P = P * _shift(P, s, 1.0)
                s <<= 1
            pow_scr[...] = P

        if fuse_mix:
            l_full = in_refs[0][...]
            r_full = l_full if mono else in_refs[1][...]
            # mix the whole block at once (same op structure as the
            # unfused kernel's precomputed lane: per-sub-chunk mixes gave
            # XLA a different fma-contraction context at k_c > 1 -- 1-ulp
            # comb-state divergence vs ``entry``)
            mixed_full = (l_full + r_full) * gp_ref[:, 2:3]
        else:
            mixed_full = in_refs[0][...]
        P = pow_scr[...]

        def process(window):
            """All ``k_c`` sub-chunks at the given damping-scan truncation
            window.  Per sub-chunk: comb taps (the oldest t_c samples of
            each line, read before the writeback), the damping scan
            (fs[t] = damp*fs[t-1] + (1-damp)*y[t]: per-voice constant
            coefficient, so the log-doubling carries only B -- one
            lane-shift per pass, the damp^s factor a [rows, 1] scalar
            squared each pass), line writeback, allpasses, output mix.
            The filter-state row is read/written ONCE per grid step
            (register-carried across sub-chunks): 32 per-comb sub-vreg
            column accesses measured ~1.8 ms/s-audio
            (probe_fv_parts.py no-fs-col)."""
            fs_all = fs_ref[...]
            fs_cols = [fs_all[:, j:j + 1] for j in range(n_comb)]

            def scan_w(y, j, mixed):
                B = y * one_m
                ds = damp
                s = 1
                while s < min(t_c, window):
                    B = B + ds * _shift(B, s, 0.0)
                    ds = ds * ds
                    s <<= 1
                fs_t = P * fs_cols[j] + B
                w = mixed + fs_t * feed
                fs_cols[j] = fs_t[:, -1:]
                return w

            def ap_out(kk, outs):
                sl = slice(kk * t_c, (kk + 1) * t_c)
                if fuse_mix:
                    l_lane = l_full[:, sl]
                    r_lane = l_lane if mono else r_full[:, sl]
                res = [None, None]
                for ch in range(2):
                    # allpass lines roll in REGISTERS across the span
                    # pieces and write back once per sub-chunk
                    hjs = [n_comb + ch * half_a + a
                           for a in range(half_a)]
                    h_vals = [h_read(hj) for hj in hjs]
                    pieces = []
                    for (p0, m) in spans:
                        x = outs[ch][:, p0:p0 + m]
                        for a in range(half_a):
                            h = h_vals[a]
                            delayed = h[:, :m]
                            w = x + delayed * ALLPASS_FEEDBACK
                            x = delayed - x
                            h_vals[a] = (w if m == h.shape[1] else
                                         jnp.concatenate([h[:, m:], w],
                                                         axis=1))
                        pieces.append(x)
                    for hj, h in zip(hjs, h_vals):
                        h_write(hj, h)
                    res[ch] = (pieces[0] if len(pieces) == 1 else
                               jnp.concatenate(pieces, axis=1))
                if fuse_mix:
                    # module output shell (modules/freeverb.py _block
                    # final mix), same expression order -> parity within
                    # fma rounding
                    wet1 = gp_ref[:, 3:4]
                    wet2 = gp_ref[:, 4:5]
                    dry = gp_ref[:, 5:6]
                    out_lane_refs[0][:, sl] = (res[0] * wet1
                                               + res[1] * wet2
                                               + l_lane * dry)
                    if not skip_r:
                        out_lane_refs[1][:, sl] = (res[1] * wet1
                                                   + res[0] * wet2
                                                   + r_lane * dry)
                else:
                    out_lane_refs[0][:, sl] = res[0]
                    out_lane_refs[1][:, sl] = res[1]

            if use_ring:
                # comb-major, tap-preassembled layout: slot0 holds the
                # NEXT chunk's tap y(2t) pre-assembled at the previous
                # writeback, slot1 the previous chunk's written samples
                # w(2t-1).  Every ref access is a full aligned [VB, 2*t_c]
                # read/write; the o_-offset recombination happens on
                # register VALUES only (w0/w_prev), the construct class
                # the allpass section already uses.  Summation order of
                # the taps into outs matches the roll path's sum()
                # (ascending j), keeping f32 parity.
                mixeds = [mixed_full[:, kk * t_c:(kk + 1) * t_c]
                          for kk in range(2)]
                outs_kk = [[None, None], [None, None]]
                for j in range(n_comb):
                    o_ = ring_off[j]
                    ring_v = h_refs[j][...]
                    tap0 = ring_v[:, :t_c]
                    w_prev = ring_v[:, t_c:]
                    w0 = scan_w(tap0, j, mixeds[0])
                    tap1 = jnp.concatenate(
                        [w_prev[:, o_:], w0[:, :o_]], axis=1)
                    w1 = scan_w(tap1, j, mixeds[1])
                    # slot0 <- y(2t+2) = [w0 tail | w1 head]; slot1 <- w1
                    h_refs[j][...] = jnp.concatenate(
                        [w0[:, o_:], w1[:, :o_], w1], axis=1)
                    ch = j // half_c
                    for kk, tap in ((0, tap0), (1, tap1)):
                        cur = outs_kk[kk][ch]
                        outs_kk[kk][ch] = (tap if cur is None
                                           else cur + tap)
                for kk in range(2):
                    ap_out(kk, outs_kk[kk])
                fs_ref[...] = jnp.concatenate(
                    fs_cols + [fs_all[:, n_comb:]], axis=1)
                return

            for kk in range(k_c):
                mixed = mixed_full[:, kk * t_c:(kk + 1) * t_c]
                ys = [comb_tap(j, kk) for j in range(n_comb)]
                for j in range(n_comb):
                    w = scan_w(ys[j], j, mixed)
                    comb_write(j, kk, w)
                ap_out(kk, [sum(ys[:half_c]), sum(ys[half_c:])])
            fs_ref[...] = jnp.concatenate(fs_cols + [fs_all[:, n_comb:]],
                                          axis=1)

        full_w = min(t_c, DAMP_WINDOW)
        tiers = [w for w in DAMP_TIERS if w < full_w]
        if not tiers:
            process(full_w)
        else:
            dmax = jnp.max(gp_ref[:, 0])
            lim = DAMP_EPS * (1.0 - dmax)
            # need[k]: window tiers[k] is NOT sufficient (truncation error
            # above DAMP_EPS); tier k runs iff the previous window was
            # insufficient and this one is -- exactly one region executes
            need = [dmax ** w > lim for w in tiers]
            for k, w in enumerate(tiers):
                ok = jnp.logical_not(need[k])
                cond = ok if k == 0 else jnp.logical_and(need[k - 1], ok)

                @pl.when(cond)
                def _(w=w):
                    process(w)

            @pl.when(need[-1])
            def _():
                process(full_w)

    def lane_spec():
        return pl.BlockSpec((VB, k_c * t_c), lambda vt, tt: (vt, tt),
                            memory_space=pltpu.VMEM)

    def state_spec(width):
        return pl.BlockSpec((VB, width), lambda vt, tt: (vt, 0),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def run(*args):
        lanes, rest = args[:n_in], args[n_in:]
        if fuse_mix:
            fs, damp, feed, in_gain, wet1, wet2, dry = rest[:7]
            hists = rest[7:]
            gains = [damp, feed, in_gain, wet1, wet2, dry]
        else:
            fs, damp, feed = rest[:3]
            hists = rest[3:]
            gains = [damp, feed]
        v = lanes[0].shape[0]
        vp = _ceil_to(max(v, 1), VB)

        def padv(a):
            return (a if a.shape[0] == vp else
                    jnp.pad(a, ((0, vp - a.shape[0]),) + ((0, 0),) *
                            (a.ndim - 1)))

        lanes_p = [padv(x) for x in lanes]
        fs_p = padv(jnp.pad(fs, ((0, 0), (0, LANES - n_comb))))
        gp = padv(jnp.stack(gains + [jnp.zeros_like(damp)] *
                            (LANES - len(gains)), axis=1))
        hists_p = [padv(h) for h in hists]

        if use_ring:
            # canonical [V, L] comb history -> tap-preassembled ring:
            # slot0 = the first chunk's tap (the oldest t_c samples),
            # slot1 = the newest t_c samples (the "previous w")
            hist_args = ([jnp.concatenate([h[:, :t_c], h[:, l - t_c:]],
                                          axis=1)
                          for h, l in zip(hists_p[:n_comb], comb_lens)]
                         + hists_p[n_comb:])
            widths = [2 * t_c] * n_comb + list(ap_lens)
            hist_in_specs = [state_spec(w_) for w_ in widths]
            hist_out_specs = [state_spec(w_) for w_ in widths]
            hist_out_shape = [jax.ShapeDtypeStruct((vp, w_), jnp.float32)
                              for w_ in widths]
        else:
            hist_args = hists_p
            hist_in_specs = [state_spec(l) for l in all_lens]
            hist_out_specs = [state_spec(l) for l in all_lens]
            hist_out_shape = [jax.ShapeDtypeStruct((vp, l), jnp.float32)
                              for l in all_lens]

        in_specs = ([lane_spec()] * n_in
                    + [state_spec(LANES), state_spec(LANES)]
                    + hist_in_specs)
        out_specs = ([lane_spec()] * n_out_lanes + [state_spec(LANES)]
                     + hist_out_specs)
        out_shape = (
            [jax.ShapeDtypeStruct((vp, n), jnp.float32)] * n_out_lanes
            + [jax.ShapeDtypeStruct((vp, LANES), jnp.float32)]
            + hist_out_shape)

        outs = pl.pallas_call(
            kernel,
            grid=(vp // VB, n_chunks // k_c),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((VB, t_c), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                # the kernel sits at ~16 MB of blocks + body stack -- the
                # DEFAULT scoped-vmem limit (16 MB) made identical
                # programs flap between compiling and "tpu_compile_helper
                # exit 1" (scoped allocation 16.27M > 16.00M) depending
                # on the schedule; v5e has far more physical VMEM, so
                # raise the scoped limit well clear of the cliff
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(*lanes_p, fs_p, gp, *hist_args)

        lanes_f = tuple(o[:v] for o in outs[:n_out_lanes])
        fs_f = outs[n_out_lanes][:v, :n_comb]
        if use_ring:
            # final canonical [V, L]: slot0 already holds the oldest t_c
            # samples (the next tap, = h'[:t_c]) and slot1 the newest t_c
            # (= h'[L-t_c:]); the overlap of size o_ drops from slot1
            combs_f = tuple(
                jnp.concatenate([h[:v, :t_c], h[:v, t_c + o_:]], axis=1)
                for h, o_ in zip(outs[n_out_lanes + 1:
                                      n_out_lanes + 1 + n_comb],
                                 ring_off))
            hists_f = combs_f + tuple(
                h[:v] for h in outs[n_out_lanes + 1 + n_comb:])
        else:
            hists_f = tuple(h[:v] for h in outs[n_out_lanes + 1:])
        return lanes_f + (fs_f,) + hists_f

    return run


def pick_k_c(n_chunks: int, t_c: int, n_lanes: int) -> int:
    """Sub-chunks per grid invocation: the largest divisor of ``n_chunks``
    whose lane blocks (``n_lanes`` of [VB, k_c*t_c] f32, double-buffered by
    the Mosaic pipeline) fit a ~4 MB VMEM budget alongside the ~7 MB of
    resident delay-line state, capped at 8 to bound Mosaic compile time
    (the tiered kernel body is cloned 3 * k_c times)."""
    budget = 4 * 2 ** 20
    kmax = max(1, budget // (n_lanes * VB * t_c * 4 * 2))
    k = 1
    for cand in range(2, min(kmax, 8) + 1):
        if n_chunks % cand == 0:
            k = cand
    return k


def _make_entry(comb_lens, ap_lens, n, t_c, fuse_mix=False, mono=False,
                skip_r=False, k_c=1):
    """custom_vmap entry: logical single-voice signature (the block engine
    vmaps modules over voices); the rule passes the batch straight through
    as kernel rows."""

    def _run():
        return _build(comb_lens, ap_lens, n, t_c,
                      jax.default_backend() != "tpu", fuse_mix, mono,
                      skip_r, k_c)

    @jax.custom_batching.custom_vmap
    def f(*args):
        outs = _run()(*[jnp.asarray(a)[None] for a in args])
        return tuple(o[0] for o in outs)

    @f.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = [a if b else
                jnp.broadcast_to(jnp.asarray(a)[None],
                                 (axis_size,) + jnp.shape(a))
                for a, b in zip(args, in_batched)]
        outs = _run()(*args)
        return tuple(outs), (True,) * len(outs)

    return f


def _ring_ok(comb_lens, n, t_c) -> bool:
    """2-slot ring geometry: every comb strictly between t_c and 2*t_c
    (true at standard sample rates where t_c = floor(min/128)*128) and an
    even chunk count so k_c=2 keeps slot phases static."""
    return (all(t_c < l < 2 * t_c for l in comb_lens)
            and (n // t_c) % 2 == 0)


@functools.lru_cache(maxsize=None)
def entry(comb_lens, ap_lens, n, t_c):
    # k_c=1: grid-invocation count is not the kernel's binding cost
    # (k_c=1 == k_c=2 single-segment within noise, r5_fv_pack1.py) and
    # the kernel sits on the 16 MB scoped-VMEM cliff -- the round-5
    # "mystery" tpu_compile_helper 500s decoded as scoped-vmem stack
    # OOMs (16.27M > 16M for the k_c=2 roll kernel in some schedules);
    # k_c>1 multiplies the double-buffered lane blocks for nothing.
    # The ring's k_c=2 geometry is forced only if the ring can run.
    k_c = 2 if (RING_DEFAULT and _ring_ok(comb_lens, n, t_c)) else 1
    return _make_entry(comb_lens, ap_lens, n, t_c, k_c=k_c)


@functools.lru_cache(maxsize=None)
def entry_mix(comb_lens, ap_lens, n, t_c, mono, skip_r=False):
    """Fused-shell entry (see ``_build`` fuse_mix): single-voice signature
    ``f(l, r?, fs [16], damp, feed, in_gain, wet1, wet2, dry, *hists) ->
    (final_l, final_r?, fs_final, *hists_final)``; ``r`` omitted when
    ``mono``, ``final_r`` omitted when ``skip_r`` (dead Right output)."""
    # k_c=1 for VMEM headroom (see entry); ring geometry only if enabled
    k_c = 2 if (RING_DEFAULT and _ring_ok(comb_lens, n, t_c)) else 1
    return _make_entry(comb_lens, ap_lens, n, t_c, fuse_mix=True, mono=mono,
                       skip_r=skip_r, k_c=k_c)
