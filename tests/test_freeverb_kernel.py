"""Whole-Freeverb Pallas kernel vs a literal per-sample NumPy reference.

The kernel (ops/freeverb_kernel.py) only engages on TPU; here it runs in
interpret mode and must reproduce the exact comb/allpass tick semantics
(freeverb crate, see modules/freeverb.py) including carried damping state,
line roll-over across chunks, and the series allpass sub-piece order.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from srack_tpu.ops import freeverb_kernel as fvk

COMB_LENS = (202, 215, 231, 246, 258, 270, 282, 293,
             206, 219, 235, 250, 262, 274, 286, 297)
AP_LENS = (100, 80, 61, 40, 104, 84, 65, 44)


def _reference(mixed, fs0, damp, feed, hists):
    """Per-sample Freeverb core in float32 NumPy (8 combs + 4 allpasses per
    channel; chronological shift-register lines, hist[0] = next read)."""
    n = mixed.shape[0]
    h = [np.array(x, np.float32) for x in hists]
    fs = np.array(fs0, np.float32)
    out_l = np.zeros(n, np.float32)
    out_r = np.zeros(n, np.float32)
    for t in range(n):
        outs = [np.float32(0.0), np.float32(0.0)]
        for j in range(16):
            y = h[j][0]
            fs[j] = np.float32(y * np.float32(1.0 - damp)
                               + fs[j] * np.float32(damp))
            w = np.float32(mixed[t] + fs[j] * np.float32(feed))
            h[j] = np.append(h[j][1:], w).astype(np.float32)
            outs[j // 8] = np.float32(outs[j // 8] + y)
        for ch in range(2):
            x = outs[ch]
            for a in range(4):
                hj = 16 + ch * 4 + a
                delayed = h[hj][0]
                w = np.float32(x + delayed * np.float32(0.5))
                x = np.float32(delayed - x)
                h[hj] = np.append(h[hj][1:], w).astype(np.float32)
            outs[ch] = x
        out_l[t], out_r[t] = outs
    return out_l, out_r, fs, h


@pytest.mark.slow
def test_kernel_matches_per_sample_reference():
    rng = np.random.default_rng(0)
    n, t_c = 256, 128
    mixed = rng.normal(size=n).astype(np.float32) * 0.1
    fs0 = rng.normal(size=16).astype(np.float32) * 0.1
    damp, feed = np.float32(0.35), np.float32(0.84)
    hists = [rng.normal(size=l).astype(np.float32) * 0.1
             for l in COMB_LENS + AP_LENS]

    fn = fvk.entry(COMB_LENS, AP_LENS, n, t_c)
    outs = fn(jnp.asarray(mixed), jnp.asarray(fs0),
              jnp.asarray(damp), jnp.asarray(feed),
              *[jnp.asarray(h) for h in hists])
    got_l, got_r, got_fs = (np.asarray(outs[0]), np.asarray(outs[1]),
                            np.asarray(outs[2]))
    got_h = [np.asarray(h) for h in outs[3:]]

    want_l, want_r, want_fs, want_h = _reference(mixed, fs0, damp, feed,
                                                 hists)
    # the in-kernel damping scan reassociates the one-pole; tolerances are
    # float-rounding scale
    np.testing.assert_allclose(got_l, want_l, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(got_r, want_r, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(got_fs, want_fs, atol=2e-5, rtol=2e-5)
    for g, w in zip(got_h, want_h):
        np.testing.assert_allclose(g, w, atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_multi_grid_step_kc_state_carry():
    """k_c sub-chunks spanning MULTIPLE grid steps: n=1280, t_c=128 makes
    pick_k_c choose k_c=5 (largest divisor of 10 <= 8) over 2 grid steps,
    so the fs/hist/pow_scr residency BETWEEN k_c-grouped invocations is
    exercised (every other fixture absorbs all chunks into one grid step;
    advisor round-4 finding)."""
    n, t_c = 1280, 128
    assert fvk.pick_k_c(n // t_c, t_c, 3) == 5  # 2 grid steps
    rng = np.random.default_rng(6)
    mixed = rng.normal(size=n).astype(np.float32) * 0.1
    fs0 = rng.normal(size=16).astype(np.float32) * 0.1
    damp, feed = np.float32(0.35), np.float32(0.84)
    hists = [rng.normal(size=l).astype(np.float32) * 0.1
             for l in COMB_LENS + AP_LENS]

    fn = fvk.entry(COMB_LENS, AP_LENS, n, t_c)
    outs = fn(jnp.asarray(mixed), jnp.asarray(fs0),
              jnp.asarray(damp), jnp.asarray(feed),
              *[jnp.asarray(h) for h in hists])
    want_l, want_r, want_fs, want_h = _reference(mixed, fs0, damp, feed,
                                                 hists)
    np.testing.assert_allclose(np.asarray(outs[0]), want_l,
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(outs[1]), want_r,
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(outs[2]), want_fs,
                               atol=2e-5, rtol=2e-5)
    for g, w in zip([np.asarray(h) for h in outs[3:]], want_h):
        np.testing.assert_allclose(g, w, atol=2e-5, rtol=2e-5)


def test_truncated_damping_window(monkeypatch):
    """The damping scan truncates at DAMP_WINDOW taps (damp <= 0.8 makes
    older contributions sub-f32-rounding).  The default window (128) only
    engages at t_c > 128; shrink it to 32 here so the truncated code path
    runs at the cheap interpret-mode shape.  damp=0.6 forces the FULL
    tier (0.6^16 ~ 2.8e-4 > DAMP_EPS, so no adaptive tier engages) while
    its window-32 truncation (0.6^32 ~ 8e-8) stays below the float
    tolerance."""
    monkeypatch.setattr(fvk, "DAMP_WINDOW", 32)
    fvk._build.cache_clear()

    rng = np.random.default_rng(2)
    n, t_c = 256, 128
    mixed = rng.normal(size=n).astype(np.float32) * 0.1
    fs0 = rng.normal(size=16).astype(np.float32) * 0.1
    damp, feed = np.float32(0.6), np.float32(0.84)
    hists = [rng.normal(size=l).astype(np.float32) * 0.1
             for l in COMB_LENS + AP_LENS]

    fn = fvk._make_entry(COMB_LENS, AP_LENS, n, t_c)
    outs = fn(jnp.asarray(mixed), jnp.asarray(fs0),
              jnp.asarray(damp), jnp.asarray(feed),
              *[jnp.asarray(h) for h in hists])
    want_l, want_r, want_fs, want_h = _reference(mixed, fs0, damp, feed,
                                                 hists)
    np.testing.assert_allclose(np.asarray(outs[0]), want_l,
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(outs[1]), want_r,
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(outs[2]), want_fs,
                               atol=2e-5, rtol=2e-5)
    fvk._build.cache_clear()


@pytest.mark.parametrize("damp_v", [0.15, 0.35, 0.6])
def test_damping_tiers(damp_v):
    """Each damping-scan tier (ops/freeverb_kernel.py DAMP_TIERS) against
    the per-sample reference: damp=0.15 takes the window-8 tier
    (0.15^8 ~ 2.6e-7 <= DAMP_EPS*(1-damp)), 0.35 the window-16 tier
    (0.35^8 ~ 2.2e-4 insufficient, 0.35^16 ~ 5e-8 sufficient), 0.6 the
    full window.  Tier truncation errors (amplified <= ~6x by the comb
    feedback) all sit below the float32 parity tolerance by design
    (DAMP_EPS rationale in the kernel header)."""
    rng = np.random.default_rng(3)
    n, t_c = 256, 128
    mixed = rng.normal(size=n).astype(np.float32) * 0.1
    fs0 = rng.normal(size=16).astype(np.float32) * 0.1
    damp, feed = np.float32(damp_v), np.float32(0.84)
    hists = [rng.normal(size=l).astype(np.float32) * 0.1
             for l in COMB_LENS + AP_LENS]

    fn = fvk.entry(COMB_LENS, AP_LENS, n, t_c)
    outs = fn(jnp.asarray(mixed), jnp.asarray(fs0),
              jnp.asarray(damp), jnp.asarray(feed),
              *[jnp.asarray(h) for h in hists])
    want_l, want_r, want_fs, want_h = _reference(mixed, fs0, damp, feed,
                                                 hists)
    np.testing.assert_allclose(np.asarray(outs[0]), want_l,
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(outs[1]), want_r,
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(outs[2]), want_fs,
                               atol=2e-5, rtol=2e-5)
    for g, w in zip([np.asarray(h) for h in outs[3:]], want_h):
        np.testing.assert_allclose(g, w, atol=2e-5, rtol=2e-5)


def test_kernel_batched_rows():
    import jax

    rng = np.random.default_rng(1)
    n, t_c, v = 128, 128, 3
    mixed = rng.normal(size=(v, n)).astype(np.float32) * 0.1
    fs0 = np.zeros((v, 16), np.float32)
    damp = np.full((v,), 0.4, np.float32)
    feed = np.full((v,), 0.8, np.float32)
    hists = [rng.normal(size=(v, l)).astype(np.float32) * 0.1
             for l in COMB_LENS + AP_LENS]

    fn = fvk.entry(COMB_LENS, AP_LENS, n, t_c)
    outs = jax.vmap(fn)(jnp.asarray(mixed), jnp.asarray(fs0),
                        jnp.asarray(damp), jnp.asarray(feed),
                        *[jnp.asarray(h) for h in hists])
    for i in range(v):
        want = _reference(mixed[i], fs0[i], damp[i], feed[i],
                          [h[i] for h in hists])
        np.testing.assert_allclose(np.asarray(outs[0][i]), want[0],
                                   atol=2e-5, rtol=2e-5)


def test_entry_mix_matches_shell():
    """entry_mix (fused input-gain + wet/dry shell, _build fuse_mix) must
    match entry + the module's outside mix (modules/freeverb.py _block
    final mix) on the same lanes, in both stereo and mono-wire forms."""
    rng = np.random.default_rng(4)
    n, t_c = 256, 128
    l = (rng.normal(size=n) * 0.1).astype(np.float32)
    r = (rng.normal(size=n) * 0.1).astype(np.float32)
    fs0 = (rng.normal(size=16) * 0.1).astype(np.float32)
    damp, feed = np.float32(0.35), np.float32(0.84)
    in_g, wet1, wet2, dry = (np.float32(0.015), np.float32(0.09),
                             np.float32(0.03), np.float32(0.3))
    hists = [(rng.normal(size=ln) * 0.1).astype(np.float32)
             for ln in COMB_LENS + AP_LENS]
    args = [jnp.asarray(a) for a in hists]

    base = fvk.entry(COMB_LENS, AP_LENS, n, t_c)(
        jnp.asarray((l + r) * in_g), jnp.asarray(fs0),
        jnp.asarray(damp), jnp.asarray(feed), *args)
    want_l = np.asarray(base[0]) * wet1 + np.asarray(base[1]) * wet2 + l * dry
    want_r = np.asarray(base[1]) * wet1 + np.asarray(base[0]) * wet2 + r * dry

    got = fvk.entry_mix(COMB_LENS, AP_LENS, n, t_c, False)(
        jnp.asarray(l), jnp.asarray(r), jnp.asarray(fs0),
        jnp.asarray(damp), jnp.asarray(feed), jnp.asarray(in_g),
        jnp.asarray(wet1), jnp.asarray(wet2), jnp.asarray(dry), *args)
    np.testing.assert_allclose(np.asarray(got[0]), want_l, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got[1]), want_r, atol=1e-6)
    # carried state identical to the unfused kernel's
    for g, w in zip(got[2:], base[2:]):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    # mono form: one lane streams, both channels see the same dry input
    base_m = fvk.entry(COMB_LENS, AP_LENS, n, t_c)(
        jnp.asarray((l + l) * in_g), jnp.asarray(fs0),
        jnp.asarray(damp), jnp.asarray(feed), *args)
    got_m = fvk.entry_mix(COMB_LENS, AP_LENS, n, t_c, True)(
        jnp.asarray(l), jnp.asarray(fs0),
        jnp.asarray(damp), jnp.asarray(feed), jnp.asarray(in_g),
        jnp.asarray(wet1), jnp.asarray(wet2), jnp.asarray(dry), *args)
    want_ml = (np.asarray(base_m[0]) * wet1 + np.asarray(base_m[1]) * wet2
               + l * dry)
    np.testing.assert_allclose(np.asarray(got_m[0]), want_ml, atol=1e-6)


@pytest.mark.slow
def test_entry_mix_skip_r():
    """skip_r (dead Right output, block_outs_hint elision) must leave
    final_l and ALL carried state identical to the full fused kernel --
    the right comb/allpass chain still runs (it feeds final_l via wet2)."""
    rng = np.random.default_rng(5)
    n, t_c = 256, 128
    l = (rng.normal(size=n) * 0.1).astype(np.float32)
    fs0 = (rng.normal(size=16) * 0.1).astype(np.float32)
    hists = [(rng.normal(size=ln) * 0.1).astype(np.float32)
             for ln in COMB_LENS + AP_LENS]
    args = ([jnp.asarray(l), jnp.asarray(fs0)]
            + [jnp.asarray(np.float32(x))
               for x in (0.35, 0.84, 0.015, 0.09, 0.03, 0.3)]
            + [jnp.asarray(h) for h in hists])
    full = fvk.entry_mix(COMB_LENS, AP_LENS, n, t_c, True, False)(*args)
    skip = fvk.entry_mix(COMB_LENS, AP_LENS, n, t_c, True, True)(*args)
    assert len(skip) == len(full) - 1
    np.testing.assert_array_equal(np.asarray(skip[0]), np.asarray(full[0]))
    for g, w in zip(skip[1:], full[2:]):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


RING_COMB_LENS = (202, 215, 231, 246, 251, 203, 219, 235,
                  206, 148, 250, 255, 129, 180, 177, 190)


def test_ring_combs_match_reference_and_chain():
    """2-slot ring comb geometry (t_c < L < 2*t_c forces use_ring with
    k_c=2): parity vs the per-sample reference AND state continuity --
    one n=1024 render must bit-match two chained n=512 renders (the
    chain exercises the ring pack/unpack at both parities of
    n_chunks)."""
    t_c = 128
    assert fvk._ring_ok(RING_COMB_LENS, 1024, t_c)
    rng = np.random.default_rng(11)
    mixed = rng.normal(size=1024).astype(np.float32) * 0.1
    fs0 = rng.normal(size=16).astype(np.float32) * 0.1
    damp, feed = np.float32(0.35), np.float32(0.84)
    hists = [rng.normal(size=l).astype(np.float32) * 0.1
             for l in RING_COMB_LENS + AP_LENS]

    want_l, want_r, want_fs, want_h = _reference(
        mixed, fs0, damp, feed, hists)

    run = fvk._build(RING_COMB_LENS, AP_LENS, 1024, t_c, True,
                     k_c=2, ring=True)
    outs = [o[0] for o in run(
        jnp.asarray(mixed)[None], jnp.asarray(fs0)[None],
        jnp.asarray(damp)[None], jnp.asarray(feed)[None],
        *[jnp.asarray(h)[None] for h in hists])]
    np.testing.assert_allclose(np.asarray(outs[0]), want_l,
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(outs[1]), want_r,
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(outs[2]), want_fs,
                               atol=2e-5, rtol=2e-5)
    for g, w in zip(outs[3:], want_h):
        np.testing.assert_allclose(np.asarray(g), w, atol=2e-5, rtol=2e-5)

    # chained halves: bit-identical to the single render (same chunking)
    run2 = fvk._build(RING_COMB_LENS, AP_LENS, 512, t_c, True,
                      k_c=2, ring=True)
    o1 = [o[0] for o in run2(
        jnp.asarray(mixed[:512])[None], jnp.asarray(fs0)[None],
        jnp.asarray(damp)[None], jnp.asarray(feed)[None],
        *[jnp.asarray(h)[None] for h in hists])]
    o2 = [o[0] for o in run2(
        jnp.asarray(mixed[512:])[None], jnp.asarray(o1[2])[None],
        jnp.asarray(damp)[None], jnp.asarray(feed)[None],
        *[jnp.asarray(h)[None] for h in o1[3:]])]
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(o1[0]), np.asarray(o2[0])]),
        np.asarray(outs[0]))
    for g, w in zip(o2[3:], outs[3:]):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_ring_combs_entry_mix():
    """Ring geometry through the fused-shell entry (the bench path)."""
    t_c, n = 128, 512
    rng = np.random.default_rng(12)
    l_in = rng.normal(size=n).astype(np.float32) * 0.1
    fs0 = rng.normal(size=16).astype(np.float32) * 0.1
    damp, feed = np.float32(0.2), np.float32(0.84)
    in_gain, wet1, wet2, dry = (np.float32(0.015), np.float32(0.12),
                                np.float32(0.06), np.float32(0.3))
    hists = [rng.normal(size=l).astype(np.float32) * 0.1
             for l in RING_COMB_LENS + AP_LENS]

    mixed = ((l_in + l_in) * in_gain).astype(np.float32)
    want_l, want_r, want_fs, want_h = _reference(
        mixed, fs0, damp, feed, hists)
    want_final_l = want_l * wet1 + want_r * wet2 + l_in * dry

    run = fvk._build(RING_COMB_LENS, AP_LENS, n, t_c, True,
                     fuse_mix=True, mono=True, k_c=2, ring=True)
    outs = [o[0] for o in run(
        jnp.asarray(l_in)[None], jnp.asarray(fs0)[None],
        jnp.asarray(damp)[None], jnp.asarray(feed)[None],
        jnp.asarray(in_gain)[None], jnp.asarray(wet1)[None],
        jnp.asarray(wet2)[None], jnp.asarray(dry)[None],
        *[jnp.asarray(h)[None] for h in hists])]
    np.testing.assert_allclose(np.asarray(outs[0]), want_final_l,
                               atol=2e-5, rtol=2e-5)
    for g, w in zip(outs[3:], want_h):
        np.testing.assert_allclose(np.asarray(g), w, atol=2e-5, rtol=2e-5)
