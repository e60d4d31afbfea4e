"""Device-side segmented rendering (render(..., segment=)).

One dispatch, ``lax.scan`` over segments with carried module state: the
long-render path for lengths whose whole-render lanes OOM HBM (the block
engine's [V, n] wires at 30 s x 1024 voices).  Semantics must equal
engine.render_long exactly -- deterministic state carry, per-segment noise
re-key -- reference analogue: module fields persist across calc ticks, so a
long render is indistinguishable from chained short ones
(/root/reference/src/synth/oscillator.rs:151-152).
"""

import numpy as np
import pytest

import srack_tpu as st
from srack_tpu.engine import render_long, replicate_params

CFG = st.AudioConfig(sample_rate=48000, block_size=64, channels=1,
                     precision="fast")


def _voice():
    q = st.Patch(CFG)
    osc = q.add("Oscillator", val=-1.0)
    flt = q.add("Moog Filter", freq=0.4, res=0.5)
    q.connect(osc, "Sawtooth", flt, "Audio")
    q.connect(flt, 0, q.output, 0)
    return q


def test_segmented_scan_matches_single():
    q = _voice()
    full, _, _ = st.render(q, 512, engine="scan")
    seg, _, sf = st.render(q, 512, engine="scan", segment=128)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(seg))


def test_segmented_block_batched_matches_single():
    q = _voice()
    params = replicate_params(q.params(), 4)
    full, _, _ = st.render_batch(q, 512, params=params, engine="block")
    seg, _, _ = st.render_batch(q, 512, params=params, engine="block",
                                segment=128)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(seg))


def test_segmented_bit_matches_render_long_with_noise():
    # noise lanes re-key per segment (fold_in(key, seg_idx)) -- exactly
    # render_long's rule, so the two segmented paths must agree bit-for-bit
    from srack_tpu.presets import drum_machine
    p = drum_machine(CFG)
    params = replicate_params(p.params(), 4)
    seg, _, _ = st.render_batch(p, 512, params=params, engine="block",
                                segment=128)
    rl, _ = render_long(p, 512, segment=128, params=params, batched=True,
                        engine="block")
    np.testing.assert_array_equal(np.asarray(seg), rl)


def test_segmented_final_state_continues():
    # state after a segmented render continues a follow-on render exactly
    q = _voice()
    full, _, _ = st.render(q, 768, engine="scan")
    _, _, sf = st.render(q, 512, engine="scan", segment=128)
    tail, _, _ = st.render(q, 256, engine="scan", state=sf)
    np.testing.assert_array_equal(np.asarray(full)[..., 512:],
                                  np.asarray(tail))


def test_segmented_probes_and_drivers():
    q = st.Patch(CFG)
    inp = q.add("Input")
    gain = q.add("Multiply", constant=0.5)
    q.connect(inp, 0, gain, "In1")
    q.connect(gain, 0, q.output, 0)
    drive = np.linspace(-1, 1, 512, dtype=np.float32)
    full, probes_f, _ = st.render(q, 512, drivers={inp: drive},
                                  probes=[(gain, 0)], engine="scan")
    seg, probes_s, _ = st.render(q, 512, drivers={inp: drive},
                                 probes=[(gain, 0)], engine="scan",
                                 segment=128)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(seg))
    (kf, vf), = probes_f.items()
    (ks, vs), = probes_s.items()
    assert kf == ks and np.asarray(vs).shape == np.asarray(vf).shape
    np.testing.assert_array_equal(np.asarray(vf), np.asarray(vs))


def test_segment_must_divide_n():
    q = _voice()
    with pytest.raises(ValueError, match="must divide"):
        st.render(q, 500, engine="scan", segment=128)


def test_segment_equal_n_matches_render_long():
    # segment == n must still re-key noise with fold_in(key, 0) (one-
    # iteration segmented scan), so it agrees with render_long(segment=n)
    # -- the unsegmented path uses the raw key and would differ (round-3
    # advisor finding)
    p = st.Patch(CFG)
    nz = p.add("Noise")
    p.connect(nz, 0, p.output, 0)
    seg, _, _ = st.render(p, 256, engine="scan", segment=256)
    rl, _ = render_long(p, 256, segment=256, engine="scan")
    np.testing.assert_array_equal(np.asarray(seg), rl)


def test_segment_must_be_positive():
    q = _voice()
    for bad in (0, -128):
        with pytest.raises(ValueError, match="positive"):
            st.render(q, 512, engine="scan", segment=bad)
