"""Feedback-cycle semantics tests.

The reference breaks cycles at plan time and feedback reads see the
previous *buffer* (src/synth.rs:168-192 + buffer persistence).  The engine's
``buffer_feedback=True`` mode must match the oracle exactly; the default
per-sample mode must agree with the oracle when ``block_size == 1`` (where
previous-buffer and previous-sample feedback coincide).
"""

import numpy as np

import srack_tpu as st
from srack_tpu.oracle import oracle_render


def build_cross_fm(cfg):
    """Cross-FM pair: each oscillator's sine modulates the other's pitch
    (BASELINE config 4)."""
    p = st.Patch(cfg)
    a = p.add("Oscillator", val=-2.0)
    b = p.add("Oscillator", val=-2.5)
    scale_a = p.add("Multiply", constant=0.7)
    scale_b = p.add("Multiply", constant=0.9)
    p.connect(a, "Sine", scale_a, "In1")
    p.connect(scale_a, 0, b, "CV")
    p.connect(b, "Sine", scale_b, "In1")
    p.connect(scale_b, 0, a, "CV")
    p.connect(a, "Sine", p.output, 0)
    return p


def test_cross_fm_buffer_mode_matches_oracle():
    cfg = st.AudioConfig(sample_rate=4800, block_size=32, channels=1,
                         precision="exact", buffer_feedback=True)
    p = build_cross_fm(cfg)
    n = 32 * 8
    got, _, _ = st.render(p, n)
    want = oracle_render(p, n)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=0)


def test_cross_fm_sample_mode_matches_oracle_at_block_1():
    cfg = st.AudioConfig(sample_rate=4800, block_size=1, channels=1,
                         precision="exact", buffer_feedback=False)
    p = build_cross_fm(cfg)
    n = 200
    got, _, _ = st.render(p, n)
    want = oracle_render(p, n)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=0)


def test_filter_feedback_loop_runs():
    """Filter output fed back into its own audio input via an attenuator."""
    cfg = st.AudioConfig(sample_rate=4800, block_size=64, channels=1,
                         precision="exact")
    p = st.Patch(cfg)
    osc = p.add("Oscillator", val=-1.0)
    mix = p.add("Mono Mixer", gains=(1.0, 0.5, 0.0, 0.0))
    flt = p.add("Moog Filter", freq=0.4, res=0.6)
    p.connect(osc, "Sawtooth", mix, 0)
    p.connect(flt, 0, mix, 1)      # feedback edge
    p.connect(mix, 0, flt, "Audio")
    p.connect(flt, 0, p.output, 0)
    audio, _, _ = st.render(p, 256)
    a = np.asarray(audio)
    assert np.all(np.isfinite(a))
    assert np.abs(a).max() > 0.01


def test_sample_vs_buffer_feedback_differ_but_close():
    n = 64 * 4
    cfg_s = st.AudioConfig(sample_rate=4800, block_size=64, channels=1,
                           precision="exact", buffer_feedback=False)
    cfg_b = st.AudioConfig(sample_rate=4800, block_size=64, channels=1,
                           precision="exact", buffer_feedback=True)
    out_s = np.asarray(st.render(build_cross_fm(cfg_s), n)[0])
    out_b = np.asarray(st.render(build_cross_fm(cfg_b), n)[0])
    # same patch, different feedback latency: correlated but not identical
    assert not np.allclose(out_s, out_b)
    assert np.corrcoef(out_s.ravel(), out_b.ravel())[0, 1] > 0.5
