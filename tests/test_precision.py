"""Precision-mode drift bounds.

Fast mode (f32 + int32 fixed-point phase) must track exact mode (the
reference's f64 phase) within documented tolerances over long renders --
the "bit-close within float tolerance" contract (SURVEY.md §7 hard part c).
"""

import numpy as np

import srack_tpu as st


def _sine(precision, n, sr=48000):
    cfg = st.AudioConfig(sample_rate=sr, block_size=1024, channels=1,
                         precision=precision)
    p = st.Patch(cfg)
    osc = p.add("Oscillator", val=0.25)
    p.connect(osc, "Sine", p.output, 0)
    audio, _, _ = st.render(p, n)
    return np.asarray(audio[0])


def test_fast_vs_exact_one_second_drift():
    n = 48000
    fast = _sine("fast", n)
    exact = _sine("exact", n)
    # fixed-point delta quantisation is ~2^-24 relative; over 1 s the
    # accumulated phase error stays < ~1e-4 cycles -> sine diff < 1e-3
    assert np.abs(fast - exact).max() < 1e-3


def test_fast_mode_zero_drift_structure():
    """The int32 accumulator wraps exactly: rendering 4 x 0.25 s in
    chunks equals one 1 s render bit-for-bit (no accumulation-order
    dependence)."""
    cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                         precision="fast")
    p = st.Patch(cfg)
    osc = p.add("Oscillator", val=-0.7)
    p.connect(osc, "Sawtooth", p.output, 0)
    compiled = st.compile_patch(p)
    full, _, _ = compiled.render(48000)
    chunks = []
    state = None
    for _ in range(4):
        a, _, state = compiled.render(12000, state=state)
        chunks.append(np.asarray(a))
    joined = np.concatenate(chunks, axis=-1)
    np.testing.assert_array_equal(joined, np.asarray(full))
