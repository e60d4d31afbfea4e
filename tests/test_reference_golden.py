"""Golden-value tests ported from the reference's own test suite and
analytically-known behaviours (not oracle-relative -- these check math).
"""

import numpy as np

import srack_tpu as st
from srack_tpu.modules.freeverb import line_lengths, COMB_TUNINGS, \
    ALLPASS_TUNINGS


def test_produces_440():
    """The reference oscillator golden test (oscillator.rs:284-306):
    sample_rate = 440*4 so the sine hits exactly 0, 1, 0, -1; odd buffer
    size 17; phase continues smoothly into the next buffer."""
    cfg = st.AudioConfig(sample_rate=440 * 4, block_size=17, channels=1,
                         precision="exact")
    p = st.Patch(cfg)
    osc = p.add("Oscillator")
    p.connect(osc, "Sine", p.output, 0)
    audio, _, state = st.render(p, 17)
    buf = np.asarray(audio[0])
    assert buf[0] == 0.0
    assert abs(buf[1] - 1.0) < 1e-5
    assert abs(buf[2]) < 1e-5
    assert abs(buf[3] + 1.0) < 1e-5
    assert abs(buf[4]) < 1e-5
    audio2, _, _ = st.render(p, 17, state=state)
    assert abs(float(audio2[0][0]) - 1.0) < 1e-5  # buffer-boundary continuity


def test_osc_440_frequency_fast_mode():
    """Fast (fixed-point) mode: a default oscillator at 48 kHz measures
    440 Hz within a milli-octave over one second."""
    cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                         precision="fast")
    p = st.Patch(cfg)
    osc = p.add("Oscillator")
    p.connect(osc, "Sine", p.output, 0)
    audio, _, _ = st.render(p, 48000)
    x = np.asarray(audio[0])
    # count rising zero crossings
    crossings = np.sum((x[:-1] < 0) & (x[1:] >= 0))
    assert abs(int(crossings) - 440) <= 1


def test_square_saw_dc_and_range():
    cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=2,
                         precision="fast")
    p = st.Patch(cfg)
    osc = p.add("Oscillator", val=-2.0)
    p.connect(osc, "Square", p.output, 0)
    p.connect(osc, "Sawtooth", p.output, 1)
    audio, _, _ = st.render(p, 48000)
    sq, saw = np.asarray(audio)
    assert abs(sq.mean()) < 0.02 and abs(saw.mean()) < 0.02  # no DC
    assert 0.9 < np.abs(sq).max() < 1.4  # polyBLEP overshoot bounded
    # band-limiting: energy above 0.45*fs is tiny vs a naive square
    spec = np.abs(np.fft.rfft(sq * np.hanning(len(sq))))
    hi = spec[int(len(spec) * 0.93):].sum() / spec.sum()
    assert hi < 0.01


def test_moog_filter_attenuates_highs():
    cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=2,
                         precision="fast")
    p = st.Patch(cfg)
    lo = p.add("Oscillator", val=-3.0)   # 55 Hz
    hi = p.add("Oscillator", val=3.5)    # ~5 kHz
    mix = p.add("Mono Mixer", gains=(0.5, 0.5, 0, 0))
    flt = p.add("Moog Filter", freq=0.1, res=0.1)
    p.connect(lo, "Sine", mix, 0)
    p.connect(hi, "Sine", mix, 1)
    p.connect(mix, 0, flt, "Audio")
    p.connect(flt, 0, p.output, 0)   # lowpass
    p.connect(flt, 2, p.output, 1)   # highpass
    audio, _, _ = st.render(p, 24000)
    lp, hp = np.asarray(audio)

    def band_energy(x, f_lo, f_hi):
        spec = np.abs(np.fft.rfft(x))
        freqs = np.fft.rfftfreq(len(x), 1 / 48000)
        return spec[(freqs > f_lo) & (freqs < f_hi)].sum()

    # lowpass keeps 55 Hz, kills 5 kHz; highpass the reverse
    assert band_energy(lp, 30, 100) > 10 * band_energy(lp, 4000, 7000)
    assert band_energy(hp, 4000, 7000) > 2 * band_energy(hp, 30, 100)


def test_adsr_reaches_sustain_level():
    cfg = st.AudioConfig(sample_rate=4800, block_size=64, channels=1,
                         precision="exact")
    p = st.Patch(cfg)
    env = p.add("ADSR", a_sec=0.01, d_sec=0.01, s_val=0.37, r_sec=0.01)
    gate = p.add("Input")
    p.connect(gate, 0, env, "Gate")
    p.connect(env, 0, p.output, 0)
    g = np.ones(512, dtype=np.float32)
    g[0] = 0.0  # rising edge at sample 1
    audio, _, _ = st.render(p, 512, drivers={gate: g})
    x = np.asarray(audio[0])
    assert abs(x.max() - 1.0) < 0.02          # attack peak
    assert abs(x[-1] - 0.37) < 1e-6           # sustain level held


def test_freeverb_tunings_at_44100_are_jezar_constants():
    cl, cr, al, ar = line_lengths(44100)
    assert cl == COMB_TUNINGS
    assert al == ALLPASS_TUNINGS
    assert cr == tuple(t + 23 for t in COMB_TUNINGS)
    assert ar == tuple(t + 23 for t in ALLPASS_TUNINGS)


def test_freeverb_tail_decays():
    cfg = st.AudioConfig(sample_rate=44100, block_size=256, channels=1,
                         precision="exact")
    p = st.Patch(cfg)
    rev = p.add("Freeverb", room_size=0.5, dampening=0.5, wet=1.0, dry=0.0)
    imp = p.add("Input")
    p.connect(imp, 0, rev, "Left")
    p.connect(rev, "Left", p.output, 0)
    n = 44100
    x = np.zeros(n, dtype=np.float32)
    x[0] = 1.0
    audio, _, _ = st.render(p, n, drivers={imp: x})
    y = np.asarray(audio[0])
    early = np.abs(y[2000:6000]).max()
    late = np.abs(y[-4000:]).max()
    assert early > 1e-4          # reverb responds
    assert late < early * 0.5    # and decays
    assert np.isfinite(y).all()
