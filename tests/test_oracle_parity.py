"""Cross-implementation oracle tests (SURVEY.md §4 implication c).

Every module is exercised in an ``exact``-precision patch and compared
against srack_tpu.oracle -- an independent NumPy reimplementation of the
Rust reference's literal per-sample semantics.  Drivers inject
deterministic CV/gate/audio lanes through Input modules.
"""

import numpy as np
import pytest

import srack_tpu as st
from srack_tpu.oracle import oracle_render

SR = 4800
BLOCK = 64
N = BLOCK * 6


def cfg(channels=1, block=BLOCK, feedback=False):
    return st.AudioConfig(sample_rate=SR, block_size=block, channels=channels,
                          precision="exact", buffer_feedback=feedback)


def run_both(p, n=N, drivers=None, atol=1e-6):
    got, _, _ = st.render(p, n, drivers=drivers)
    want = oracle_render(p, n, drivers=drivers)
    np.testing.assert_allclose(np.asarray(got), want, atol=atol, rtol=0)
    return np.asarray(got)


def ramp(n=N, lo=-1.0, hi=1.0):
    return np.linspace(lo, hi, n, dtype=np.float32)


def clock(n=N, period=32, duty=0.5):
    t = np.arange(n)
    return ((t % period) < period * duty).astype(np.float32)


def test_oscillator_waveforms():
    p = st.Patch(cfg(channels=3))
    osc = p.add("Oscillator", val=0.25)
    lfo_cv = p.add("Input")
    p.connect(lfo_cv, 0, osc, "CV")
    p.connect(osc, "Sine", p.output, 0)
    p.connect(osc, "Square", p.output, 1)
    p.connect(osc, "Sawtooth", p.output, 2)
    drv = {lfo_cv.id: ramp(lo=-0.5, hi=2.0)}
    run_both(p, drivers=drv, atol=2e-5)


def test_oscillator_sync_reset():
    p = st.Patch(cfg(channels=1))
    osc = p.add("Oscillator", val=-1.0)
    sync = p.add("Input")
    p.connect(sync, 0, osc, "Sync")
    p.connect(osc, "Sawtooth", p.output, 0)
    drv = {sync.id: clock(period=50)}
    run_both(p, drivers=drv, atol=2e-5)


def test_moog_filter_all_outputs():
    p = st.Patch(cfg(channels=3))
    f = p.add("Moog Filter", freq=0.3, res=0.7, exp_amt=0.25)
    audio = p.add("Input")
    cv = p.add("Input")
    p.connect(audio, 0, f, "Audio")
    p.connect(cv, 0, f, "CV")
    p.connect(f, 0, p.output, 0)  # lowpass
    p.connect(f, 1, p.output, 1)  # bandpass
    p.connect(f, 2, p.output, 2)  # highpass
    rng = np.random.default_rng(42)
    drv = {audio.id: rng.uniform(-1, 1, N).astype(np.float32),
           cv.id: ramp(lo=0.0, hi=0.5)}
    run_both(p, drivers=drv, atol=1e-5)


def test_adsr_envelope_stages_and_retrigger():
    p = st.Patch(cfg(channels=1))
    env = p.add("ADSR", a_sec=0.003, d_sec=0.004, s_val=0.6, r_sec=0.005)
    gate = p.add("Input")
    p.connect(gate, 0, env, "Gate")
    p.connect(env, 0, p.output, 0)
    g = np.zeros(N, dtype=np.float32)
    g[10:150] = 1.0     # full ADSR cycle
    g[160:170] = 1.0    # retrigger during release
    g[200:210] = 1.0    # retrigger again quickly (from attack/decay)
    g[230:360] = 1.0
    run_both(p, drivers={gate.id: g}, atol=1e-6)


def test_adsr_zero_attack_instant():
    p = st.Patch(cfg(channels=1))
    env = p.add("ADSR", a_sec=0.0, d_sec=0.002, s_val=0.25, r_sec=0.0)
    gate = p.add("Input")
    p.connect(gate, 0, env, "Gate")
    p.connect(env, 0, p.output, 0)
    run_both(p, drivers={gate.id: clock(period=100, duty=0.4)}, atol=1e-6)


def test_vca_gating():
    p = st.Patch(cfg(channels=1))
    vca = p.add("VCA")
    a, c = p.add("Input"), p.add("Input")
    p.connect(a, 0, vca, "Audio")
    p.connect(c, 0, vca, "CV")
    p.connect(vca, 0, p.output, 0)
    run_both(p, drivers={a.id: ramp(), c.id: ramp(lo=1.0, hi=-1.0)})


def test_vca_missing_input_silence():
    p = st.Patch(cfg(channels=1))
    vca = p.add("VCA")
    a = p.add("Input", value=0.5)
    p.connect(a, 0, vca, "Audio")  # CV left unconnected -> silence
    p.connect(vca, 0, p.output, 0)
    out = run_both(p)
    assert np.all(out == 0.0)


def test_mixer_gains_and_skipped_inputs():
    p = st.Patch(cfg(channels=1))
    mix = p.add("Mono Mixer", gains=(0.5, 2.0, 1.0, 0.25))
    a, b = p.add("Input"), p.add("Input")
    p.connect(a, 0, mix, 0)
    p.connect(b, 0, mix, 3)  # inputs 1,2 unconnected -> skipped
    p.connect(mix, 0, p.output, 0)
    run_both(p, drivers={a.id: ramp(), b.id: ramp(lo=2, hi=0)})


def test_math_ops_and_constant_fallback():
    for op, const in (("Add", 0.5), ("Subtract", -1.5), ("Multiply", 2.0)):
        p = st.Patch(cfg(channels=2))
        m1 = p.add(op, constant=const)   # In2 unconnected -> constant
        m2 = p.add(op)
        a, b = p.add("Input"), p.add("Input")
        p.connect(a, 0, m1, "In1")
        p.connect(a, 0, m2, "In1")
        p.connect(b, 0, m2, "In2")
        p.connect(m1, 0, p.output, 0)
        p.connect(m2, 0, p.output, 1)
        run_both(p, drivers={a.id: ramp(), b.id: ramp(lo=3, hi=-3)})


def test_nonlinear_signed_power():
    p = st.Patch(cfg(channels=1))
    nl = p.add("Non-Linear", constant=1.7)
    a = p.add("Input")
    p.connect(a, 0, nl, "In1")
    p.connect(nl, 0, p.output, 0)
    # XLA's f32 pow differs from libm by a few ulp (SURVEY.md §7 hard part c)
    run_both(p, drivers={a.id: ramp()}, atol=1e-5)


def test_grid_sequencer():
    seq = [None, (12, True), (3, False), None, (24, True), (7, True),
           (0, False), (14, True)]
    p = st.Patch(cfg(channels=3))
    gs = p.add("Grid Sequencer", sequence=seq, n_steps=8)
    clk, sync = p.add("Input"), p.add("Input")
    p.connect(clk, 0, gs, "Step")
    p.connect(sync, 0, gs, "Sync")
    p.connect(gs, "CV", p.output, 0)
    p.connect(gs, "Gate", p.output, 1)
    p.connect(gs, "Sync", p.output, 2)
    s = np.zeros(N, dtype=np.float32)
    s[200:205] = 1.0  # async restart mid-run
    run_both(p, drivers={clk.id: clock(period=16, duty=0.25), sync.id: s})


def test_pattern_sequencer():
    pattern = [[True, None, False, None] * 4,
               [None, True, None, True] * 4,
               [False] * 16,
               [True] * 16] + [[None] * 16] * 4
    p = st.Patch(cfg(channels=3))
    ps = p.add("Pattern Sequencer", pattern=pattern, n_steps=16)
    clk = p.add("Input")
    p.connect(clk, 0, ps, "Step")
    p.connect(ps, "0", p.output, 0)
    p.connect(ps, "3", p.output, 1)
    p.connect(ps, "Sync", p.output, 2)
    run_both(p, drivers={clk.id: clock(period=10, duty=0.3)})


def test_sample_player():
    wav = (np.sin(np.linspace(0, 20, 100)) * 0.8).astype(np.float32)
    p = st.Patch(cfg(channels=1))
    smp = p.add("Sample", samples=wav, wav_sample_rate=SR * 2)
    gate, cv = p.add("Input"), p.add("Input")
    p.connect(gate, 0, smp, "Gate")
    p.connect(cv, 0, smp, "CV")
    p.connect(smp, 0, p.output, 0)
    run_both(p, drivers={gate.id: clock(period=120, duty=0.5),
                         cv.id: ramp(lo=-0.5, hi=0.5)})


def test_freeverb_impulse_response():
    p = st.Patch(cfg(channels=2))
    rev = p.add("Freeverb", room_size=0.8, dampening=0.3, wet=1.0,
                width=0.7, dry=0.2)
    a = p.add("Input")
    p.connect(a, 0, rev, "Left")
    p.connect(rev, "Left", p.output, 0)
    p.connect(rev, "Right", p.output, 1)
    x = np.zeros(N, dtype=np.float32)
    x[0] = 1.0
    x[97] = -0.5
    out = run_both(p, drivers={a.id: x}, atol=1e-7)
    assert np.abs(out).max() > 0  # reverb tail exists


def test_output_unconnected_channel_zero():
    p = st.Patch(cfg(channels=2))
    a = p.add("Input", value=0.25)
    p.connect(a, 0, p.output, 0)
    out = run_both(p)
    assert np.all(out[1] == 0.0)
    assert np.allclose(out[0], 0.25)
