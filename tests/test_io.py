"""I/O tests: WAV codec, native patch persistence, state snapshots,
.srk interop round-trip."""

import numpy as np
import pytest

import srack_tpu as st
from srack_tpu import presets
from srack_tpu.io import (load_patch, load_state, read_srk, read_wav,
                          save_patch, save_state, write_srk, write_wav)


def test_wav_roundtrip_16bit(tmp_path):
    sr = 8000
    x = (0.5 * np.sin(np.linspace(0, 100, 4000))).astype(np.float32)
    path = tmp_path / "t.wav"
    write_wav(path, x, sr)
    y, sr2 = read_wav(path)
    assert sr2 == sr
    np.testing.assert_allclose(y, x, atol=1.0 / 32000)


def test_wav_roundtrip_float_stereo_takes_channel0(tmp_path):
    sr = 44100
    a = np.stack([np.linspace(-1, 1, 100), np.zeros(100)]).astype(np.float32)
    path = tmp_path / "t.wav"
    write_wav(path, a, sr, bits=32)
    y, _ = read_wav(path)
    np.testing.assert_allclose(y, a[0], atol=1e-7)  # channel 0 only


def test_patch_json_roundtrip(tmp_path):
    cfg = st.AudioConfig(sample_rate=4800, block_size=64, channels=1,
                         precision="exact")
    p = presets.sequencer_patch(cfg)
    path = tmp_path / "patch.json"
    save_patch(p, path)
    q = load_patch(path)
    assert sorted(q.module_ids) == sorted(p.module_ids)
    assert sorted(q.connections()) == sorted(p.connections())
    a, _, _ = st.render(p, 256)
    b, _, _ = st.render(q, 256)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_state_snapshot_resume(tmp_path):
    cfg = st.AudioConfig(sample_rate=4800, block_size=64, channels=1,
                         precision="exact")
    p = presets.subtractive_voice(cfg)
    compiled = st.compile_patch(p)
    full, _, _ = compiled.render(256)
    a1, _, mid = compiled.render(128)
    save_state(tmp_path / "ck.npz", mid)
    restored = load_state(tmp_path / "ck.npz", compiled.init_state())
    a2, _, _ = compiled.render(128, state=restored)
    joined = np.concatenate([np.asarray(a1), np.asarray(a2)], axis=-1)
    np.testing.assert_allclose(joined, np.asarray(full), atol=1e-7)


def test_srk_roundtrip_all_module_types(tmp_path):
    cfg = st.AudioConfig(sample_rate=48000, block_size=64, channels=2,
                         precision="exact")
    p = st.Patch(cfg)
    osc = p.add("Oscillator", val=-1.25)
    noise = p.add("Noise")
    gs = p.add("Grid Sequencer", sequence=[(3, True), None, (7, False)],
               n_steps=3)
    ps = p.add("Pattern Sequencer", pattern=[[True, None, False]] * 8,
               n_steps=3)
    env = p.add("ADSR", a_sec=0.1, d_sec=0.2, s_val=0.3, r_sec=0.4)
    vca = p.add("VCA")
    flt = p.add("Moog Filter", freq=0.33, res=0.66, exp_amt=0.1)
    mix = p.add("Mono Mixer", gains=(0.1, 0.2, 0.3, 0.4))
    smp = p.add("Sample", samples=np.linspace(-1, 1, 10).astype(np.float32),
                wav_sample_rate=22050)
    add = p.add("Add", constant=0.5)
    nl = p.add("Non-Linear", constant=1.5)
    rev = p.add("Freeverb", room_size=0.9, dampening=0.25, wet=0.7,
                width=0.4, dry=0.1)
    p.connect(osc, "Sine", flt, "Audio")
    p.connect(gs, "Gate", env, "Gate")
    p.connect(flt, 0, vca, "Audio")
    p.connect(env, 0, vca, "CV")
    p.connect(vca, 0, rev, "Left")
    p.connect(rev, "Left", p.output, 0)
    p.connect(rev, "Right", p.output, 1)
    p.connect(noise, 0, mix, 0)
    p.connect(smp, 0, mix, 1)
    p.connect(add, 0, nl, "In1")
    p.connect(ps, "0", add, "In1")

    data = write_srk(p)
    q = read_srk(data, config=cfg)
    # same module types and connection structure (ids are remapped)
    ptypes = sorted(i.mdef.type_name for i in p)
    qtypes = sorted(i.mdef.type_name for i in q)
    assert ptypes == qtypes
    assert len(q.connections()) == len(p.connections())
    # parameters survive
    q_osc = [i for i in q if i.mdef.type_name == "Oscillator"][0]
    assert float(q_osc.params["val"]) == pytest.approx(-1.25)
    q_flt = [i for i in q if i.mdef.type_name == "Moog Filter"][0]
    assert float(q_flt.params["res"]) == pytest.approx(0.66)
    q_gs = [i for i in q if i.mdef.type_name == "Grid Sequencer"][0]
    assert int(q_gs.params["n_steps"]) == 3
    assert q_gs.params["cells"][0] == 2 and q_gs.params["cells"][2] == 1
    q_smp = [i for i in q if i.mdef.type_name == "Sample"][0]
    assert int(q_smp.params["length"]) == 10
    # renders agree (noise keyed identically after id remap is not
    # guaranteed, so compare with noise disconnected patches instead)
    a, _, _ = st.render(p, 128)
    b, _, _ = st.render(q, 128)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
