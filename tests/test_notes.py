"""Note-event sequencing (utils/notes.py): event lists -> driver lanes."""

import numpy as np

import srack_tpu as st
from srack_tpu.utils.notes import note_track, note_tracks


def test_note_track_basic():
    sr = 1000
    gate, cv = note_track([("A4", 0.1, 0.2), ("A5", 0.5, 0.1)], 1000, sr)
    assert gate.shape == cv.shape == (1000,)
    assert gate[99] == 0.0 and gate[100] == 1.0 and gate[299] == 1.0
    assert gate[300] == 0.0
    assert cv[150] == 0.0          # A4 = 0.0 CV
    assert cv[550] == 1.0          # A5 = +1 octave
    # CV holds through the inter-note gap (no pitch reset during release)
    assert cv[400] == 0.0
    # and past the last note
    assert cv[-1] == 1.0


def test_note_track_retrigger_gap():
    sr = 1000
    # back-to-back notes: the gate must dip so edge detectors refire
    gate, _ = note_track([("C4", 0.0, 0.5), ("D4", 0.5, 0.4)], 1000, sr,
                         gap_samples=2)
    a = int(0.5 * sr)
    assert gate[a - 1] == 0.0 and gate[a - 2] == 0.0  # the dip
    assert gate[a] == 1.0
    # legato mode keeps the gate high
    gate2, _ = note_track([("C4", 0.0, 0.5), ("D4", 0.5, 0.4)], 1000, sr,
                          gap_samples=0)
    assert gate2[a - 1] == 1.0 and gate2[a] == 1.0


def test_note_track_nested_note_returns_pitch():
    # a short note inside a longer one must hand the CV back when it ends
    sr = 1000
    gate, cv = note_track([("A4", 0.0, 1.0), ("A5", 0.3, 0.2)], 1000, sr,
                          gap_samples=0)
    assert cv[100] == 0.0          # A4 before the inner note
    assert cv[400] == 1.0          # A5 inside it
    assert cv[600] == 0.0          # back to A4 for the tail
    assert gate[600] == 1.0        # outer gate still high


def test_note_track_pitch_kinds():
    _, cv = note_track([(69, 0.0, 0.1), (0.5, 0.2, 0.1)], 400, 1000)
    assert cv[50] == 0.0           # MIDI 69 = A4
    assert cv[250] == 0.5          # raw CV passes through


def test_note_tracks_batch():
    gates, cvs = note_tracks(
        [[("A4", 0.0, 0.5)], [("A3", 0.0, 0.5)]], 600, 1000)
    assert gates.shape == cvs.shape == (2, 600)
    assert cvs[0, 100] == 0.0 and cvs[1, 100] == -1.0


def test_allocate_voices_spreads_chord():
    from srack_tpu.utils.notes import allocate_voices
    chord = [("C4", 0.0, 1.0), ("E4", 0.0, 1.0), ("G4", 0.0, 1.0)]
    lanes = allocate_voices(chord, 4)
    assert sorted(len(l) for l in lanes) == [0, 1, 1, 1]
    # sequential notes reuse lanes
    melody = [("C4", 0.0, 0.4), ("D4", 0.5, 0.4), ("E4", 1.0, 0.4)]
    lanes = allocate_voices(melody, 2)
    assert sum(len(l) for l in lanes) == 3


def test_allocate_voices_steals_oldest_and_truncates():
    from srack_tpu.utils.notes import allocate_voices
    ev = [("C4", 0.0, 10.0), ("E4", 0.1, 10.0), ("G4", 0.2, 10.0)]
    lanes = allocate_voices(ev, 2)
    # C4 (oldest) was stolen at t=0.2 and truncated to dur 0.2
    c4 = [e for lane in lanes for e in lane
          if abs(e[1]) < 1e-9 and e[0] == "C4"][0]
    assert abs(c4[2] - 0.2) < 1e-9
    # all three notes exist
    assert sum(len(l) for l in lanes) == 3


def test_notes_drive_a_voice_end_to_end():
    """A two-note melody through gate+CV Inputs into ADSR + oscillator."""
    cfg = st.AudioConfig(sample_rate=8000, block_size=64, channels=1,
                         precision="fast")
    p = st.Patch(cfg)
    gate_in = p.add("Input", name="gate")
    cv_in = p.add("Input", name="cv")
    osc = p.add("Oscillator", val=-1.0)
    env = p.add("ADSR", a_sec=0.005, d_sec=0.02, s_val=0.7, r_sec=0.05)
    vca = p.add("VCA")
    p.connect(cv_in, 0, osc, "CV")
    p.connect(gate_in, 0, env, "Gate")
    p.connect(osc, "Sawtooth", vca, "Audio")
    p.connect(env, 0, vca, "CV")
    p.connect(vca, 0, p.output, 0)

    n = 8000
    gate, cv = note_track([("A3", 0.05, 0.4), ("E4", 0.55, 0.3)], n,
                          cfg.sample_rate)
    audio, _, _ = st.render(p, n, drivers={gate_in: gate, cv_in: cv})
    a = np.asarray(audio)[0]
    assert np.isfinite(a).all()
    assert np.abs(a[:int(0.04 * 8000)]).max() == 0.0   # silence before note 1
    assert np.abs(a[int(0.2 * 8000):int(0.4 * 8000)]).max() > 0.1
    # second note sounds too (env retriggered by the fresh edge)
    assert np.abs(a[int(0.6 * 8000):int(0.8 * 8000)]).max() > 0.1
