"""MIDI import (io/midi.py): fixture bytes are assembled by hand from the
SMF spec, so the reader is tested against data it did not write."""

import struct

import numpy as np

import srack_tpu as st
from srack_tpu.io.midi import read_midi
from srack_tpu.utils.notes import note_track


def _varlen(v):
    out = [v & 0x7F]
    v >>= 7
    while v:
        out.append(0x80 | (v & 0x7F))
        v >>= 7
    return bytes(reversed(out))


def _track(events):
    """events: (delta_ticks, raw bytes)."""
    body = b"".join(_varlen(d) + raw for d, raw in events)
    body += _varlen(0) + b"\xff\x2f\x00"  # end of track
    return b"MTrk" + struct.pack(">I", len(body)) + body


def _smf(tracks, fmt=1, ppqn=480):
    return (b"MThd" + struct.pack(">IHHH", 6, fmt, len(tracks), ppqn)
            + b"".join(tracks))


def make_fixture():
    # conductor: 120 bpm (500000 us/quarter) at t=0, 60 bpm at tick 960
    conductor = _track([
        (0, b"\xff\x51\x03" + (500000).to_bytes(3, "big")),
        (960, b"\xff\x51\x03" + (1000000).to_bytes(3, "big")),
    ])
    # notes: A4 (69) at tick 0 for 480 ticks; C5 (72) at tick 960 for 480
    # ticks (after the tempo change -> 1 s long, not 0.5 s); running
    # status for the second pair; a note-on with velocity 0 acts as off
    notes = _track([
        (0, b"\x90\x45\x64"),        # on A4
        (480, b"\x80\x45\x40"),      # off A4
        (480, b"\x90\x48\x50"),      # on C5  (tick 960)
        (480, b"\x48\x00"),          # running-status on w/ vel 0 == off
    ])
    return _smf([conductor, notes])


def test_read_midi_notes_and_tempo():
    events = read_midi(make_fixture())
    assert len(events) == 2
    (n1, s1, d1), (n2, s2, d2) = events
    assert (n1, n2) == (69, 72)
    # 480 ticks at 120 bpm = 0.5 s
    assert abs(s1 - 0.0) < 1e-9 and abs(d1 - 0.5) < 1e-9
    # second note starts at 960 ticks = 1.0 s, lasts 480 ticks at 60 bpm
    assert abs(s2 - 1.0) < 1e-9 and abs(d2 - 1.0) < 1e-9


def test_missing_note_off_held_to_track_end():
    notes = _track([(0, b"\x90\x45\x64"), (960, b"\x90\x48\x50"),
                    (240, b"\x80\x48\x40")])
    events = read_midi(_smf([notes], fmt=0))
    held = [e for e in events if e[0] == 69][0]
    assert abs(held[2] - (1200 * 500000 / (480 * 1e6))) < 1e-9


def test_same_note_retrigger_closes_previous():
    """on(60) on(60) off(60) off(60): the second on retriggers -- the
    first note ends there (no phantom drone if the off never comes), and
    the extra off is a no-op."""
    notes = _track([(0, b"\x90\x3c\x64"), (480, b"\x90\x3c\x64"),
                    (480, b"\x80\x3c\x40"), (480, b"\x80\x3c\x40")])
    events = read_midi(_smf([notes], fmt=0))
    assert len(events) == 2
    spq = 0.5  # 480 ticks at default 120 bpm
    (n1, s1, d1), (n2, s2, d2) = events
    assert n1 == n2 == 60
    assert (abs(s1) < 1e-9 and abs(d1 - spq) < 1e-9)          # 0 -> 480
    assert (abs(s2 - spq) < 1e-9 and abs(d2 - spq) < 1e-9)    # 480 -> 960


def test_retrigger_without_off_no_phantom_drone():
    """on(60)@0, on(60)@480, off(60)@500: two bounded notes, nothing held
    to the end of the track."""
    notes = _track([(0, b"\x90\x3c\x64"), (480, b"\x90\x3c\x64"),
                    (20, b"\x80\x3c\x40"), (1000, b"\xb0\x07\x64")])
    events = read_midi(_smf([notes], fmt=0))
    assert len(events) == 2
    ticks_per_sec = 480 * 1e6 / 500000  # 960 ticks/s at default tempo
    (n1, s1, d1), (n2, s2, d2) = sorted(events, key=lambda e: e[1])
    assert abs(d1 - 480 / ticks_per_sec) < 1e-9   # closed at the retrigger
    assert abs(d2 - 20 / ticks_per_sec) < 1e-9    # closed by the off


def test_cli_midi_render(tmp_path, capsys):
    from srack_tpu.__main__ import main
    from srack_tpu.io.wav import read_wav

    mid = tmp_path / "riff.mid"
    mid.write_bytes(make_fixture())
    out = tmp_path / "riff.wav"
    rc = main(["midi", str(mid), "-o", str(out), "--sample-rate", "8000"])
    assert rc == 0
    audio, sr = read_wav(str(out))
    assert sr == 8000
    assert audio.shape[-1] > 8000 * 2  # two notes + release tail
    assert 0.05 < np.abs(audio).max() <= 1.0


def test_cli_midi_polyphonic_chord(tmp_path, capsys):
    """A held 3-note chord must sound all notes at once (voice allocation
    over batch lanes), which a monophonic render cannot."""
    from srack_tpu.__main__ import main
    from srack_tpu.io.wav import read_wav

    chord = _track([
        (0, b"\x90\x3c\x64"), (0, b"\x90\x40\x64"), (0, b"\x90\x43\x64"),
        (960, b"\x80\x3c\x40"), (0, b"\x80\x40\x40"), (0, b"\x80\x43\x40"),
    ])
    mid = tmp_path / "chord.mid"
    mid.write_bytes(_smf([chord], fmt=0))
    out = tmp_path / "chord.wav"
    rc = main(["midi", str(mid), "-o", str(out), "--sample-rate", "8000",
               "--voices", "4"])
    assert rc == 0
    audio, sr = read_wav(str(out))
    # all three partials present in the sustain: check the spectrum
    seg = audio[2000:8000].astype(np.float64)
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    freqs = np.fft.rfftfreq(len(seg), 1 / sr)
    for midi_note in (60, 64, 67):
        f0 = 440.0 * 2 ** ((midi_note - 69) / 12)
        band = spec[(freqs > f0 * 0.97) & (freqs < f0 * 1.03)].max()
        assert band > spec.mean() * 10, f"note {midi_note} missing"


def test_midi_to_audio_end_to_end(tmp_path):
    path = tmp_path / "riff.mid"
    path.write_bytes(make_fixture())
    events = read_midi(str(path))
    cfg = st.AudioConfig(sample_rate=8000, channels=1, precision="fast")
    n = 8000 * 2
    gate, cv = note_track(events, n, cfg.sample_rate)
    assert gate.max() == 1.0
    assert abs(cv[4000] - 0.0) < 1e-6          # A4 -> 0.0 CV held
    assert abs(cv[-1] - 0.25) < 1e-6           # C5 -> +3 semitones

    p = st.Patch(cfg)
    g_in, c_in = p.add("Input"), p.add("Input")
    osc = p.add("Oscillator")
    vca = p.add("VCA")
    p.connect(c_in, 0, osc, "CV")
    p.connect(osc, "Sine", vca, "Audio")
    p.connect(g_in, 0, vca, "CV")
    p.connect(vca, 0, p.output, 0)
    audio, _, _ = st.render(p, n, drivers={g_in: gate, c_in: cv})
    a = np.asarray(audio)[0]
    assert np.abs(a[:3900]).max() > 0.5        # note 1 sounds
    assert np.abs(a[4100:7900]).max() == 0.0   # silence between notes
    assert np.abs(a[8100:]).max() > 0.5        # note 2 sounds
