#!/usr/bin/env python
"""Render a short *song*: melody + bassline + drums + reverb -> song.wav.

The full-stack composition demo: note-event sequencing (utils/notes.py)
drives two subtractive voices through Input modules, the pattern-sequencer
drum kit (presets.drum_machine) keeps time, and the mixdown runs through
Freeverb.  Everything is offline-rendered patch graphs -- the workflow the
reference supports interactively with its UI sequencers
(/root/reference/src/synth/sequencer.rs) done headless and batch.

    python examples/song.py [out.wav]
"""
import sys

import numpy as np

import srack_tpu as st
from srack_tpu.presets import drum_machine, gate_cv_voice
from srack_tpu.utils.notes import note_track

SR = 48000
SECONDS = 8.0
N = int(SR * SECONDS)


def bar(notes, t0):
    """One bar of (pitch, beat, beats) at 120 bpm starting at t0 seconds."""
    spb = 0.5  # seconds per beat
    return [(pitch, t0 + beat * spb, dur * spb)
            for pitch, beat, dur in notes]


def main(out_path="song.wav"):
    cfg = st.AudioConfig(sample_rate=SR, channels=1, precision="fast")

    # -- melody: two bars, repeated ----------------------------------------
    lead_line = []
    riff = [("A4", 0, 0.9), ("C5", 1, 0.9), ("E5", 2, 0.45),
            ("D5", 2.5, 0.45), ("C5", 3, 0.9)]
    answer = [("G4", 0, 0.9), ("B4", 1, 0.9), ("D5", 2, 1.9)]
    for rep in range(2):
        lead_line += bar(riff, rep * 4.0)
        lead_line += bar(answer, rep * 4.0 + 2.0)
    lead_gate, lead_cv = note_track(lead_line, N, SR)

    bass_line = []
    for rep in range(4):
        root = "A1" if rep % 2 == 0 else "G1"
        bass_line += bar([(root, b, 0.45) for b in range(4)], rep * 2.0)
    bass_gate, bass_cv = note_track(bass_line, N, SR)

    lead, lg, lc = gate_cv_voice(cfg, cutoff=0.5, res=0.3)
    bass, bg, bc = gate_cv_voice(cfg, cutoff=0.3, res=0.5, d=0.15, s=0.4,
                               wave="Square")

    lead_audio, _, _ = st.render(lead, N,
                                 drivers={lg: lead_gate, lc: lead_cv})
    bass_audio, _, _ = st.render(bass, N,
                                 drivers={bg: bass_gate, bc: bass_cv})
    drum_audio, _, _ = st.render(drum_machine(cfg), N)

    # -- mixdown through Freeverb ------------------------------------------
    dry = (0.45 * np.asarray(lead_audio)[0]
           + 0.4 * np.asarray(bass_audio)[0]
           + 0.5 * np.asarray(drum_audio)[0])
    mix_cfg = st.AudioConfig(sample_rate=SR, channels=2, precision="fast")
    mixer = st.Patch(mix_cfg)
    inp = mixer.add("Input", name="bus")
    rev = mixer.add("Freeverb", room_size=0.75, dampening=0.35,
                    wet=0.25, dry=0.6)
    mixer.connect(inp, 0, rev, "Left")
    mixer.connect(inp, 0, rev, "Right")
    mixer.connect(rev, "Left", mixer.output, 0)
    mixer.connect(rev, "Right", mixer.output, 1)
    audio, _, _ = st.render(mixer, N, drivers={inp: dry.astype(np.float32)})

    a = np.asarray(audio)
    peak = float(np.abs(a).max())
    if peak > 1.0:  # normalise if the sum runs hot
        a = a / (peak * 1.05)
    st.io.wav.write_wav(out_path, a, SR)
    print(f"wrote {out_path}: {SECONDS:.0f}s stereo, peak {peak:.3f}")


if __name__ == "__main__":
    main(*sys.argv[1:])
