#!/usr/bin/env python
"""Render preset patches to WAV files.

Usage:  python examples/render_wav.py [preset] [seconds] [out.wav]
Presets: sine, subtractive, sequencer, feedback, reverb (see
srack_tpu/presets.py -- these are the BASELINE benchmark configs).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import sys

import srack_tpu as st
from srack_tpu.io import write_wav
from srack_tpu.presets import PRESETS
from srack_tpu.utils.profiling import timed_render


def main(argv):
    name = argv[1] if len(argv) > 1 else "sequencer"
    seconds = float(argv[2]) if len(argv) > 2 else 4.0
    out = argv[3] if len(argv) > 3 else f"{name}.wav"

    cfg = st.AudioConfig(sample_rate=48000, channels=2 if name == "reverb"
                         else 1, precision="fast")
    patch = PRESETS[name](cfg)
    compiled = st.compile_patch(patch)
    n = int(seconds * cfg.sample_rate)
    audio, _, _, stats = timed_render(compiled, n)
    write_wav(out, audio, cfg.sample_rate)
    print(f"wrote {out}: {seconds}s, peak {stats.peak_amplitude:.3f}, "
          f"{stats.realtime_factor:.0f}x real time "
          f"(compile {stats.compile_s:.1f}s)")


if __name__ == "__main__":
    main(sys.argv)
