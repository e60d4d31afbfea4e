#!/usr/bin/env python
"""Parameter automation lanes: DAW-style per-sample control of any param.

The reference's sliders are static between UI events (src/ui.rs module
``ui()`` panels); a DAW layers automation on top.  Here any scalar module
param can be driven by a per-sample array: the compiler promotes it to a
streamed lane and the module's step sees this sample's value where the
static param would be (exact per-sample semantics on the scan and fused
engines -- see srack_tpu/compiler.py).

Renders a 4-second clip where:
* the filter cutoff sweeps up and back (classic filter sweep),
* the oscillator pitch glides down one octave over the clip,
* resonance ramps up in the second half.

Usage: python examples/automation.py [out.wav]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import srack_tpu as st
from srack_tpu.io import write_wav


def main(argv):
    out = argv[1] if len(argv) > 1 else "automation.wav"
    cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                         precision="fast")
    seconds = 4.0
    n = int(cfg.sample_rate * seconds)
    t = np.linspace(0.0, 1.0, n, dtype=np.float32)

    p = st.Patch(cfg)
    osc = p.add("Oscillator", val=-2.0, name="vco")
    flt = p.add("Moog Filter", freq=0.2, res=0.3, name="vcf")
    gate = p.add("Oscillator", val=-5.0, antialiasing=False, name="clock")
    env = p.add("ADSR", a_sec=0.01, d_sec=0.2, s_val=0.6, r_sec=0.1,
                name="env")
    vca = p.add("VCA", name="vca")
    p.connect(osc, "Sawtooth", flt, "Audio")
    p.connect(gate, "Square", env, "Gate")
    p.connect(flt, 0, vca, "Audio")
    p.connect(env, 0, vca, "CV")
    p.connect(vca, 0, p.output, 0)

    lanes = {
        # triangle sweep 0.1 -> 0.8 -> 0.1
        (flt, "freq"): (0.1 + 0.7 * (1.0 - np.abs(2.0 * t - 1.0))
                        ).astype(np.float32),
        # one-octave downward glide
        (osc, "val"): (-2.0 - t).astype(np.float32),
        # resonance climbs in the back half
        (flt, "res"): np.clip(2.0 * t - 1.0, 0.0, 0.85).astype(np.float32),
    }
    audio, _, _ = st.render(p, n, automation=lanes)
    a = np.asarray(audio)
    print(f"rendered {a.shape} peak={np.abs(a).max():.3f}")
    write_wav(out, a, cfg.sample_rate)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(sys.argv)
