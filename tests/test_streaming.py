"""Real-time streaming pacing contract (round-2 verdict item 10).

The reference's implicit performance contract is a cpal callback that
fills each 1024-sample block before the DAC drains the previous one
(src/main.rs:59-90, BASELINE.md).  The shipped pacing loop
(examples/live_stream.py::paced_consume -- imported, not duplicated)
must sustain a generous deadline on one CPU core with zero underruns.
"""

import pathlib
import sys

import numpy as np

import srack_tpu as st

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                       / "examples"))
from live_stream import paced_consume  # noqa: E402


def test_paced_stream_zero_underruns():
    # ~4x real-time headroom on one CPU core: 2400 Hz "sample rate" with
    # 256-sample blocks = 106 ms deadlines for work a laptop does in <25 ms
    cfg = st.AudioConfig(sample_rate=2400, block_size=256, channels=1,
                         precision="fast")
    p = st.Patch(cfg)
    osc = p.add("Oscillator", val=-1.0)
    flt = p.add("Moog Filter", freq=0.4, res=0.3)
    p.connect(osc, "Sawtooth", flt, "Audio")
    p.connect(flt, 0, p.output, 0)

    block_s = cfg.block_size / cfg.sample_rate
    n_blocks = 20
    stream = st.render_stream(p, n_blocks=n_blocks)
    seen = []
    underruns, worst_headroom, timed = paced_consume(
        stream, block_s, on_block=seen.append)

    assert underruns == 0, (underruns, worst_headroom)
    assert timed == n_blocks - 2  # two prime blocks absorb compiles
    assert len(seen) == n_blocks
    audio = np.concatenate(seen, axis=-1)
    assert audio.shape == (1, n_blocks * cfg.block_size)
    assert float(np.abs(audio).max()) > 0.01


def test_paced_stream_counts_real_underruns():
    """A consumer slower than the deadline must be *counted*, not hidden:
    run with an impossibly tight deadline and assert underruns fire."""
    cfg = st.AudioConfig(sample_rate=48000, block_size=64, channels=1,
                         precision="fast")
    p = st.Patch(cfg)
    osc = p.add("Oscillator", val=0.0)
    p.connect(osc, "Sine", p.output, 0)
    stream = st.render_stream(p, n_blocks=10)
    # 1 us deadlines: every block is late by construction
    underruns, worst, timed = paced_consume(stream, 1e-6)
    assert timed == 8
    assert underruns >= 6
    assert worst < 0
