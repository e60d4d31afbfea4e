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


# -- batched live streaming (round-3 verdict item 5) --------------------------
# The reference's play-while-editing loop (src/ui.rs:63-82, main.rs:59-90)
# at batch-engine scale: render_stream(voices=V) streams V voices per block,
# live topology edits migrate every voice's state.

def _voice_patch(cfg):
    p = st.Patch(cfg)
    osc = p.add("Oscillator", val=-1.0)
    flt = p.add("Moog Filter", freq=0.4, res=0.3)
    p.connect(osc, "Sawtooth", flt, "Audio")
    p.connect(flt, 0, p.output, 0)
    return p, osc, flt


def test_batched_stream_matches_offline():
    from srack_tpu.engine import replicate_params
    cfg = st.AudioConfig(sample_rate=4800, block_size=64, channels=1,
                         precision="fast")
    p, _, _ = _voice_patch(cfg)
    v = 8
    params = replicate_params(p.params(), v)
    for engine in ("scan", "block"):
        blocks = [np.asarray(a) for a, _, _ in
                  st.render_stream(p, params=params, voices=v, n_blocks=4,
                                   engine=engine)]
        got = np.concatenate(blocks, axis=-1)
        assert got.shape == (v, 1, 4 * cfg.block_size)
        want, _, _ = st.render_batch(p, 4 * cfg.block_size, params=params,
                                     engine=engine)
        # fast mode state carry is bit-exact across block boundaries
        np.testing.assert_array_equal(got, np.asarray(want))


def test_batched_stream_live_rewire_keeps_state():
    """Mid-stream rewire of a batched stream: surviving voices' oscillator
    phase continues.  Voice 0 of the batch must match the identical
    single-voice stream bit-for-bit (the single-voice path is pinned
    against the oracle in test_live_edit/test_oracle_parity)."""
    cfg = st.AudioConfig(sample_rate=4800, block_size=64, channels=1,
                         precision="fast")
    v = 8

    def run(voices):
        p, osc, flt = _voice_patch(cfg)
        kw = dict(voices=voices, engine="scan") if voices else dict(
            engine="scan")
        stream = st.render_stream(p, n_blocks=4, **kw)
        chunks = [np.asarray(next(stream)[0]) for _ in range(2)]
        # live edit: bypass the filter (delete + rewire)
        p.delete_module(flt)
        p.connect(osc, "Sawtooth", p.output, 0)
        chunks += [np.asarray(a) for a, _, _ in stream]
        return np.concatenate(chunks, axis=-1)

    batched = run(v)
    single = run(None)
    assert batched.shape == (v, 1, 4 * cfg.block_size)
    for voice in range(v):
        np.testing.assert_array_equal(batched[voice], single)


def test_batched_stream_pinned_params_survive_module_add():
    """Pinned (stacked) params follow a topology edit: surviving modules
    keep their per-voice values, a module added mid-stream gets patch
    defaults instead of a KeyError."""
    from srack_tpu.engine import stack_params
    cfg = st.AudioConfig(sample_rate=4800, block_size=64, channels=1,
                         precision="fast")
    p = st.Patch(cfg)
    osc = p.add("Oscillator", val=0.0)
    p.connect(osc, "Sine", p.output, 0)
    v = 4
    plist = []
    for i in range(v):
        p.set_params(osc, val=-2.0 + 0.5 * i)
        plist.append(p.params())
    params = stack_params(plist)
    stream = st.render_stream(p, params=params, voices=v, n_blocks=4,
                              engine="scan")
    a0 = np.asarray(next(stream)[0])
    gain = p.add("Multiply", constant=1.0)
    p.connect(osc, "Sine", gain, "In1")
    p.connect(gain, 0, p.output, 0)
    rest = [np.asarray(a) for a, _, _ in stream]
    got = np.concatenate([a0] + rest, axis=-1)
    # unity-gain insert with pinned per-voice vals == unedited render
    q = st.Patch(cfg)
    q_osc = q.add("Oscillator", val=0.0)
    q.connect(q_osc, "Sine", q.output, 0)
    want, _, _ = st.render_batch(q, 4 * cfg.block_size, params=params,
                                 engine="scan")
    np.testing.assert_array_equal(got, np.asarray(want))


def test_batched_stream_paced_consume_holds_deadline():
    cfg = st.AudioConfig(sample_rate=2400, block_size=256, channels=1,
                         precision="fast")
    p, _, _ = _voice_patch(cfg)
    v = 8
    n_blocks = 12
    stream = st.render_stream(p, voices=v, n_blocks=n_blocks, engine="scan")
    block_s = cfg.block_size / cfg.sample_rate
    underruns, worst, timed = paced_consume(stream, block_s)
    assert underruns == 0, (underruns, worst)
    assert timed == n_blocks - 2
