"""Native (C++) runtime component tests: the ctypes planner and WAV codec
must agree with their pure-Python counterparts."""

import random

import numpy as np
import pytest

import srack_tpu as st
from srack_tpu import native
from srack_tpu.planner import plan_execution
from srack_tpu.io.wav import read_wav, write_wav


needs_native = pytest.mark.skipif(native.lib() is None,
                                  reason="native library unavailable")


def random_patch(rng, n_modules=10, n_edges=14):
    p = st.Patch(st.AudioConfig(channels=2))
    mods = [p.add("Mono Mixer") for _ in range(n_modules)]
    everyone = mods + [p.output]
    for _ in range(n_edges):
        src = rng.choice(mods)
        sink = rng.choice(everyone)
        free = [i for i, c in enumerate(p[sink].inputs) if c is None]
        if free:
            p.connect(src, 0, sink, free[0])
    return p


@needs_native
def test_native_planner_matches_python_randomized():
    rng = random.Random(7)
    for trial in range(60):
        p = random_patch(rng, n_modules=rng.randint(2, 14),
                         n_edges=rng.randint(0, 24))
        plan_py, broken_py = plan_execution(p, use_native=False)
        plan_nat, broken_nat = plan_execution(p, use_native=True)
        assert plan_nat == plan_py, f"trial {trial}"
        assert broken_nat == broken_py, f"trial {trial}"


@needs_native
def test_native_wav_decode_matches_python(tmp_path):
    sr = 22050
    x = (np.sin(np.linspace(0, 60, 1000)) * 0.9).astype(np.float32)
    for bits in (16, 32):
        path = tmp_path / f"t{bits}.wav"
        write_wav(path, np.stack([x, -x]), sr, bits=bits)
        with open(path, "rb") as f:
            data = f.read()
        nat = native.wav_decode_native(data)
        assert nat is not None
        got, got_sr = nat
        want, want_sr = read_wav(data)
        assert got_sr == want_sr == sr
        np.testing.assert_allclose(got, want, atol=0)


@needs_native
def test_native_interleave():
    planar = np.asarray([[0.0, 0.5, -1.2], [1.0, -0.5, 0.25]],
                        dtype=np.float32)
    out = native.interleave_i16(planar)
    assert out.dtype == np.int16
    assert list(out) == [0, 32767, 16384, -16384, -32768, 8192]
