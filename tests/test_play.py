"""engine.play() -- the supported audio-device sink (srack_tpu.rt).

The reference's cpal AudioEngine (src/main.rs:24-101) is the analogue:
open the default output, fill it block-by-block, glitch on late blocks.
Here the device is optional (sounddevice); the pacing + accounting
contract is testable with the wav/null sinks.
"""

import numpy as np
import pytest

import srack_tpu as st

CFG = st.AudioConfig(sample_rate=2400, block_size=256, channels=1,
                     precision="fast")


def _patch():
    p = st.Patch(CFG)
    osc = p.add("Oscillator", val=-1.0)
    p.connect(osc, "Sine", p.output, 0)
    return p


def test_play_null_sink_accounting():
    stats = st.play(_patch(), seconds=1.0, sink="null")
    assert isinstance(stats, st.PlayStats)
    # ~4x real-time headroom on one CPU core: zero underruns expected
    assert stats.underruns == 0, (stats.underruns, stats.worst_headroom_s)
    assert stats.blocks == int(1.0 / (CFG.block_size / CFG.sample_rate)) - 2
    assert stats.ok


def test_play_wav_sink_writes_file(tmp_path):
    out = tmp_path / "played.wav"
    stats = st.play(_patch(), seconds=1.0, sink="wav", out_path=str(out))
    assert out.exists()
    from srack_tpu.io import read_wav
    data, sr = read_wav(str(out))
    assert sr == CFG.sample_rate
    n_blocks = int(1.0 / (CFG.block_size / CFG.sample_rate))
    assert data.shape[-1] == n_blocks * CFG.block_size
    assert float(np.abs(data).max()) > 0.01


def test_play_batched_monitor_mix(tmp_path):
    out = tmp_path / "batch.wav"
    stats = st.play(_patch(), seconds=0.5, sink="wav", voices=4,
                    out_path=str(out))
    assert stats.blocks >= 1
    from srack_tpu.io import read_wav
    data, sr = read_wav(str(out))  # reader returns channel 0, 1-D
    assert data.ndim == 1 and data.shape[0] > 0


def test_play_device_raises_when_unavailable():
    try:
        import sounddevice  # noqa: F401
        pytest.skip("sounddevice present; device sink would really open")
    except ImportError:
        pass
    with pytest.raises(Exception):
        st.play(_patch(), seconds=0.1, sink="device")
