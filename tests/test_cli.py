"""CLI (app shell) tests — python -m srack_tpu.

The reference's app shell is main.rs; here the shell is the CLI in
srack_tpu/__main__.py.  Run in-process (main(argv)) to avoid re-importing
JAX per test.
"""

import io
import sys

import numpy as np
import pytest

from srack_tpu.__main__ import main
from srack_tpu.io.wav import read_wav


def run_cli(argv, capsys):
    rc = main(argv)
    out = capsys.readouterr().out
    return rc, out


def test_modules_listing(capsys):
    rc, out = run_cli(["modules"], capsys)
    assert rc == 0
    for name in ("Oscillator", "Moog Filter", "ADSR", "Grid Sequencer",
                 "Freeverb", "Add"):
        assert name in out
    assert "Sawtooth" in out  # port labels shown


def test_presets_listing(capsys):
    rc, out = run_cli(["presets"], capsys)
    assert rc == 0
    for name in ("sine", "subtractive", "sequencer", "feedback", "drums"):
        assert name in out


def test_render_preset_to_wav(tmp_path, capsys):
    out_path = tmp_path / "sine.wav"
    rc, out = run_cli(["render", "sine", "-o", str(out_path),
                       "--samples", "4096"], capsys)
    assert rc == 0
    assert out_path.exists()
    audio, sr = read_wav(str(out_path))
    assert sr == 48000
    assert audio.shape[-1] == 4096
    # 440 Hz sine at full scale
    assert 0.9 < np.abs(audio).max() <= 1.0


def test_render_srk_roundtrip(tmp_path, capsys):
    from srack_tpu.io.srk import write_srk
    from srack_tpu.presets import subtractive_voice

    srk = tmp_path / "voice.srk"
    write_srk(subtractive_voice(), str(srk))
    out_path = tmp_path / "voice.wav"
    rc, _ = run_cli(["render", str(srk), "-o", str(out_path),
                     "--samples", "2048"], capsys)
    assert rc == 0
    audio, _ = read_wav(str(out_path))
    assert audio.shape[-1] == 2048


def test_render_with_override_keeps_wiring(tmp_path, capsys):
    """Config overrides go through set_audio_config, whose reference-parity
    Output disconnect (output.rs:39-44) must not silence the CLI render."""
    out_path = tmp_path / "sine44.wav"
    rc, _ = run_cli(["render", "sine", "-o", str(out_path),
                     "--sample-rate", "44100", "--samples", "4096"], capsys)
    assert rc == 0
    audio, sr = read_wav(str(out_path))
    assert sr == 44100
    assert np.abs(audio).max() > 0.5  # regression: was all-zero


def test_render_channel_upscale_mirrors(tmp_path, capsys):
    """--channels 2 on a mono preset mirrors channel 0 (the presets' own
    stereo convention) instead of writing a silent right channel."""
    import struct
    out_path = tmp_path / "sine2ch.wav"
    rc, _ = run_cli(["render", "sine", "-o", str(out_path),
                     "--channels", "2", "--samples", "2048"], capsys)
    assert rc == 0
    raw = out_path.read_bytes()
    n_ch = struct.unpack("<H", raw[22:24])[0]
    assert n_ch == 2
    pcm = np.frombuffer(raw[44:], dtype="<i2").reshape(-1, 2)
    assert np.abs(pcm[:, 1]).max() > 1000  # right channel audible
    np.testing.assert_array_equal(pcm[:, 0], pcm[:, 1])


def test_info_shows_plan_and_feedback(capsys):
    rc, out = run_cli(["info", "feedback"], capsys)
    assert rc == 0
    assert "config: 48000 Hz" in out
    assert "plan:" in out
    assert "feedback edges" in out  # cross-FM pair has a broken edge
    assert "connections" in out


def test_unknown_source_errors(capsys):
    with pytest.raises(SystemExit):
        main(["render", "no_such_preset_xyz"])
