#!/usr/bin/env python
"""Batch render farm: generate an audio dataset from randomized patches.

BASELINE config 5: thousands of randomized subtractive voices of one
topology rendered in parallel (vmap on one chip; sharded over a mesh when
multiple devices are available), with per-voice NaN quarantine.

Usage: python examples/dataset_farm.py [n_voices] [seconds] [out_dir]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import pathlib
import sys

import jax
import numpy as np

import srack_tpu as st
from srack_tpu.io import write_wav
from srack_tpu.parallel import make_mesh, render_farm
from srack_tpu.presets import farm_params, subtractive_voice
from srack_tpu.utils.debug import quarantine_batch


def main(argv):
    n_voices = int(argv[1]) if len(argv) > 1 else 256
    seconds = float(argv[2]) if len(argv) > 2 else 1.0
    out_dir = pathlib.Path(argv[3]) if len(argv) > 3 else None

    cfg = st.AudioConfig(sample_rate=48000, channels=1, precision="fast")
    patch = subtractive_voice(cfg)
    params = farm_params(patch, n_voices, seed=42)
    n = int(seconds * cfg.sample_rate)

    mesh = make_mesh()
    audio, _, _ = render_farm(patch, n, params=params, mesh=mesh)
    audio, ok = quarantine_batch(audio)
    audio = np.asarray(audio)
    print(f"rendered {n_voices} voices x {seconds}s on "
          f"{mesh.devices.size} device(s); {int(np.asarray(ok).sum())} ok")

    if out_dir:
        out_dir.mkdir(parents=True, exist_ok=True)
        for i in range(min(n_voices, 16)):  # sample of the dataset
            write_wav(out_dir / f"voice_{i:04d}.wav", audio[i],
                      cfg.sample_rate)
        print(f"wrote {min(n_voices, 16)} example WAVs to {out_dir}")


if __name__ == "__main__":
    main(sys.argv)
