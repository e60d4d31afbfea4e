#!/usr/bin/env python
"""Differentiable sound matching: fit a patch's parameters to a target.

Renders a "mystery" subtractive voice, then optimises a fresh voice's
cutoff/resonance/envelope/pitch by gradient descent through the fully
fused render program (multi-scale spectral loss).  The capability the
pure-JAX engine adds over the reference (cf. DiffMoog, PAPERS.md).

Usage: python examples/sound_match.py [steps]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import sys

import jax
import jax.numpy as jnp
import optax

import srack_tpu as st
from srack_tpu.presets import subtractive_voice
from srack_tpu.utils.train import SoundMatcher


def main(argv):
    steps = int(argv[1]) if len(argv) > 1 else 60
    cfg = st.AudioConfig(sample_rate=16000, channels=1, precision="fast")
    n = 8000

    # mystery target
    target_patch = subtractive_voice(cfg, note=-0.6, cutoff=0.55, res=0.7)
    target, _, _ = st.render(target_patch, n)

    # fit from defaults; train only filter + oscillator pitch
    patch = subtractive_voice(cfg)
    trainable_ids = {i.id for i in patch if i.name in ("vco", "vcf", "env")}
    sm = SoundMatcher(
        patch, n, optimizer=optax.adam(2e-2),
        trainable=lambda mid, name: mid in trainable_ids)
    ts = sm.init()
    for i in range(steps):
        ts, loss = sm.step(ts, target)
        if i % 10 == 0 or i == steps - 1:
            print(f"step {i:3d}  loss {float(loss):.4f}")
    fitted = sm.params(ts)
    vcf = [i.id for i in patch if i.name == "vcf"][0]
    print("fitted cutoff:", float(fitted[vcf]["freq"]),
          " (target 0.55)")
    print("fitted res:   ", float(fitted[vcf]["res"]), " (target 0.7)")


if __name__ == "__main__":
    main(sys.argv)
