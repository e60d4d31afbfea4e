#!/usr/bin/env python
"""Round-5 TPU batch 3: block configs with the clock-exclusion
farm_params fix (expect kit ~4G, drums up), then the freeverb
intra-kernel attribution (r5_fv_parts2 variants).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_tpu_batch3.py
"""
import sys

sys.path.insert(0, "/root/repo/scripts")

import r5_kit_parts
import r5_fv_parts2
import srack_tpu as st
from srack_tpu.presets import drum_machine, reverb_patch, sequencer_patch


def main():
    import time, jax, jax.numpy as jnp
    t0 = time.perf_counter()
    float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
    r5_kit_parts.log(f"warmup {time.perf_counter()-t0:.1f}s")
    cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                         precision="fast")
    cfg2 = st.AudioConfig(sample_rate=48000, block_size=1024, channels=2,
                          precision="fast")
    from r5_kit_parts import bench, sampler_kit
    for name, patch, n, seg in (
        ("kit 30s seg480k FIXEDCLK", sampler_kit(cfg), 1440000, 480000),
        ("drums 30s seg480k FIXEDCLK", drum_machine(cfg), 1440000, 480000),
        ("seq 30s FIXEDCLK", sequencer_patch(cfg), 1440000, None),
        ("reverb 30s seg288k FIXEDCLK", reverb_patch(cfg2), 1440000,
         288000),
    ):
        try:
            bench(name, patch, n, seg)
        except Exception as e:
            r5_kit_parts.log(f"[{name}] FAILED: {e!r}"[:800])
    r5_fv_parts2.main()


if __name__ == "__main__":
    main()
