#!/usr/bin/env python
"""Round-5 TPU batch 4: ring-comb freeverb kernel -- standalone 6 s
(vs 15.94/16.23 pre-ring) and the full reverb config 30 s (vs 2.70G).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_tpu_batch4.py
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")
jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import srack_tpu as st
from srack_tpu.presets import reverb_patch
import r5_kit_parts
import r5_fv_pack1


def main():
    t0 = time.perf_counter()
    float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
    r5_kit_parts.log(f"warmup {time.perf_counter()-t0:.1f}s")
    try:
        r5_fv_pack1.bench_kernel("ring k2 6s", 2, False)
    except Exception as e:
        r5_kit_parts.log(f"[ring k2 6s] FAILED: {e!r}"[:800])
    cfg2 = st.AudioConfig(sample_rate=48000, block_size=1024, channels=2,
                          precision="fast")
    try:
        r5_kit_parts.bench("reverb 30s seg288k RING", reverb_patch(cfg2),
                           1440000, 288000)
    except Exception as e:
        r5_kit_parts.log(f"[reverb RING] FAILED: {e!r}"[:800])


if __name__ == "__main__":
    main()
