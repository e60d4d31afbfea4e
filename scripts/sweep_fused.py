#!/usr/bin/env python
"""Sweep fused-kernel (unroll, t_chunk) for throughput AND compile time.

The kernel body is inlined unroll times and compiled per (shape, unroll,
t_chunk); larger unroll buys cross-sample ILP but multiplies Mosaic's
scheduling work (compile time) and VMEM pressure.  Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_fused.py
"""
import sys
import time

import jax
import jax.numpy as jnp

import srack_tpu as st
from srack_tpu.ops import fused
from srack_tpu.presets import subtractive_voice
from profcommon import cycles_per_sample, make_meter

# no persistent cache: we want true compile cost per config
V, N = 1024, 1440000
CFG = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                     precision="fast")

CONFIGS = [(32, 256), (8, 512), (64, 256), (32, 256)]


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}  V={V} N={N}",
          file=sys.stderr)
    patch = subtractive_voice(CFG)
    compiled = st.compile_patch(patch)
    params = st.replicate_params(patch.params(), V)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape),
                         compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), V)
    for unroll, t_chunk in CONFIGS:
        # auto_chunk=False: measure the labeled config, not the divisor
        # search's remap of it
        fn = jax.jit(fused.make_fused_render(
            compiled, N, t_chunk=t_chunk, unroll=unroll, auto_chunk=False))
        meter = make_meter(fn)
        t0 = time.perf_counter()
        float(meter(params, state, keys, {}))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(meter(params, state, keys, {}))
            best = min(best, time.perf_counter() - t0)
        cyc = cycles_per_sample(best, N)
        print(f"[unroll={unroll:2d} t_chunk={t_chunk:4d}] "
              f"compile={compile_s:6.1f}s best={best * 1e3:7.1f}ms "
              f"cycles/sample~{cyc:5.1f}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
