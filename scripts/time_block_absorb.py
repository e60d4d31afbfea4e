"""Post-absorption timing of the block-engine bench configs (drums,
sampler, reverb) at the bench's 30 s render shape, plus 10 s fallback.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/time_block_absorb.py
"""
import sys
import time

import jax
import jax.numpy as jnp

import srack_tpu as st
from srack_tpu.presets import (drum_machine, farm_params, reverb_patch,
                               sampler_kit)

log = lambda *a: print(*a, file=sys.stderr, flush=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                     precision="fast")
cfg2 = st.AudioConfig(sample_rate=48000, block_size=1024, channels=2,
                      precision="fast")

float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))


def bench(name, patch, ns, v=1024):
    for n in ns:
        try:
            compiled = st.compile_patch(patch)
            params = farm_params(patch, v)
            state = jax.tree.map(
                lambda a: jnp.broadcast_to(a, (v,) + a.shape),
                compiled.init_state())
            keys = jax.random.split(jax.random.PRNGKey(0), v)
            fn = compiled._get_fn(n, True, "block")
            meter = jax.jit(
                lambda p, s, k, d, _f=fn: jnp.abs(_f(p, s, k, d)[0]).max())
            t0 = time.perf_counter()
            peak = float(meter(params, state, keys, {}))
            c = time.perf_counter() - t0
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                peak = float(meter(params, state, keys, {}))
                best = min(best, time.perf_counter() - t0)
            log(f"[{name} x{n // 48000}s] compile={c:.1f}s "
                f"best={best * 1e3:.1f}ms rate={n * v / best / 1e9:.3f}G/s "
                f"(device ~{(best - 0.028) / (n / 48000) * 1e3:.1f}ms/s) "
                f"peak={peak:.3f}")
            return
        except Exception as e:
            log(f"[{name} n={n}] failed: {e!r}")


bench("drums", drum_machine(cfg), (1440000, 480000))
bench("sampler", sampler_kit(cfg), (1440000, 480000))
bench("reverb", reverb_patch(cfg2), (1440000, 480000))
log("DONE")
