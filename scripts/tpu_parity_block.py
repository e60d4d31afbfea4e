"""Device parity of the block engine's serial-stage kernel: render the
drums / sampler / reverb presets on TPU (block engine, real Mosaic
kernels) vs the scan engine and compare.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_parity_block.py
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

import srack_tpu as st
from srack_tpu.presets import (drum_machine, farm_params, reverb_patch,
                               sampler_kit)

log = lambda *a: print(*a, file=sys.stderr, flush=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V, N = 8, 24576
CFG = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                     precision="fast")
CFG2 = st.AudioConfig(sample_rate=48000, block_size=1024, channels=2,
                      precision="fast")


def check(name, patch, tol):
    compiled = st.compile_patch(patch)
    params = farm_params(patch, V)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape),
                         compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), V)
    a_b = np.asarray(compiled._get_fn(N, True, "block")(
        params, state, keys, {})[0])
    a_s = np.asarray(compiled._get_fn(N, True, "scan")(
        params, state, keys, {})[0])
    d = float(np.abs(a_b - a_s).max())
    ok = d <= tol
    log(f"[{name}] max|block-scan|={d:.3e} {'OK' if ok else 'FAIL'}")
    return ok


if __name__ == "__main__":
    float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
    log(f"warmed; backend = {jax.default_backend()}")
    ok = True
    ok &= check("drums", drum_machine(CFG), 0.0)
    ok &= check("sampler", sampler_kit(CFG), 0.0)
    # Freeverb's kernel reorders f32 adds vs the scan path (documented);
    # tolerance matches tests/test_freeverb_kernel.py
    ok &= check("reverb", reverb_patch(CFG2), 2e-5)
    log("DEVICE PARITY: ALL OK" if ok else "DEVICE PARITY: FAIL")
    sys.exit(0 if ok else 1)
