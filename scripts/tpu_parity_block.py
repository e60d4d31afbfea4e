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


def check(name, patch, tol, n=N, state_raw=True):
    """``state_raw``: compare final-state leaves element-wise (valid when
    the block path stores the same representation).  Freeverb's kernel
    canonicalizes its delay rings (idx=0, buffer rotated -- semantically
    identical, not leaf-equal), so it gets a CONTINUATION check instead:
    render another n samples from both final states through the scan
    engine and compare the audio."""
    compiled = st.compile_patch(patch)
    params = farm_params(patch, V)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape),
                         compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), V)
    a_b, _, st_b = compiled._get_fn(n, True, "block")(
        params, state, keys, {})
    a_s, _, st_s = compiled._get_fn(n, True, "scan")(
        params, state, keys, {})
    d = float(np.abs(np.asarray(a_b) - np.asarray(a_s)).max())
    # final-state parity: the serial stage's ragged final block must not
    # step past sample n-1 (the round-4 unpadded-lane fix)
    ds = 0.0
    if state_raw:
        for lb, ls in zip(jax.tree.leaves(st_b), jax.tree.leaves(st_s)):
            ds = max(ds, float(np.abs(np.asarray(lb, np.float64)
                                      - np.asarray(ls, np.float64)).max()))
    else:
        scan_fn = compiled._get_fn(n, True, "scan")
        k2 = jax.random.split(jax.random.PRNGKey(1), V)
        c_b = np.asarray(scan_fn(params, st_b, k2, {})[0])
        c_s = np.asarray(scan_fn(params, st_s, k2, {})[0])
        ds = float(np.abs(c_b - c_s).max())
    ok = d <= tol and ds <= max(tol, 1e-5)
    kind = "state" if state_raw else "cont"
    log(f"[{name}] n={n} max|block-scan|={d:.3e} {kind}={ds:.3e} "
        f"{'OK' if ok else 'FAIL'}")
    return ok


if __name__ == "__main__":
    float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
    log(f"warmed; backend = {jax.default_backend()}")
    ok = True
    ok &= check("drums", drum_machine(CFG), 0.0)
    ok &= check("sampler", sampler_kit(CFG), 0.0)
    # Freeverb's kernel reorders f32 adds vs the scan path (documented);
    # tolerance matches tests/test_freeverb_kernel.py
    ok &= check("reverb", reverb_patch(CFG2), 2e-5, state_raw=False)
    # ragged n: neither a t_chunk (512) nor a T_CH (2048) multiple --
    # exercises the unpadded-lane tails in both Pallas kernels
    ok &= check("drums-ragged", drum_machine(CFG), 0.0, n=25000)
    ok &= check("sampler-ragged", sampler_kit(CFG), 0.0, n=25000)
    log("DEVICE PARITY: ALL OK" if ok else "DEVICE PARITY: FAIL")
    sys.exit(0 if ok else 1)
