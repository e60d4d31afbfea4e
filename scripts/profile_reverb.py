"""Attribute reverb block-path cost: full vs rotation-skipped vs kernel-only.
(round-3 item 2: reverb bench 0.53 G; the isolated kernel runs 1.02 G --
where does the other half go?)"""
import sys, time
import jax, jax.numpy as jnp
import srack_tpu as st
from srack_tpu import modules
from srack_tpu.modules import freeverb as fvmod
from srack_tpu.presets import farm_params, reverb_patch
log = lambda *a: print(*a, file=sys.stderr, flush=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

n, voices = 48000, 1024
cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1, precision="fast")

def timeit(label):
    import srack_tpu.compiler as comp
    comp._COMPILE_CACHE.clear()
    patch = reverb_patch(cfg)
    compiled = st.compile_patch(patch)
    compiled._block_prog = None
    params = farm_params(patch, voices)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (voices,) + a.shape), compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), voices)
    fn = compiled._get_fn(n, True, "block")
    meter = jax.jit(lambda p, s, k, d: jnp.abs(fn(p, s, k, d)[0]).max())
    t0 = time.perf_counter(); peak = float(meter(params, state, keys, {})); c = time.perf_counter()-t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); peak = float(meter(params, state, keys, {})); best = min(best, time.perf_counter()-t0)
    log(f"[{label}] compile={c:.1f}s best={best*1e3:.1f}ms rate={n*voices/best/1e9:.3f}G peak={peak:.3f}")

timeit("full (baseline)")
fvmod._ASSUME_RING_ALIGNED = True
timeit("rotation skipped")
fvmod._ASSUME_RING_ALIGNED = False
