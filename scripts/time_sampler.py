"""Time the sampler/drums configs on TPU (round-3 item 1 validation)."""
import sys, time
import jax, jax.numpy as jnp
import srack_tpu as st
from srack_tpu.presets import drum_machine, farm_params, sampler_kit
log = lambda *a: print(*a, file=sys.stderr, flush=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1, precision="fast")
for name, patch, n, v in (("sampler x1024 x2s", sampler_kit(cfg), 96000, 1024),
                          ("drums x1024 x1s", drum_machine(cfg), 48000, 1024)):
    compiled = st.compile_patch(patch)
    params = farm_params(patch, v)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (v,) + a.shape), compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), v)
    fn = compiled._get_fn(n, True, "block")
    meter = jax.jit(lambda p, s, k, d: jnp.abs(fn(p, s, k, d)[0]).max())
    t0 = time.perf_counter(); peak = float(meter(params, state, keys, {})); c = time.perf_counter()-t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); peak = float(meter(params, state, keys, {})); best = min(best, time.perf_counter()-t0)
    log(f"[{name}] compile={c:.1f}s best={best*1e3:.1f}ms rate={n*v/best/1e9:.3f}G/s peak={peak:.3f}")
