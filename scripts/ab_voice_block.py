"""How much does the block engine's XLA pre-stage cost vs the fused
kernel for the same register-math modules?  Times the subtractive voice
(headline patch: osc+ADSR+Moog+VCA) on engine="block" vs "fused" at
10 s x 1024 voices, interleaved.  The gap bounds what absorbing
register-safe pre modules into the serial Pallas stage can recover for
the reverb/drums/sampler configs (whose non-kernel baseline is the same
machinery).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_voice_block.py
"""
import sys
import time

import jax
import jax.numpy as jnp

import srack_tpu as st
from srack_tpu.presets import farm_params, subtractive_voice

log = lambda *a: print(*a, file=sys.stderr, flush=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V, N = 1024, 480000
cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                     precision="fast")

float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))

patch = subtractive_voice(cfg)
compiled = st.compile_patch(patch)
params = farm_params(patch, V)
state = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape),
                     compiled.init_state())
keys = jax.random.split(jax.random.PRNGKey(0), V)

meters = {}
for engine in ("block", "fused"):
    fn = compiled._get_fn(N, True, engine)
    meter = jax.jit(lambda p, s, k, d, _f=fn: jnp.abs(_f(p, s, k, d)[0]).max())
    t0 = time.perf_counter()
    peak = float(meter(params, state, keys, {}))
    log(f"{engine}: compile={time.perf_counter()-t0:.1f}s peak={peak:.4f}")
    meters[engine] = meter

best = {"block": 1e9, "fused": 1e9}
for r in range(5):
    order = ("block", "fused") if r % 2 == 0 else ("fused", "block")
    for engine in order:
        t0 = time.perf_counter()
        float(meters[engine](params, state, keys, {}))
        dt = time.perf_counter() - t0
        best[engine] = min(best[engine], dt)
        log(f"round {r} {engine}: {dt*1e3:.1f}ms")
for engine, b in best.items():
    log(f"BEST {engine}: {b*1e3:.1f}ms  rate={V*N/b/1e9:.2f}G "
        f"(device ~{(b-0.025)*1e2:.1f}ms/s-audio)")
