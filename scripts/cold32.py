"""Fresh-process cold-compile measurement for one unroll depth."""
import sys, time
import jax, jax.numpy as jnp
import srack_tpu as st
from srack_tpu.ops import fused
from srack_tpu.presets import farm_params, subtractive_voice
log = lambda *a: print(*a, file=sys.stderr, flush=True)
unroll = int(sys.argv[1])
V, N = 1024, 1440000
CFG = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1, precision="fast")
patch = subtractive_voice(CFG)
compiled = st.compile_patch(patch)
params = farm_params(patch, V)
state = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape), compiled.init_state())
keys = jax.random.split(jax.random.PRNGKey(0), V)
# warm the compile service + device with a tiny unrelated program first so
# the measured compile is the kernel's own cost, not process warmup
float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))).block_until_ready())
fn = jax.jit(fused.make_fused_render(compiled, N, unroll=unroll))
meter = jax.jit(lambda p, s, k: jnp.abs(fn(p, s, k, {})[0]).max())
t0 = time.perf_counter()
peak = float(meter(params, state, keys))
compile_s = time.perf_counter() - t0
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    peak = float(meter(params, state, keys))
    best = min(best, time.perf_counter() - t0)
log(f"[unroll={unroll} fresh] compile={compile_s:.1f}s best={best*1e3:.1f}ms rate={V*N/best/1e9:.2f}G/s peak={peak:.3f}")
