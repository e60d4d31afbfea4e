"""Decompose the train-step time (round-3 item 6): fwd kernel vs vjp fwd
vs full grad vs full step."""
import sys, time
import jax, jax.numpy as jnp
import optax
import srack_tpu as st
from srack_tpu.presets import subtractive_voice
from srack_tpu.utils.train import SoundMatcher, batched_train_step
log = lambda *a: print(*a, file=sys.stderr, flush=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1, precision="fast")
patch = subtractive_voice(cfg)
compiled = st.compile_patch(patch)
V, N = 1024, 48000
params = st.replicate_params(patch.params(), V)
state = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape), compiled.init_state())
keys = jax.random.split(jax.random.PRNGKey(2), V)
targets = jnp.zeros((V, cfg.channels, N), jnp.float32)

def timeit(name, fn, *args):
    t0 = time.perf_counter(); out = fn(*args)
    red = jax.tree.leaves(out)[0]
    float(jnp.abs(jnp.asarray(red, jnp.float32)).max()); c = time.perf_counter()-t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); out = fn(*args)
        red = jax.tree.leaves(out)[0]
        float(jnp.abs(jnp.asarray(red, jnp.float32)).max())
        best = min(best, time.perf_counter()-t0)
    log(f"[{name}] compile={c:.1f}s best={best*1e3:.1f}ms")
    return best

# (a) plain fused forward
fwd = compiled._get_fn(N, True, "fused")
meter_fwd = jax.jit(lambda p,s,k: jnp.abs(fwd(p,s,k,{})[0]).max())
timeit("fused fwd", meter_fwd, params, state, keys)

# (b) vjp-forward (custom_vjp primal incl. boundary outputs + tiling)
gr = compiled.grad_render_fn(N, batched=True)
meter_vf = jax.jit(lambda p,s,k: jnp.abs(gr(p,s,k,{})[0]).max())
timeit("vjp fwd (primal)", meter_vf, params, state, keys)

# (c) value_and_grad of L2 loss through the vjp (no optimizer)
def loss_of(p, s, k, tgt):
    audio, _, _ = gr(p, s, k, {})
    return jnp.mean((audio - tgt) ** 2)
vg = jax.jit(jax.value_and_grad(loss_of))
timeit("value_and_grad", lambda p,s,k,t: vg(p,s,k,t)[1], params, state, keys, targets)

# (d) full batched train step (shared params + adam)
sm = SoundMatcher(patch, N)
ts = sm.init()
opt = optax.adam(1e-3)
step = jax.jit(batched_train_step(compiled, opt, N, fast=True))
ostate = opt.init(ts["train"])
def full(tr, fr, os_, tgt, ks):
    tr2, os2, loss = step(tr, fr, os_, tgt, ks)
    return loss
timeit("full step", full, ts["train"], ts["frozen"], ostate, targets, keys)
