"""Round-3 measurement batch: sampler/drums (RB32 gather), sequencer
(log-tree lookup), train-step decomposition."""
import sys, time
import jax, jax.numpy as jnp
import srack_tpu as st
from srack_tpu.presets import (drum_machine, farm_params, sampler_kit,
                               sequencer_patch, subtractive_voice)
log = lambda *a: print(*a, file=sys.stderr, flush=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1, precision="fast")

def bench(name, patch, n, v, engine):
    try:
        compiled = st.compile_patch(patch)
        params = farm_params(patch, v)
        state = jax.tree.map(lambda a: jnp.broadcast_to(a, (v,) + a.shape), compiled.init_state())
        keys = jax.random.split(jax.random.PRNGKey(0), v)
        fn = compiled._get_fn(n, True, engine)
        meter = jax.jit(lambda p, s, k, d: jnp.abs(fn(p, s, k, d)[0]).max())
        t0 = time.perf_counter(); peak = float(meter(params, state, keys, {})); c = time.perf_counter()-t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); peak = float(meter(params, state, keys, {})); best = min(best, time.perf_counter()-t0)
        log(f"[{name}] compile={c:.1f}s best={best*1e3:.1f}ms rate={n*v/best/1e9:.3f}G/s peak={peak:.3f}")
    except Exception as e:
        log(f"[{name}] FAILED: {e!r}")

bench("sampler x1024 x2s RB32", sampler_kit(cfg), 96000, 1024, "block")
bench("drums x1024 x1s RB32", drum_machine(cfg), 48000, 1024, "block")
bench("sequencer x1024 x10s logtree", sequencer_patch(cfg), 480000, 1024, "fused")

# train decomposition
try:
    import optax
    from srack_tpu.utils.train import SoundMatcher, batched_train_step
    patch = subtractive_voice(cfg)
    compiled = st.compile_patch(patch)
    V, N = 1024, 48000
    params = st.replicate_params(patch.params(), V)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape), compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(2), V)
    targets = jnp.zeros((V, cfg.channels, N), jnp.float32)

    def timeit(name, fn, *args):
        t0 = time.perf_counter(); out = fn(*args)
        float(jnp.abs(jnp.asarray(jax.tree.leaves(out)[0], jnp.float32)).max())
        c = time.perf_counter()-t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); out = fn(*args)
            float(jnp.abs(jnp.asarray(jax.tree.leaves(out)[0], jnp.float32)).max())
            best = min(best, time.perf_counter()-t0)
        log(f"[{name}] compile={c:.1f}s best={best*1e3:.1f}ms")

    fwd = compiled._get_fn(N, True, "fused")
    timeit("train/a fused fwd", jax.jit(lambda p,s,k: jnp.abs(fwd(p,s,k,{})[0]).max()), params, state, keys)
    gr = compiled.grad_render_fn(N, batched=True)
    timeit("train/b vjp fwd primal", jax.jit(lambda p,s,k: jnp.abs(gr(p,s,k,{})[0]).max()), params, state, keys)
    def loss_of(p, s, k, tgt):
        audio, _, _ = gr(p, s, k, {})
        return jnp.mean((audio - tgt) ** 2)
    vg = jax.jit(jax.value_and_grad(loss_of))
    timeit("train/c value_and_grad", lambda p,s,k,t: vg(p,s,k,t)[1], params, state, keys, targets)
    sm = SoundMatcher(patch, N)
    ts = sm.init()
    opt = optax.adam(1e-3)
    step = jax.jit(batched_train_step(compiled, opt, N, fast=True))
    ostate = opt.init(ts["train"])
    timeit("train/d full step", lambda tr,fr,os_,t,k: step(tr,fr,os_,t,k)[2], ts["train"], ts["frozen"], ostate, targets, keys)
except Exception as e:
    log(f"[train] FAILED: {e!r}")
log("DONE")
