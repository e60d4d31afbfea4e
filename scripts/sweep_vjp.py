"""Sweep the Pallas-VJP backward's (t_chunk, bwd_unroll) at the train
bench shape (round-3 verdict item 6: 8-step train <= 15 ms/step at
1024 x 48k).  Interleaved rounds, min per variant; one grad step per
dispatch so the ~28 ms transport is visible but constant.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_vjp.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import optax

log = lambda *a: print(*a, file=sys.stderr, flush=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import srack_tpu as st
from srack_tpu.ops import fused_vjp
from srack_tpu.presets import subtractive_voice
from srack_tpu.utils.train import SoundMatcher

V, NT = 1024, 48000
cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                     precision="fast")
patch = subtractive_voice(cfg)
compiled = st.compile_patch(patch)
sm = SoundMatcher(patch, NT)
ts = sm.init()
targets = jnp.zeros((V, cfg.channels, NT), jnp.float32)
keys = jax.random.split(jax.random.PRNGKey(2), V)
opt = optax.adam(1e-3)

float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
log("warmed")

# round-5: the two-level recompute (one stored state row per bwd_unroll
# group) lifts the per-sample-store VMEM ceiling that killed t_chunk=256
VARIANTS = [(128, 8), (256, 8), (256, 16), (512, 8), (512, 16)]

merge = SoundMatcher._merge

meters = {}
for (tc, bu) in VARIANTS:
    render = fused_vjp.make_fused_vjp(compiled, NT, t_chunk=tc,
                                      bwd_unroll=bu)

    def step(train, frozen, opt_state, tgt, ks, _render=render):
        def loss_fn(tr):
            params = merge(tr, frozen)
            params_b = jax.tree.map(
                lambda a: jnp.broadcast_to(a[None], (V,) + a.shape), params)
            st0 = jax.tree.map(
                lambda a: jnp.broadcast_to(a, (V,) + a.shape),
                compiled.init_state())
            audio, _, _ = _render(params_b, st0, ks, {})
            return jnp.mean((audio - tgt) ** 2)
        loss, g = jax.value_and_grad(loss_fn)(train)
        upd, opt_state = opt.update(g, opt_state, train)
        return optax.apply_updates(train, upd), opt_state, loss

    fn = jax.jit(step)
    t0 = time.perf_counter()
    try:
        tr, os_, loss = fn(ts["train"], ts["frozen"], opt.init(ts["train"]),
                           targets, keys)
        l0 = float(loss)
    except Exception as e:
        # e.g. (256, *) per-sample store scratch exceeds the 16 MB VMEM
        log(f"tc={tc} bu={bu}: FAILED {type(e).__name__}: {str(e)[:160]}")
        continue
    log(f"tc={tc} bu={bu}: compile={time.perf_counter()-t0:.1f}s "
        f"loss={l0:.4f}")
    meters[(tc, bu)] = fn

best = {k: 1e9 for k in meters}
order = list(meters)
for r in range(6):
    for k in (order if r % 2 == 0 else order[::-1]):
        fn = meters[k]
        t0 = time.perf_counter()
        tr, os_, loss = fn(ts["train"], ts["frozen"],
                           opt.init(ts["train"]), targets, keys)
        float(loss)
        dt = time.perf_counter() - t0
        best[k] = min(best[k], dt)
        log(f"round {r} tc,bu={k}: {dt*1e3:.1f}ms")
for k, b in sorted(best.items(), key=lambda kv: kv[1]):
    log(f"BEST tc,bu={k}: {b*1e3:.1f}ms "
        f"(device ~{(b-0.028)*1e3:.1f}ms, "
        f"{V*NT/b/1e9:.2f}G through fwd+bwd incl transport)")
