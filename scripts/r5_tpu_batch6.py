#!/usr/bin/env python
"""Round-5 TPU batch 6:
1. reverb config at segment=720000 (625 chunks x t_c, 2 segments --
   fewer boundaries than the 288000 rung; never tried);
2. device profile of one 8-step train scan step (fwd kernel vs bwd
   kernel vs XLA glue);
3. extra VJP sweep points (bwd_unroll 32, t_chunk 64).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_tpu_batch6.py
"""
import collections
import glob
import sys
import time

sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import srack_tpu as st
from srack_tpu.ops import fused_vjp
from srack_tpu.presets import reverb_patch, subtractive_voice
from srack_tpu.utils.train import SoundMatcher
import r5_kit_parts

log = r5_kit_parts.log
V, NT = 1024, 48000


def train_profile_and_sweep():
    cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                         precision="fast")
    patch = subtractive_voice(cfg)
    compiled = st.compile_patch(patch)
    sm = SoundMatcher(patch, NT)
    ts = sm.init()
    targets = jnp.zeros((V, cfg.channels, NT), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(2), V)
    opt = optax.adam(1e-3)
    merge = SoundMatcher._merge

    best_by = {}
    for tc, bu in ((128, 8), (128, 32), (64, 16)):
        try:
            render = fused_vjp.make_fused_vjp(compiled, NT, t_chunk=tc,
                                              bwd_unroll=bu)

            def step(train, frozen, opt_state, tgt, ks, _render=render):
                def loss_fn(tr):
                    params = merge(tr, frozen)
                    params_b = jax.tree.map(
                        lambda a: jnp.broadcast_to(a[None],
                                                   (V,) + a.shape), params)
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
            _, _, l0 = fn(ts["train"], ts["frozen"], opt.init(ts["train"]),
                          targets, keys)
            float(l0)
            log(f"tc={tc} bu={bu} compile={time.perf_counter()-t0:.0f}s")
            best = 1e9
            for _ in range(5):
                t0 = time.perf_counter()
                _, _, l0 = fn(ts["train"], ts["frozen"],
                              opt.init(ts["train"]), targets, keys)
                float(l0)
                best = min(best, time.perf_counter() - t0)
            best_by[(tc, bu)] = best
            log(f"tc={tc} bu={bu}: best={best*1e3:.1f}ms "
                f"(device ~{best*1e3-28:.1f})")
            if (tc, bu) == (128, 8):
                outdir = "/tmp/r5_train_trace"
                with jax.profiler.trace(outdir):
                    _, _, l0 = fn(ts["train"], ts["frozen"],
                                  opt.init(ts["train"]), targets, keys)
                    float(l0)
                files = glob.glob(outdir + "/**/*.xplane.pb",
                                  recursive=True)
                for f in sorted(files)[-1:]:
                    pd = jax.profiler.ProfileData.from_serialized_xspace(
                        open(f, "rb").read())
                    for plane in pd.planes:
                        if "TPU" not in plane.name:
                            continue
                        tot = collections.Counter()
                        for line in plane.lines:
                            for ev in line.events:
                                tot[ev.name.split(" = ")[0]] += \
                                    ev.duration_ns
                        log("== train step top ops")
                        for nm, ns in tot.most_common(10):
                            log(f"  {ns/1e6:9.2f} ms  {nm[:90]}")
        except Exception as e:
            log(f"tc={tc} bu={bu} FAILED: {e!r}"[:300])


def main():
    t0 = time.perf_counter()
    float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
    log(f"warmup {time.perf_counter()-t0:.1f}s")
    cfg2 = st.AudioConfig(sample_rate=48000, block_size=1024, channels=2,
                          precision="fast")
    try:
        r5_kit_parts.bench("reverb 30s seg720k", reverb_patch(cfg2),
                           1440000, 720000)
    except Exception as e:
        log(f"[reverb seg720k] FAILED: {e!r}"[:300])
    train_profile_and_sweep()


if __name__ == "__main__":
    main()
