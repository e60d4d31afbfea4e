#!/usr/bin/env python
"""Round-5: packed-audio train step on TPU -- single dispatch and 8-step
scan vs the unpacked baselines (44.4 ms / 16.3 ms-per-step).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_train_packed.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import srack_tpu as st
from srack_tpu.presets import subtractive_voice
from srack_tpu.utils.train import (SoundMatcher, batched_train_step,
                                   multi_train_step)
from srack_tpu.utils.losses import waveform_l2

log = lambda *a: print(*a, file=sys.stderr, flush=True)
V, NT, K = 1024, 48000, 32


def main():
    t0 = time.perf_counter()
    float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
    log(f"warmup {time.perf_counter()-t0:.1f}s")
    cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                         precision="fast")
    patch = subtractive_voice(cfg)
    compiled = st.compile_patch(patch)
    sm = SoundMatcher(patch, NT)
    ts = sm.init()
    targets = jnp.zeros((V, cfg.channels, NT), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(2), V)
    for name, packed in (("packed", True),):
        try:
            step = jax.jit(batched_train_step(
                compiled, optax.adam(1e-3), NT, loss_fn=waveform_l2,
                fast=True, packed=packed))
            t0 = time.perf_counter()
            tr, opt, loss = step(ts["train"], ts["frozen"],
                                 optax.adam(1e-3).init(ts["train"]),
                                 targets, keys)
            l0 = float(loss)
            log(f"[{name} 1-step] compile {time.perf_counter()-t0:.0f}s "
                f"loss={l0:.4f}")
            best = 1e9
            for _ in range(5):
                t0 = time.perf_counter()
                tr, opt, loss = step(tr, ts["frozen"], opt, targets, keys)
                float(loss)
                best = min(best, time.perf_counter() - t0)
            log(f"[{name} 1-step] best={best*1e3:.1f}ms "
                f"(device ~{best*1e3-28:.1f})")
            mstep = jax.jit(multi_train_step(
                compiled, optax.adam(1e-3), NT, K, loss_fn=waveform_l2,
                fast=True, packed=packed))
            t0 = time.perf_counter()
            tr2, opt2, losses = mstep(ts["train"], ts["frozen"],
                                      optax.adam(1e-3).init(ts["train"]),
                                      targets, keys)
            lK = float(losses[-1])
            log(f"[{name} {K}-step] compile {time.perf_counter()-t0:.0f}s "
                f"loss={lK:.4f}")
            best = 1e9
            for _ in range(5):
                t0 = time.perf_counter()
                tr2, opt2, losses = mstep(tr2, ts["frozen"], opt2,
                                          targets, keys)
                float(losses[-1])
                best = min(best, time.perf_counter() - t0)
            log(f"[{name} {K}-step] {best/K*1e3:.1f}ms/step "
                f"({V*NT/(best/K)/1e9:.2f}G fwd+bwd)")
        except Exception as e:
            log(f"[{name}] FAILED: {e!r}"[:500])


if __name__ == "__main__":
    main()
