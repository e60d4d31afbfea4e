#!/usr/bin/env python
"""Benchmark harness.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.md north star): rendered audio samples/sec/chip
at 48 kHz for 1,000 concurrent subtractive voices (BASELINE config 2
topology, batched with vmap) on one chip.  Baseline target: 4.8e9
samples/s (= 1000 voices x 100x real time x 48k).

Extra per-config numbers go to stderr for human eyes; stdout carries only
the JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

import srack_tpu as st
from srack_tpu.presets import (farm_params, feedback_patch, sequencer_patch,
                               sine_patch, subtractive_voice)

BASELINE_SAMPLES_PER_SEC = 4.8e9


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def time_render(compiled, n, params, state, keys, batched, repeats=3):
    fn = compiled._get_fn(n, batched)
    drv = {}
    t0 = time.perf_counter()
    out = fn(params, state, keys, drv)
    jax.tree.map(lambda a: a.block_until_ready(), out[0])
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(params, state, keys, drv)
        jax.tree.map(lambda a: a.block_until_ready(), out[0])
        best = min(best, time.perf_counter() - t0)
    return best, compile_s


def bench_config(name, patch, n, voices, repeats=3):
    compiled = st.compile_patch(patch)
    if voices == 1:
        params = compiled.default_params
        state = compiled.init_state()
        keys = jax.random.PRNGKey(0)
        batched = False
    else:
        params = farm_params(patch, voices)
        state = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (voices,) + a.shape),
            compiled.init_state())
        keys = jax.random.split(jax.random.PRNGKey(0), voices)
        batched = True
    best, compile_s = time_render(compiled, n, params, state, keys, batched,
                                  repeats)
    total = n * voices
    rate = total / best
    rtf = rate / patch.config.sample_rate
    log(f"[{name}] voices={voices} n={n} compile={compile_s:.1f}s "
        f"best={best * 1e3:.1f}ms rate={rate / 1e6:.1f}M samples/s "
        f"aggregate_rtf={rtf:.0f}x")
    return rate


def main() -> None:
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                         precision="fast")

    # headline: 1000 subtractive voices, 1 second of audio each
    headline = bench_config("subtractive x1000",
                            subtractive_voice(cfg), 48000, 1000)

    # secondary configs (stderr only)
    try:
        bench_config("sine x1", sine_patch(cfg), 48000, 1)
        bench_config("feedback x256", feedback_patch(cfg), 12000, 256)
        bench_config("sequencer x64", sequencer_patch(cfg), 12000, 64)
    except Exception as e:  # secondary benches must not kill the headline
        log(f"secondary bench failed: {e!r}")

    print(json.dumps({
        "metric": "rendered_audio_samples_per_sec_per_chip",
        "value": headline,
        "unit": "samples/s",
        "vs_baseline": headline / BASELINE_SAMPLES_PER_SEC,
    }), flush=True)


if __name__ == "__main__":
    main()
