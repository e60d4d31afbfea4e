#!/usr/bin/env python
"""Benchmark harness.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.md north star): rendered audio samples/sec/chip —
1,000 concurrent subtractive voices (BASELINE config 2 topology) rendering
10 s of 48 kHz audio each on one chip, on the fused Pallas voice engine.
Baseline target: 4.8e9 samples/s (= 1000 voices x 100x real time x 48k).

Extra per-config numbers go to stderr; stdout carries only the JSON line.
Timing forces a device fetch inside the timed region (on this transport
``block_until_ready`` does not reliably block) and includes the full
dispatch+fetch round trip.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

import srack_tpu as st
from srack_tpu.presets import (drum_machine, farm_params, feedback_patch,
                               reverb_patch, sampler_kit, sequencer_patch,
                               sine_patch, subtractive_voice)

BASELINE_SAMPLES_PER_SEC = 4.8e9

# (name, n, rate_G, peak) per config that completed, replayed as a compact
# stderr recap immediately before the stdout JSON line: the driver keeps
# only the last ~2000 chars of output, and an OOM dump mid-run must not
# push the secondary numbers out of that window (round-4 VERDICT item 3).
RECAP: list[str] = []


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench_config(name, patch, n, voices, engine="auto", repeats=5,
                 segment=None):
    # 5 repeats, min taken: inter-run noise on the shared device is ±3 ms
    # and occasionally tens of ms when another tenant's compile drains
    # (CLAUDE.md timing notes); extra repeats cost ~0.5 s total.
    compiled = st.compile_patch(patch)
    params = farm_params(patch, voices)
    state = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (voices,) + a.shape),
        compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), voices)
    fn = compiled._get_fn(n, True, engine if engine != "auto" else
                          ("fused" if compiled.fused_eligible() else "block"),
                          segment=segment)
    # one dispatch per timed call: the on-device peak reduction both forces
    # execution and is the fetch (a separate abs(out).max() dispatch costs
    # ~45 ms extra of transport on this tunnel -- measured 7.0 vs 10.4 G
    # samples/s on the headline config)
    meter = jax.jit(lambda p, s, k, d: jnp.abs(fn(p, s, k, d)[0]).max())
    t0 = time.perf_counter()
    peak = float(meter(params, state, keys, {}))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        peak = float(meter(params, state, keys, {}))
        best = min(best, time.perf_counter() - t0)
    rate = n * voices / best
    rtf = rate / patch.config.sample_rate
    log(f"[{name}] voices={voices} n={n} compile={compile_s:.1f}s "
        f"best={best * 1e3:.1f}ms rate={rate / 1e9:.3f}G samples/s "
        f"aggregate_rtf={rtf:.0f}x peak={peak:.3f}")
    # 0.2% headroom: the sine preset is a deliberately full-scale sine and
    # the fast-mode polynomial sine overshoots |1| by ~1e-5; the assert is
    # for wrong mixer gains (dB-scale clipping), not ulp overshoot
    if not peak <= 1.002:
        raise ValueError(f"[{name}] output clips: peak={peak:.3f} > 1.0 "
                         "-- preset gains are wrong")
    # recap only after the clip assert: a rejected config (or a retried
    # ladder rung) must not land in the driver-captured tail as a
    # completed result
    RECAP.append(f"{name}: {rate / 1e9:.2f}G (n={n} v={voices} "
                 f"peak={peak:.2f})")
    return rate


def main() -> None:
    # persistent compile cache: the headline program takes minutes to build
    # through the remote compile service; re-runs should be instant
    import os
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/srack_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    # the axon tunnel has transient outages where backend init either raises
    # UNAVAILABLE or hangs inside the PJRT client (uninterruptible from
    # Python).  Probe in a killable subprocess first; only init in-process
    # once a probe succeeds, so a short outage delays the run instead of
    # hanging or killing it.
    import subprocess

    def _wait_for_backend(attempts=5, per_attempt_s=240, wait_s=60):
        for a in range(attempts):
            try:
                r = subprocess.run(
                    [sys.executable, "-c",
                     "import jax; jax.devices()"],
                    timeout=per_attempt_s, capture_output=True)
                if r.returncode == 0:
                    return
                err = r.stderr.decode(errors="replace").strip()[-200:]
            except subprocess.TimeoutExpired:
                err = f"probe hung >{per_attempt_s}s"
            log(f"backend probe {a + 1}/{attempts} failed: {err}")
            if a + 1 < attempts:
                time.sleep(wait_s)
        raise RuntimeError("TPU backend unavailable after retries")

    _wait_for_backend()
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    # warm the remote compile service + device transport with a trivial
    # program so the headline's measured compile is the kernel's own cost:
    # the FIRST compile in a fresh process absorbs service handshake and
    # any queued work from other tenants (measured 192-700 s of warmup vs
    # 8 s for the same kernel compiled second, scripts/sweep_compile.py
    # vs scripts/cold32.py)
    t0 = time.perf_counter()
    float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
    log(f"compile-service warmup: {time.perf_counter() - t0:.1f}s")
    cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                         precision="fast")

    # headline: BASELINE spec asks for >=1000 concurrent subtractive voices;
    # we render 1024 = one full (8, 128) VPU lane tile.  A 1000-voice batch
    # pads to 1024 lanes anyway and the [:1000] output slice then forces a
    # ~6 GB layout copy that XLA otherwise fuses away (measured 110.7 vs
    # 92.7 ms for identical kernel work).  30 s renders amortize the
    # ~28 ms per-call transport; longer OOMs HBM at this voice count.
    # Degrade to shorter renders rather than dying without a JSON line.
    headline = 0.0
    for n_try in (1440000, 960000, 480000, 48000):
        try:
            headline = bench_config(f"subtractive x1024 x{n_try // 48000}s",
                                    subtractive_voice(cfg), n_try, 1024)
            break
        except Exception as e:
            log(f"[headline n={n_try}] failed: {e!r}")

    # secondary configs (stderr only); failures must not kill the headline.
    # Each config starts at a 30 s render (same transport amortization as
    # the headline: the ~28 ms/call dispatch+fetch is fixed, so longer
    # renders measure the engine, not the tunnel).  Block-engine configs
    # whose whole-render [V, n] lanes OOM HBM at 30 s run device-side
    # segmented (render(..., segment=): one dispatch, lax.scan over
    # segments with carried state, live intermediates bounded to one
    # segment -- compiler._make_segmented); the ladder then degrades the
    # segment before it ever shortens the render.
    for name, patch, ns, v in (
        ("sine x1024", sine_patch(cfg), ((1440000, None), (480000, None)),
         1024),
        # 4 s renders cut the transport fraction below ~15% (the 1 s farm
        # was 45% fixed dispatch+fetch, 2 s still ~30%); [16384, 1, 192000]
        # f32 output = 12.6 GB HBM -- ladder degrades to 2 s if that OOMs
        ("farm x16384", subtractive_voice(cfg),
         ((192000, None), (96000, None)), 16384),
        # the patch is fully serial (cross-FM + filter feedback), so
        # compute is only ~90 cycles/sample
        ("feedback x1024", feedback_patch(cfg),
         ((1440000, None), (480000, None)), 1024),
        # sequencers are register-safe select chains -> fused engine
        ("sequencer x1024 (fused)", sequencer_patch(cfg),
         ((1440000, None), (480000, None)), 1024),
        # sample playback keeps this on the block engine (waveform reads)
        ("drums x1024 (block engine)", drum_machine(cfg),
         ((1440000, 480000), (1440000, 240000), (480000, None)), 1024),
        # real-length samples: three 48,000-frame waveforms through the
        # fused position+windowed-gather kernel pair (ops/sample_kernel +
        # ops/sample_gather)
        ("sampler x1024 (48k-frame samples)", sampler_kit(cfg),
         ((1440000, 480000), (1440000, 240000), (480000, None)), 1024),
        # Freeverb's 12 delay lines per channel: whole-Freeverb VMEM kernel
        # (fused input-gain/wet-dry shell) + in-VMEM ring canonicalization.
        # segment=288000 is a multiple of the kernel chunk (t_c=1152): no
        # per-segment XLA tail chunk (503 vs 524 ms at 480k, r4_fv_seg.py)
        ("reverb x1024 (block engine)", reverb_patch(cfg),
         ((1440000, 288000), (1440000, 480000), (480000, None)), 1024),
    ):
        for n_try, seg in ns:
            seg_tag = f" seg={seg // 48000}s" if seg else ""
            try:
                bench_config(f"{name} x{n_try // 48000}s{seg_tag}", patch,
                             n_try, v, segment=seg)
                break
            except Exception as e:
                log(f"[{name} n={n_try} seg={seg}] failed: {e!r}")

    # training-step benchmark (stderr): Pallas fwd+bwd gradient step
    try:
        import optax
        from srack_tpu.utils.train import SoundMatcher, batched_train_step
        patch = subtractive_voice(cfg)
        compiled = st.compile_patch(patch)
        v, nt = 1024, 48000
        sm = SoundMatcher(patch, nt)
        ts = sm.init()
        # packed=True: loss in the kernels' tiled layout skips the
        # [V, n] <-> tiled transposes around the custom_vjp (~8.5 of
        # ~17 ms device per step at this shape, round-5 device trace)
        step = jax.jit(batched_train_step(compiled, optax.adam(1e-3), nt,
                                          fast=True, packed=True))
        targets = jnp.zeros((v, cfg.channels, nt), jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(2), v)
        t0 = time.perf_counter()
        tr, opt, loss = step(ts["train"], ts["frozen"],
                             optax.adam(1e-3).init(ts["train"]),
                             targets, keys)
        l0 = float(loss)
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            tr, opt, loss = step(tr, ts["frozen"], opt, targets, keys)
            l0 = float(loss)
            best = min(best, time.perf_counter() - t0)
        log(f"[train x{v} (Pallas fwd+bwd)] grad step {best * 1e3:.0f}ms "
            f"({v * nt / best / 1e9:.2f}G samples/s through fwd+bwd, "
            f"compile {compile_s:.0f}s, loss {l0:.4f})")

        # production-shaped measurement: K steps per dispatch (a real
        # training loop scans steps; the ~28 ms/call transport of this
        # tunnel would otherwise be billed to every step -- measured
        # single-step is 28 transport + ~17 compute)
        from srack_tpu.utils.train import multi_train_step
        K = 32
        mstep = jax.jit(multi_train_step(compiled, optax.adam(1e-3), nt, K,
                                         fast=True, packed=True))
        t0 = time.perf_counter()
        tr2, opt2, losses = mstep(ts["train"], ts["frozen"],
                                  optax.adam(1e-3).init(ts["train"]),
                                  targets, keys)
        lK = float(losses[-1])
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            tr2, opt2, losses = mstep(tr2, ts["frozen"], opt2, targets, keys)
            lK = float(losses[-1])
            best = min(best, time.perf_counter() - t0)
        per = best / K
        log(f"[train x{v} ({K}-step scan)] {per * 1e3:.1f}ms/step "
            f"({v * nt / per / 1e9:.2f}G samples/s through fwd+bwd, "
            f"compile {compile_s:.0f}s, loss {lK:.4f})")
        RECAP.append(f"train {K}-step: {per * 1e3:.1f}ms/step "
                     f"({v * nt / per / 1e9:.2f}G fwd+bwd)")
    except Exception as e:
        log(f"[train] failed: {e!r}")

    # exact-mode rate (stderr): the oracle-fidelity precision ("exact" =
    # f64 phase/reverb mirroring the reference's per-module dtypes,
    # matching oracle.py ~1e-6) has a stated rate, not just fast mode.
    # x64 is enabled HERE, after every fast-mode config has run: fast
    # mode must trace without x64 (conftest forces it only for tests).
    try:
        jax.config.update("jax_enable_x64", True)
        cfg_x = st.AudioConfig(sample_rate=48000, block_size=1024,
                               channels=1, precision="exact")
        # segment= rungs first: the 10 s whole-render scan OOMs on
        # intermediates, which is exactly what device-side segmentation
        # bounds (compiler._make_segmented) -- the oracle-fidelity mode
        # deserves a transport-amortized number (round-4 VERDICT item 4)
        for n_try, seg in ((480000, 96000), (480000, 48000),
                           (96000, None), (48000, None)):
            seg_tag = f" seg={seg // 48000}s" if seg else ""
            try:
                bench_config(
                    f"exact x1024 (block engine) "
                    f"x{n_try / 48000:g}s{seg_tag}",
                    subtractive_voice(cfg_x), n_try, 1024, engine="block",
                    segment=seg)
                break
            except Exception as e:
                log(f"[exact n={n_try}] failed: {e!r}")
    except Exception as e:
        log(f"[exact] failed: {e!r}")

    # compact recap: every config's rate in the driver-captured tail
    log("=== recap (all configs) ===")
    for line in RECAP:
        log("  " + line)
    print(json.dumps({
        "metric": "rendered_audio_samples_per_sec_per_chip",
        "value": headline,
        "unit": "samples/s",
        "vs_baseline": headline / BASELINE_SAMPLES_PER_SEC,
    }), flush=True)


if __name__ == "__main__":
    main()
