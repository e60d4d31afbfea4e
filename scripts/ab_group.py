"""Interleaved A/B: Sample group-stacking (the kit's three 48k-frame
players as ONE stacked play_rows call) vs per-module dispatch, on the
sampler-kit config at bench shape [1024 x 96000].

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_group.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import srack_tpu as st
from srack_tpu.compiler import CompiledPatch
from srack_tpu.presets import farm_params, sampler_kit

log = lambda *a: print(*a, file=sys.stderr, flush=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V, N = 1024, 96000
ROUNDS = 5
CFG = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                     precision="fast")


def prepare(grouped: bool):
    patch = sampler_kit(CFG)
    compiled = CompiledPatch(patch)  # bypass the topology cache: each
    prog = compiled.block_program()  # variant needs its own BlockProgram
    if grouped:
        assert prog._groups, "expected a Sample group in the kit"
    else:
        prog._groups, prog._grouped = {}, set()
    params = farm_params(patch, V)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape),
                         compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), V)
    run = prog.make_run(N)
    meter = jax.jit(lambda p, s, k: jnp.abs(run(p, s, k, {})[0]).max())
    raw = jax.jit(lambda p, s, k: run(p, s, k, {})[0])
    return meter, raw, (params, state, keys)


def main():
    variants = {}
    for name, grouped in (("grouped", True), ("permodule", False)):
        t0 = time.perf_counter()
        variants[name] = prepare(grouped)
        m, _, args = variants[name]
        float(m(*args))
        log(f"built {name} ({time.perf_counter()-t0:.0f}s)")

    # bit-equality check between variants
    a = np.asarray(variants["grouped"][1](*variants["grouped"][2]))
    b = np.asarray(variants["permodule"][1](*variants["permodule"][2]))
    mism = int((a != b).sum())
    log(f"mismatch count: {mism} / {a.size}")

    best = {k: 1e9 for k in variants}
    for r in range(ROUNDS):
        for k, (m, _, args) in variants.items():
            t0 = time.perf_counter()
            float(m(*args))
            best[k] = min(best[k], time.perf_counter() - t0)
    for k, t in best.items():
        log(f"[{k}] t={t*1e3:.1f}ms rate={V*N/t/1e9:.2f}G/s")


if __name__ == "__main__":
    main()
