#!/usr/bin/env python
"""Round-5: why is the in-config Sample kernel 71.7 ms per [1024 x 480k]
call when the standalone probe measures ~20.7 ms device?  Replay the
ACTUAL pattern-sequencer gate lanes through the standalone kernel:

* render the kit once with probes on the three pattern rows (1 voice,
  10 s) and count rising edges per row;
* run sample_kernel.play_rows on each row's gate broadcast to 1024
  voices with the kit's table/params;
* compare against the synthetic every-24000 trigger gate (~20.7 ms).

If the real gates reproduce ~70 ms, the slowdown is gate-content (tier
predicates); if they stay ~20 ms, it is program structure around the
in-config call.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_smp_real_gates.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import srack_tpu as st
from srack_tpu.ops import sample_kernel
from srack_tpu.presets import sampler_kit

log = lambda *a: print(*a, file=sys.stderr, flush=True)
V, N, K = 1024, 480000, 48000


def time_rows(name, gate_np, table_np, repeats=5):
    gate = jnp.asarray(np.broadcast_to(gate_np[None], (V, N)).copy())
    tbl = jnp.asarray(np.broadcast_to(table_np[None], (V, K)).copy())

    @jax.jit
    def run(gate, tbl):
        outs = sample_kernel.play_rows(
            gate, None, tbl,
            jnp.full((V,), 1.0, jnp.float32),
            jnp.zeros((V,), jnp.float32),
            jnp.zeros((V,), bool), jnp.zeros((V,), bool),
            jnp.full((V,), K, jnp.int32))
        return jnp.abs(outs[0]).max()

    t0 = time.perf_counter()
    float(run(gate, tbl))
    log(f"[{name}] compile+first {time.perf_counter()-t0:.1f}s")
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(gate, tbl))
        best = min(best, time.perf_counter() - t0)
    log(f"[{name}] best={best*1e3:.2f}ms (device ~{best*1e3-28:.1f}ms)")


def main():
    t0 = time.perf_counter()
    float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
    log(f"warmup {time.perf_counter()-t0:.1f}s")

    cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                         precision="fast")
    patch = sampler_kit(cfg)
    pat = next(h for h in patch if h.name == "pat")
    compiled = st.compile_patch(patch,
                                probes=[(patch.handle(pat.id), str(r))
                                        for r in range(3)])
    audio, probes, _ = compiled.render(N, engine="block")
    rows = [np.asarray(v).reshape(-1) for v in probes.values()]
    t = np.arange(48000) / 48000.0
    rng = np.random.default_rng(7)
    kick = (np.sin(2 * np.pi * (45.0 + 85.0 * np.exp(-18.0 * t)) * t)
            * np.exp(-6.0 * t)).astype(np.float32)
    for r, g in enumerate(rows):
        edges = int(((g[1:] > 0) & (g[:-1] <= 0)).sum())
        high = float((g > 0).mean())
        log(f"row {r}: rising_edges={edges} high_frac={high:.3f}")
        time_rows(f"row{r} real gate", g.astype(np.float32), kick)
    gate_syn = np.zeros(N, np.float32)
    gate_syn[::24000] = 1.0
    time_rows("synthetic 24k gate", gate_syn, kick)


if __name__ == "__main__":
    main()
