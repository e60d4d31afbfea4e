"""Sweep the windowed gather's slab-sharing factor G and window width WA
(ops/sample_gather) on real-length tables — the per-row dynamic slab reads
dominate the long-table path, and G blocks share one [WA, 128] slab fetch
per row, so larger G amortizes fetches while larger WA keeps rates <
(WA-1)*128/(G*128) covered without the residual loop.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_gather_gw.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

log = lambda *a: print(*a, file=sys.stderr, flush=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from srack_tpu.ops import sample_gather

V, N, K = 1024, 96000, 48000
rng = np.random.default_rng(0)
tbl = rng.normal(size=(V, K)).astype(np.float32)
# drums-like: staggered restarts at rate 1.0 (the const-rate bench shape)
period = 9000 + (np.arange(V)[:, None] % 7) * 1000
idx_mono = ((np.arange(N)[None] % period) % K).astype(np.int32)
# pitch-wobble: rates 0.5..2 (the windowed path's design envelope)
rates = np.exp2(rng.uniform(-1, 1, (V, 1)))
idx_rate = ((np.arange(N)[None] * rates) % (K - 1)).astype(np.int32)

tbl_j = jnp.asarray(tbl)


def timeit(name, idx):
    idx_j = jnp.asarray(idx)
    f = jax.jit(lambda t, i: jnp.abs(
        sample_gather._gather_rows(t, i, False)).max())
    t0 = time.perf_counter()
    float(f(tbl_j, idx_j))
    c = time.perf_counter() - t0
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        float(f(tbl_j, idx_j))
        best = min(best, time.perf_counter() - t0)
    log(f"[{name}] compile={c:.1f}s best={best*1e3:.1f}ms "
        f"rate={V*N/best/1e9:.2f}G/s")


# warm the compile service
float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))

for g, wa in ((2, 5), (4, 7), (4, 9), (8, 11)):
    sample_gather.G = g
    sample_gather.WA = wa
    # jit caches key on args, not module globals -- force a retrace
    sample_gather._gather_rows.clear_cache()
    try:
        got = np.asarray(sample_gather._gather_rows(
            tbl_j[:8], jnp.asarray(idx_rate[:8]), False))
        want = np.take_along_axis(tbl[:8], idx_rate[:8], axis=1)
        np.testing.assert_array_equal(got, want)
        timeit(f"G={g} WA={wa} mono", idx_mono)
        timeit(f"G={g} WA={wa} rates", idx_rate)
    except Exception as e:
        log(f"[G={g} WA={wa}] FAILED: {e!r}")
sample_gather.G, sample_gather.WA = 2, 5
log("DONE")
