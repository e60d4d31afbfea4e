"""DMA floor at the 10 s bench shape, transport-amortized: K full
read+write passes over [1024, 480000] f32 inside ONE dispatch (a scan
whose carry is the array itself, so no pass can be hoisted), for XLA and
for a trivial Pallas lane-stream copy.  Per-pass time = (total - 28 ms
transport) / K; bandwidth = 2 * 1.97 GB / per-pass.

The 1 s probes in probe_fv_floor.py are ~100% transport (22-28 ms total
vs the ~28 ms fixed dispatch+fetch) and say nothing about bandwidth.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_floor10s.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

log = lambda *a: print(*a, file=sys.stderr, flush=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V, VB = 1024, 8
N = 480000
K = 8
GB_PASS = 2 * V * N * 4 / 1e9  # read + write per pass
rng = np.random.default_rng(0)

float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))


def timeit(meter, *args, reps=5):
    t0 = time.perf_counter()
    float(meter(*args))
    c = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(meter(*args))
        best = min(best, time.perf_counter() - t0)
    return c, best


def report(name, c, best):
    per = (best - 0.028) / K
    log(f"[{name}] compile={c:.1f}s total={best * 1e3:6.1f}ms "
        f"per-pass={per * 1e3:6.1f}ms ({GB_PASS / per:6.1f}GB/s rw)")


big = jnp.asarray(rng.normal(size=(V, N)).astype(np.float32))

# XLA: x <- x * 1.0000001 + tiny, K times
@jax.jit
def xla_loop(m):
    def body(x, _):
        return x * jnp.float32(1.0000001) + jnp.float32(1e-12), None
    out, _ = jax.lax.scan(body, m, None, length=K)
    return jnp.abs(out).max()

c, best = timeit(xla_loop, big)
report("xla  k-pass", c, best)

for t_c in (1024, 4096):
    n_chunks = N // t_c

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 1.0000001 + 1e-12

    def lane_spec():
        return pl.BlockSpec((VB, t_c), lambda vt, tt: (vt, tt),
                            memory_space=pltpu.VMEM)

    def one_pass(x):
        return pl.pallas_call(
            kernel, grid=(V // VB, n_chunks),
            in_specs=[lane_spec()], out_specs=lane_spec(),
            out_shape=jax.ShapeDtypeStruct((V, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(x)

    @jax.jit
    def pl_loop(m, _p=one_pass):
        def body(x, _):
            return _p(x), None
        out, _ = jax.lax.scan(body, m, None, length=K)
        return jnp.abs(out).max()

    c, best = timeit(pl_loop, big)
    inv = (V // VB) * n_chunks
    per = (best - 0.028) / K
    report(f"plas t_c={t_c:5d}", c, best)
    log(f"    ({per / inv * 1e6:5.2f}us/invocation, {inv} invocations/pass)")

log("DONE")
