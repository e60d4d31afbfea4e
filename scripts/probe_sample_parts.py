"""Micro-profile the Sample._block pipeline pieces at farm scale
([1024 x 96000]) to size a fused whole-Sample kernel.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_sample_parts.py
"""
import sys
import time

import jax
import jax.numpy as jnp

log = lambda *a: print(*a, file=sys.stderr, flush=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from srack_tpu.ops.basic import (block_transitions, fast_cumsum,
                                 forward_fill, transition_init)
from srack_tpu.ops import sample_gather

V, N, K = 1024, 96000, 48000
key = jax.random.PRNGKey(0)
gate = (jax.random.uniform(key, (V, N)) > 0.99).astype(jnp.float32)
cvl = jax.random.normal(jax.random.PRNGKey(1), (V, N)) * 0.1
tbl = jax.random.normal(jax.random.PRNGKey(2), (K,), jnp.float32)
idx = jnp.minimum((jnp.cumsum(jnp.abs(cvl), axis=1)).astype(jnp.int32),
                  K - 1)
last = jnp.zeros((V,), jnp.float32)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    float(jnp.abs(jnp.asarray(jax.tree.leaves(f(*args))[0],
                              jnp.float32)).max())
    c = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.abs(jnp.asarray(jax.tree.leaves(f(*args))[0],
                                  jnp.float32)).max())
        best = min(best, time.perf_counter() - t0)
    log(f"[{name}] compile={c:.1f}s best={best*1e3:.1f}ms "
        f"(device ~{best*1e3-28:.1f}ms)")


timeit("noop x+1", lambda g: g + 1.0, gate)
timeit("transitions", lambda g: jax.vmap(
    lambda gr: block_transitions(transition_init(), gr))(g)[1], gate)
timeit("cumsum", lambda c: jax.vmap(
    lambda r: fast_cumsum(r, axis=0))(c), cvl)
timeit("ffill", lambda c, g: jax.vmap(
    lambda cr, gr: forward_fill(cr, gr > 0.5, axis=0)[0])(c, g), cvl, gate)
timeit("exp2-rate+clip (elementwise)",
       lambda c: jnp.clip(jnp.exp2(c) * 0.5, 0.0, 1e6), cvl)
timeit("gather", lambda t, i: jax.vmap(
    lambda ir: sample_gather.gather_1d(t, ir))(i), tbl, idx)


# the full Sample block via the module (vmapped like the block engine)
from srack_tpu.config import AudioConfig
from srack_tpu.modules.sample import SAMPLE

cfg = AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                  precision="fast")
statics, params = SAMPLE.make(cfg, samples=jax.device_get(tbl),
                              wav_sample_rate=48000)
state0 = SAMPLE.init_state(cfg, statics)
state = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape), state0)
paramsb = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape),
                       jax.tree.map(jnp.asarray, params))


def full_block(pb, st, g, c):
    def one(p, s, gr, cr):
        return SAMPLE.block(cfg, statics, p, s, (gr, cr), None, N)[1][0]
    return jax.vmap(one)(pb, st, g, c)


timeit("full Sample._block", full_block, paramsb, state, gate, cvl)
log("DONE")
