"""Hardware check: ring_align correctness at odd lengths + reverb profile.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_ring.py
"""
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

log = lambda *a: print(*a, file=sys.stderr, flush=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
log("backend:", jax.default_backend(), jax.devices())

from srack_tpu.ops.ring_roll import _align_rows


def check(rows, length, seed):
    buf = jax.random.normal(jax.random.PRNGKey(seed), (rows, length),
                            jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(seed + 1), (rows,), 0,
                             length)
    out = np.asarray(_align_rows(buf, idx, False))
    want = np.stack([np.roll(np.asarray(buf)[r], -int(idx[r]))
                     for r in range(rows)])
    ok = np.array_equal(out, want)
    log(f"[align rows={rows} L={length}] correct={ok}")
    if not ok:
        bad = np.nonzero(np.any(out != want, axis=1))[0][:4]
        log("  first bad rows:", bad, "idx:", np.asarray(idx)[bad])
    return ok


def time_canonicalize():
    """All 24 Freeverb lines at 1024 voices: the once-per-render cost."""
    from srack_tpu.modules.freeverb import line_lengths
    cl, cr, al, ar = line_lengths(48000)
    lens = list(cl) + list(cr) + list(al) + list(ar)
    bufs = [jax.random.normal(jax.random.PRNGKey(i), (1024, L), jnp.float32)
            for i, L in enumerate(lens)]
    idxs = [jax.random.randint(jax.random.PRNGKey(99 + i), (1024,), 0, L)
            for i, L in enumerate(lens)]

    @jax.jit
    def run(bufs, idxs):
        outs = [_align_rows(b, i, False) for b, i in zip(bufs, idxs)]
        return sum(jnp.abs(o).max() for o in outs)

    t0 = time.perf_counter()
    float(run(bufs, idxs))
    log(f"canonicalize 24 lines x1024: compile={time.perf_counter()-t0:.1f}s")
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        float(run(bufs, idxs))
        best = min(best, time.perf_counter() - t0)
    log(f"canonicalize 24 lines x1024: {best*1e3:.1f}ms (incl. transport)")


def profile_reverb():
    import srack_tpu as st
    from srack_tpu.presets import farm_params, reverb_patch
    cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                         precision="fast")
    for n in (48000, 480000):
        patch = reverb_patch(cfg)
        compiled = st.compile_patch(patch)
        v = 1024
        params = farm_params(patch, v)
        state = jax.tree.map(lambda a: jnp.broadcast_to(a, (v,) + a.shape),
                             compiled.init_state())
        keys = jax.random.split(jax.random.PRNGKey(0), v)
        fn = compiled._get_fn(n, True, "block")
        meter = jax.jit(lambda p, s, k, d: jnp.abs(fn(p, s, k, d)[0]).max())
        t0 = time.perf_counter()
        peak = float(meter(params, state, keys, {}))
        c = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            peak = float(meter(params, state, keys, {}))
            best = min(best, time.perf_counter() - t0)
        log(f"[reverb n={n}] compile={c:.1f}s best={best*1e3:.1f}ms "
            f"rate={n*v/best/1e9:.3f}G peak={peak:.3f}")


for f in (lambda: check(32, 1214, 0), lambda: check(1024, 1642, 2),
          lambda: check(40, 245, 4), time_canonicalize, profile_reverb):
    try:
        f()
    except Exception:
        traceback.print_exc(file=sys.stderr)
