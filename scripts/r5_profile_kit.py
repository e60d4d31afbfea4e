#!/usr/bin/env python
"""Round-5: capture a device trace of the kit config (10 s, no segment)
and print the top ops by total duration — name the ~25 ms/s-audio the
sampler config spends outside its three ~2 ms/s Sample kernels.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_profile_kit.py
"""
import collections
import glob
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import srack_tpu as st
from srack_tpu.presets import farm_params, sampler_kit

log = lambda *a: print(*a, file=sys.stderr, flush=True)
V, N = 1024, 480000


def main():
    t0 = time.perf_counter()
    float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
    log(f"warmup {time.perf_counter()-t0:.1f}s")
    cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                         precision="fast")
    patch = sampler_kit(cfg)
    compiled = st.compile_patch(patch)
    params = farm_params(patch, V)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape),
                         compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), V)
    fn = compiled._get_fn(N, True, "block")
    meter = jax.jit(lambda p, s, k, d: jnp.abs(fn(p, s, k, d)[0]).max())
    float(meter(params, state, keys, {}))
    log("compiled; tracing")
    outdir = "/tmp/r5_kit_trace"
    with jax.profiler.trace(outdir):
        for _ in range(2):
            float(meter(params, state, keys, {}))
    files = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
    log(f"trace files: {files}")
    for f in files:
        pd = jax.profiler.ProfileData.from_serialized_xspace(
            open(f, "rb").read())
        for plane in pd.planes:
            tot = collections.Counter()
            cnt = collections.Counter()
            for line in plane.lines:
                for ev in line.events:
                    name = ev.name
                    tot[name] += ev.duration_ns
                    cnt[name] += 1
            if not tot:
                continue
            log(f"== plane: {plane.name} (total {sum(tot.values())/1e6:.1f} "
                f"ms over {sum(cnt.values())} events)")
            for name, ns in tot.most_common(35):
                log(f"  {ns/1e6:9.2f} ms  x{cnt[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
