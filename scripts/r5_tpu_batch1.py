#!/usr/bin/env python
"""Round-5 TPU batch 1: freeverb 3D-pack A/B (single 6 s segment) then
the sampler intra-kernel attribution (r5_smp_parts variants), one process
to amortize the compile-service warmup.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_tpu_batch1.py
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

log = lambda *a: print(*a, file=sys.stderr, flush=True)


def main():
    t0 = time.perf_counter()
    float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
    log(f"warmup {time.perf_counter()-t0:.1f}s")

    import r5_fv_pack1 as fv
    for name, k_c, pack in (
        ("k1 packed3d 6s", 1, True),
        ("k2 packed3d 6s", 2, True),
        ("k2 unpacked 6s", 2, False),
    ):
        try:
            fv.bench_kernel(name, k_c, pack)
        except Exception as e:
            log(f"[{name}] FAILED: {e!r}"[:600])

    import r5_smp_parts as smp
    smp.main()


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo/scripts")
    main()
