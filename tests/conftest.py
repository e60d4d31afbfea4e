"""Test configuration.

Tests run on CPU with 8 virtual devices (multi-chip sharding paths are
validated on a host mesh; real-TPU execution is exercised by bench.py), and
with x64 enabled so the ``exact`` precision mode can mirror the reference's
f64 oscillator phase / f64 freeverb core.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU integration rewrites jax_platforms to "axon,cpu" at import,
# ignoring the JAX_PLATFORMS env var -- force CPU via the config instead.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu"


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_jit_mappings_between_modules():
    """Free compiled executables after each test module.

    Every jitted program the suite compiles holds LLVM JIT code pages; one
    process running the full suite accumulates >65k mmap regions and the
    CPU client segfaults when it hits the kernel's vm.max_map_count
    (default 65530).  Dropping the jit caches lets the loaded executables
    (and their code mappings) be garbage-collected; cross-module cache
    hits are rare, so this costs little recompilation.
    """
    yield
    import gc

    jax.clear_caches()
    try:
        from srack_tpu import compiler as _compiler

        _compiler._COMPILE_CACHE.clear()
    except Exception:
        pass
    gc.collect()
