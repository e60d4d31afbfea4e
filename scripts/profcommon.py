"""Shared constants/helpers for the TPU profiling dev scripts.

One home for the measured platform facts so the tools can't drift apart:

* ``CLOCK_HZ``    -- v5e VPU clock used to convert times to cycles/sample.
* ``TRANSPORT_S`` -- fixed dispatch+fetch overhead per jitted call through
  this environment's device tunnel (measured ~28 ms even for ``x + 1``);
  subtracted before converting to cycles.
* ``make_meter``  -- the one-dispatch metering pattern: fusing the
  abs-max fetch into the render call keeps the timed region to a single
  dispatch (a separate reduction dispatch adds ~45 ms of transport).
"""

import jax
import jax.numpy as jnp

CLOCK_HZ = 0.94e9   # TPU v5 lite
TRANSPORT_S = 0.028


def make_meter(fn):
    """Wrap a render fn so one timed call = one dispatch + forced fetch."""
    return jax.jit(lambda p, s, k, d: jnp.abs(fn(p, s, k, d)[0]).max())


def cycles_per_sample(best_s: float, n: int) -> float:
    return (best_s - TRANSPORT_S) * CLOCK_HZ / n
