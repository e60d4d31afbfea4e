"""Numerical-health guards: the functional analogue of race/denormal
defence (SURVEY.md §5).

JAX is functional, so there are no data races to detect; the failure
modes are NaN/Inf blowups (the reference clamps filter state explicitly
against denormals, src/synth/filter.rs:85-91 -- our ladder does the same)
and silent recompilation storms.  This module provides:

* :func:`check_finite` -- debug renders that raise on NaN/Inf with the
  offending module wires named (via probes on every port);
* :func:`quarantine_batch` -- per-voice error isolation for render farms:
  a NaN voice is zeroed and flagged instead of poisoning the mix bus
  (SURVEY.md §5 failure detection);
* :func:`recompile_guard` -- context manager asserting no new compilations
  happen inside (catches topology-hash cache misses).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np


class NonFiniteAudio(RuntimeError):
    pass


def check_finite(patch, n_samples: int, **kwargs):
    """Render with a probe on every output port and raise naming the first
    module whose output goes non-finite."""
    from ..compiler import compile_patch

    probes = []
    for inst in patch:
        n_out = inst.mdef.num_outputs(patch.config, inst.statics)
        probes.extend((inst.id, p) for p in range(n_out))
    compiled = compile_patch(patch, probes=probes)
    audio, probe_vals, state = compiled.render(n_samples, **kwargs)
    bad = []
    for key, arr in probe_vals.items():
        a = np.asarray(arr)
        if not np.isfinite(a).all():
            first = int(np.argmax(~np.isfinite(a).reshape(-1)))
            bad.append((key, first))
    if bad:
        desc = ", ".join(f"{k} (first at flat index {i})" for k, i in bad)
        raise NonFiniteAudio(f"non-finite samples on wires: {desc}")
    if not bool(jnp.isfinite(audio).all()):
        raise NonFiniteAudio("non-finite samples in output")
    return audio, probe_vals, state


def quarantine_batch(audio):
    """Zero non-finite voices in a [V, C, n] batch.

    Returns ``(clean_audio, ok_mask[V])`` -- the render-farm failure
    isolation: one diverging patch must not kill the dataset job.
    """
    finite = jnp.isfinite(audio).all(axis=(1, 2))
    clean = jnp.where(finite[:, None, None], jnp.nan_to_num(audio), 0.0)
    return clean, finite


@contextlib.contextmanager
def recompile_guard():
    """Assert that no new XLA compilations happen inside the block.

    Guards the compile-cache contract: param edits and repeated renders of
    the same topology must reuse the compiled executable (SURVEY.md §7
    hard part e / tracer-leak note in §5)."""
    from jax._src import monitoring

    events = []

    def listener(event: str, **kwargs):
        if "compile" in event:
            events.append(event)

    monitoring.register_event_listener(listener)
    try:
        yield
    finally:
        monitoring.unregister_event_listener(listener)
    if events:
        raise AssertionError(
            f"unexpected recompilation inside recompile_guard: {events}")
