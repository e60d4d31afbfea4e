"""Profiling and render statistics.

The reference has no tracing/profiling beyond incidental ``println!``
(SURVEY.md §5); its implicit metric is "no underruns".  Here renders are
offline, so the observability story is: wall-clock + throughput counters
per render, ``jax.profiler`` trace contexts for xprof, and named scopes so
module boundaries are readable in HLO.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class RenderStats:
    """Structured per-render statistics (SURVEY.md §5 metrics)."""
    n_samples: int
    n_voices: int
    channels: int
    sample_rate: int
    wall_s: float
    compile_s: float = 0.0
    peak_amplitude: float = 0.0
    rms: float = 0.0
    nan_lanes: int = 0

    @property
    def samples_per_sec(self) -> float:
        return self.n_samples * self.n_voices / self.wall_s

    @property
    def realtime_factor(self) -> float:
        """Aggregate real-time factor across all voices."""
        return self.samples_per_sec / self.sample_rate

    def as_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["samples_per_sec"] = self.samples_per_sec
        d["realtime_factor"] = self.realtime_factor
        return d


def timed_render(compiled, n_samples: int, *, warmup: bool = True, **kwargs):
    """Render with timing + signal stats.  Returns (audio, probes, state,
    RenderStats).  Forces a device fetch inside the timed region (on some
    transports ``block_until_ready`` does not actually block)."""
    t0 = time.perf_counter()
    if warmup:
        compiled.render(n_samples, **kwargs)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    audio, probes, state = compiled.render(n_samples, **kwargs)
    peak = float(jnp.abs(audio).max())
    wall = time.perf_counter() - t0

    a = np.asarray(audio)
    batched = a.ndim == 3
    stats = RenderStats(
        n_samples=n_samples,
        n_voices=a.shape[0] if batched else 1,
        channels=a.shape[-2],
        sample_rate=compiled.cfg.sample_rate,
        wall_s=wall,
        compile_s=compile_s,
        peak_amplitude=peak,
        rms=float(np.sqrt((a.astype(np.float64) ** 2).mean())),
        nan_lanes=int(np.logical_not(np.isfinite(a)).any(axis=-1).sum()),
    )
    return audio, probes, state, stats


@contextlib.contextmanager
def trace(name: str, trace_dir: Optional[str] = None):
    """xprof-compatible profiler trace around a render/compile region."""
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        if trace_dir:
            jax.profiler.stop_trace()
