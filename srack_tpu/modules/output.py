"""Output sink module.

Reference: src/synth/output.rs -- one input per channel; ``calc`` copies each
connected input buffer to a public per-channel buffer (zeros when
unconnected, output.rs:46-60) that the audio engine reads (main.rs:66-76).
Exactly one is auto-created per workspace (main.rs:129-132).

Here the compiler treats the Output module as the program's return value:
its resolved per-sample inputs become the stacked ``[channels, n]`` render
result.  ``step`` still exists so the module fits the uniform contract.
"""

from __future__ import annotations

from ..config import AudioConfig
from .base import CV_DTYPE, ModuleDef, in_or


def _make(cfg: AudioConfig):
    return ("output", cfg.channels), {}


def _n_in(cfg: AudioConfig, statics) -> int:
    return statics[1]


def _init_state(cfg: AudioConfig, statics):
    return {}


def _step(cfg: AudioConfig, statics, params, state, ins, x=None):
    outs = tuple(in_or(v, 0.0).astype(CV_DTYPE) for v in ins)
    return state, outs


OUTPUT = ModuleDef(
    type_name="Output",
    make=_make,
    num_inputs=_n_in,
    num_outputs=lambda cfg, s: 0,
    input_labels=lambda cfg, s: (None,) * s[1],
    output_labels=lambda cfg, s: (),
    init_state=_init_state,
    step=_step,
)
