"""External input (driver) module -- build-side extension.

The reference has no way to inject arbitrary signals (its only sources are
oscillators, noise, sequencers and samples); offline rendering wants one:
gate/CV driver arrays for tests, MIDI-derived control lanes, dataset
conditioning signals.  An Input module emits a user-supplied per-sample
array handed to the render entry point via ``drivers={handle: array}``;
with no driver bound it emits its constant ``value`` parameter.
"""

from __future__ import annotations

from ..config import AudioConfig
from .base import CV_DTYPE, ModuleDef, const_ports, cv


def _make(cfg: AudioConfig, value: float = 0.0):
    return ("input",), {"value": cv(value)}


def _init_state(cfg: AudioConfig, statics):
    return {}


def _step(cfg: AudioConfig, statics, params, state, ins, x=None):
    if x is None:
        return state, (params["value"],)
    return state, (x.astype(CV_DTYPE),)


_nin, _inlabels = const_ports(0, ())
_nout, _outlabels = const_ports(1, (None,))

INPUT = ModuleDef(
    type_name="Input",
    make=_make,
    num_inputs=_nin,
    num_outputs=_nout,
    input_labels=_inlabels,
    output_labels=_outlabels,
    init_state=_init_state,
    step=_step,
)
