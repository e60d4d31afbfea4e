"""Voltage-controlled amplifier.

Reference: src/synth/vca.rs:117-148.  out = audio * cv gated on cv > 0
(or ungated when the ``negative`` flag is set); if either input is
unconnected the output is silence (``output.fill(0.0)``).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import AudioConfig
from .base import CV_DTYPE, ModuleDef, const_ports, cv


def _make(cfg: AudioConfig, negative: bool = False):
    return ("vca", bool(negative)), {}


def _init_state(cfg: AudioConfig, statics):
    return {}


def _step(cfg: AudioConfig, statics, params, state, ins, x=None):
    (_, negative) = statics
    audio, control = ins
    if audio is None or control is None:
        return state, (jnp.zeros((), dtype=CV_DTYPE),)
    if negative:
        out = audio * control
    else:
        out = jnp.where(control > 0.0, audio * control, 0.0)
    return state, (out.astype(CV_DTYPE),)


_nin, _inlabels = const_ports(2, ("Audio", "CV"))
_nout, _outlabels = const_ports(1, (None,))

VCA = ModuleDef(
    type_name="VCA",
    make=_make,
    num_inputs=_nin,
    num_outputs=_nout,
    input_labels=_inlabels,
    output_labels=_outlabels,
    init_state=_init_state,
    step=_step,
)
