"""Math (Add / Subtract / Multiply) and Non-Linear (signed power) modules.

Reference: src/synth/math.rs.

* MathModule (math.rs:139-160): elementwise a op b where an unconnected In1
  falls back to 0.0 and an unconnected In2 falls back to the ``constant``
  parameter (slider -2..=2, shown only when In2 is unconnected).  One class,
  the op chosen at construction (src/synth.rs:476-501 catalog entries).
* NonLinearModule (math.rs:202-206): signed power waveshaper
  ``a > 0 ? a^b : -((-a)^b)`` with the same input-fallback rule and
  ``constant`` (the exponent) defaulting to 1.0, slider 0.5..=2.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import AudioConfig
from .base import CV_DTYPE, ModuleDef, const_ports, cv, in_or

_OPS = ("Add", "Subtract", "Multiply")


def _math_make_for(op: str):
    def make(cfg: AudioConfig, constant: float = 0.0):
        return ("math", op), {"constant": cv(constant)}
    return make


def _math_init_state(cfg: AudioConfig, statics):
    return {}


def _math_step(cfg: AudioConfig, statics, params, state, ins, x=None):
    (_, op) = statics
    a = in_or(ins[0], 0.0)
    b = params["constant"] if ins[1] is None else ins[1]
    if op == "Add":
        out = a + b
    elif op == "Subtract":
        out = a - b
    elif op == "Multiply":
        out = a * b
    else:  # pragma: no cover
        raise ValueError(f"unknown math op {op!r}")
    return state, (out.astype(CV_DTYPE),)


_nin2, _inlabels2 = const_ports(2, ("In1", "In2"))
_nout1, _outlabels1 = const_ports(1, (None,))


def math_module_def(op: str) -> ModuleDef:
    if op not in _OPS:
        raise ValueError(f"unknown math op {op!r}")
    return ModuleDef(
        type_name=op,
        make=_math_make_for(op),
        num_inputs=_nin2,
        num_outputs=_nout1,
        input_labels=_inlabels2,
        output_labels=_outlabels1,
        init_state=_math_init_state,
        step=_math_step,
        # stateless elementwise: [n]-shaped automated constants broadcast
        # straight through the step in the block engine's phases
        auto_block_params=frozenset({"constant"}),
    )


ADD = math_module_def("Add")
SUBTRACT = math_module_def("Subtract")
MULTIPLY = math_module_def("Multiply")


# ---------------------------------------------------------------------------
# Non-Linear
# ---------------------------------------------------------------------------

def _nl_make(cfg: AudioConfig, constant: float = 1.0):
    return ("nonlinear",), {"constant": cv(constant)}


def signed_pow(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``a > 0 ? a^b : -((-a)^b)`` (math.rs:202-206).

    Matches the reference's edge behaviour at a == 0 with b == 0: powf(0,0)
    is 1 in both Rust libm and XLA, so the negative branch yields -1.
    """
    return jnp.where(a > 0.0, jnp.power(a, b), -jnp.power(-a, b))


def _nl_step(cfg: AudioConfig, statics, params, state, ins, x=None):
    a = in_or(ins[0], 0.0)
    b = params["constant"] if ins[1] is None else ins[1]
    return state, (signed_pow(a, b).astype(CV_DTYPE),)


NON_LINEAR = ModuleDef(
    type_name="Non-Linear",
    make=_nl_make,
    num_inputs=_nin2,
    num_outputs=_nout1,
    input_labels=_inlabels2,
    output_labels=_outlabels1,
    init_state=_math_init_state,
    step=_nl_step,
    auto_block_params=frozenset({"constant"}),
)
