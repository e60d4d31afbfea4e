"""ADSR envelope generator.

Faithful branchless reproduction of the reference's per-sample state machine
(src/synth/adsr.rs:134-217), including its quirks:

* linear segments with phase increments ``1/(sr * t_sec)`` -- a zero time
  constant yields +inf and the stage completes on the same sample;
* retrigger from Attack resets phase and latches the current level into
  ``r_val`` (adsr.rs:157-160) so the restarted attack ramps from it;
* a rising edge during Release enters Attack but the release increment is
  still added that sample, and a same-sample release completion overrides
  back to idle with ``r_val = 0`` (adsr.rs:187-199);
* output law per stage (adsr.rs:202-208) evaluated on the *post-update*
  mode, then ``r_val``/``from_a_val`` track the emitted level
  (adsr.rs:209-213).

Modes are encoded as int32: 0=None 1=Attack 2=Decay 3=Sustain 4=Release.
The ``match`` becomes mode-indexed ``where`` chains: every branch's update is
computed unconditionally (cheap VPU math) and selected -- compiler-friendly
control flow instead of the reference's data-dependent branching.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import AudioConfig
from ..ops.basic import transition, transition_init
from .base import CV_DTYPE, ModuleDef, const_ports, cv, in_or


def _make(cfg: AudioConfig, a_sec: float = 0.0, d_sec: float = 0.5,
          s_val: float = 0.25, r_sec: float = 0.5):
    params = {
        "a_sec": cv(a_sec),
        "d_sec": cv(d_sec),
        "s_val": cv(s_val),
        "r_sec": cv(r_sec),
    }
    return ("adsr",), params


def _init_state(cfg: AudioConfig, statics):
    return {
        "phase": jnp.asarray(0.0, dtype=CV_DTYPE),
        "mode": jnp.asarray(0, dtype=jnp.int32),
        "r_val": jnp.asarray(0.0, dtype=CV_DTYPE),
        "from_a_val": jnp.asarray(0.0, dtype=CV_DTYPE),
        "gate_last": transition_init(),
    }


def adsr_step_core(params, state, gate, sample_rate):
    """One sample of the envelope.  Shared with the block/Pallas engines."""
    phase, mode = state["phase"], state["mode"]
    r_val, from_a_val = state["r_val"], state["from_a_val"]
    gate_last, fired = transition(state["gate_last"], gate)
    sr = jnp.asarray(sample_rate, dtype=CV_DTYPE)
    gate_hi = gate > 0.0

    inc_a = 1.0 / (sr * params["a_sec"])
    inc_d = 1.0 / (sr * params["d_sec"])
    inc_r = 1.0 / (sr * params["r_sec"])

    # --- mode 0: idle ------------------------------------------------------
    phase_n = jnp.where(gate_hi, 0.0, phase)
    mode_n = jnp.where(gate_hi, 1, 0)

    # --- mode 1: attack ----------------------------------------------------
    pa = phase + inc_a
    a_done = pa >= 1.0
    phase_a = jnp.where(a_done, 0.0, jnp.where(fired, 0.0, pa))
    mode_a = jnp.where(a_done, 2, 1)
    rval_a = jnp.where(jnp.logical_and(jnp.logical_not(a_done), fired),
                       from_a_val, r_val)

    # --- mode 2: decay -----------------------------------------------------
    pd = phase + inc_d
    d_done = pd >= 1.0
    phase_d = jnp.where(fired, 0.0, jnp.where(d_done, 0.0, pd))
    mode_d = jnp.where(fired, 1, jnp.where(d_done, 3, 2))

    # --- mode 3: sustain ---------------------------------------------------
    gate_lo = jnp.logical_not(gate_hi)
    phase_s = jnp.where(jnp.logical_or(gate_lo, fired), 0.0, phase)
    mode_s = jnp.where(fired, 1, jnp.where(gate_lo, 4, 3))

    # --- mode 4: release ---------------------------------------------------
    pr = jnp.where(gate_hi, 0.0, phase) + inc_r
    r_done = pr >= 1.0
    phase_r = jnp.where(r_done, 0.0, pr)
    mode_r = jnp.where(r_done, 0, jnp.where(gate_hi, 1, 4))
    rval_r = jnp.where(r_done, 0.0, r_val)

    def by_mode(v0, v1, v2, v3, v4):
        return jnp.where(
            mode == 0, v0,
            jnp.where(mode == 1, v1,
                      jnp.where(mode == 2, v2,
                                jnp.where(mode == 3, v3, v4))))

    new_phase = by_mode(phase_n, phase_a, phase_d, phase_s, phase_r)
    new_mode = by_mode(mode_n, mode_a, mode_d, mode_s, mode_r)
    r_mid = by_mode(r_val, rval_a, r_val, r_val, rval_r)

    out = jnp.where(
        new_mode == 0, 0.0,
        jnp.where(new_mode == 1, r_mid + (1.0 - r_mid) * new_phase,
                  jnp.where(new_mode == 2,
                            params["s_val"] + (1.0 - params["s_val"]) * (1.0 - new_phase),
                            jnp.where(new_mode == 3, params["s_val"],
                                      params["s_val"] * (1.0 - new_phase)))))
    out = out.astype(CV_DTYPE)

    new_r_val = jnp.where(new_mode != 1, out, r_mid)
    new_from_a = jnp.where(new_mode == 1, out, from_a_val)

    new_state = {
        "phase": new_phase.astype(CV_DTYPE),
        "mode": new_mode.astype(jnp.int32),
        "r_val": new_r_val.astype(CV_DTYPE),
        "from_a_val": new_from_a.astype(CV_DTYPE),
        "gate_last": gate_last,
    }
    return new_state, out


def _step(cfg: AudioConfig, statics, params, state, ins, x=None):
    gate = in_or(ins[0], 0.0)
    new_state, out = adsr_step_core(params, state, gate, cfg.sample_rate)
    return new_state, (out,)


_nin, _inlabels = const_ports(1, ("Gate",))
_nout, _outlabels = const_ports(1, (None,))

ADSR = ModuleDef(
    type_name="ADSR",
    make=_make,
    num_inputs=_nin,
    num_outputs=_nout,
    input_labels=_inlabels,
    output_labels=_outlabels,
    init_state=_init_state,
    step=_step,
)
