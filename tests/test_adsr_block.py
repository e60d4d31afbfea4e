"""Direct tests for the segment-parallel ADSR (ops/adsr_block.py).

The block engine's default classification runs ADSR in the serial Pallas
stage (block_engine.SERIAL_TYPES rationale), so this formulation is no
longer on the default path -- these tests keep it pinned against the
per-sample step machine it reimplements (same trajectory, same carried
state), chunk boundaries included.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import srack_tpu as st
from srack_tpu.modules.adsr import ADSR
from srack_tpu.ops.adsr_block import adsr_block

CFG = st.AudioConfig(sample_rate=4800, block_size=32, channels=1,
                     precision="fast")


def step_trajectory(params, state, gate):
    outs = []
    for g in np.asarray(gate):
        state, (y,) = ADSR.step(CFG, ("adsr",), params,
                                state, [jnp.asarray(g, jnp.float32)], None)
        outs.append(float(y))
    return np.asarray(outs), state


def random_gate(rng, n):
    g = np.zeros(n, np.float32)
    t = 0
    while t < n:
        on = rng.integers(1, 40)
        off = rng.integers(1, 40)
        g[t:t + on] = 1.0
        t += on + off
    return g


@pytest.mark.parametrize("seed", range(4))
def test_adsr_block_matches_step(seed):
    rng = np.random.default_rng(seed)
    _, params = ADSR.make(CFG, a_sec=float(rng.uniform(0, 0.01)),
                          d_sec=float(rng.uniform(0, 0.01)),
                          s_val=float(rng.uniform(0, 1)),
                          r_sec=float(rng.uniform(0, 0.01)))
    n = 400
    gate = random_gate(rng, n)
    want, want_state = step_trajectory(params, ADSR.init_state(CFG, None),
                                       gate)

    state = ADSR.init_state(CFG, None)
    got_state, got = adsr_block(CFG, params, state,
                                [jnp.asarray(gate)], n)
    np.testing.assert_allclose(np.asarray(got[0]), want, atol=2e-5)
    assert int(got_state["mode"]) == int(want_state["mode"])
    np.testing.assert_allclose(float(got_state["r_val"]),
                               float(want_state["r_val"]), atol=2e-5)


def test_adsr_block_chunk_boundary_state_carry():
    """Two chained half-renders equal one whole render (carried state)."""
    rng = np.random.default_rng(7)
    _, params = ADSR.make(CFG, a_sec=0.004, d_sec=0.006, s_val=0.5,
                          r_sec=0.008)
    n = 256
    gate = random_gate(rng, n)
    s0 = ADSR.init_state(CFG, None)
    _, whole = adsr_block(CFG, params, s0, [jnp.asarray(gate)], n)
    s_mid, h1 = adsr_block(CFG, params, s0, [jnp.asarray(gate[:n // 2])],
                           n // 2)
    _, h2 = adsr_block(CFG, params, s_mid, [jnp.asarray(gate[n // 2:])],
                       n // 2)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(h1[0]), np.asarray(h2[0])]),
        np.asarray(whole[0]), atol=2e-5)
