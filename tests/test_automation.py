"""Per-sample parameter automation lanes.

Automation promotes any scalar module param to a per-sample xs lane
(compiler._sample_step overlay).  No reference analogue -- the reference's
sliders are static between UI events (ui.rs module ``ui()`` methods); this
is the DAW-style layer above them.  Semantics pinned here:

* a constant lane is bit-identical to the static param;
* automating an oscillator's ``val`` equals driving its CV input with the
  same array (octs = cv + val is the documented pitch law,
  oscillator.rs:43-48);
* lanes reach the fused Pallas engine (interpret mode) with the same
  results as the scan engine;
* the block engine declines automated patches and auto falls back.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import srack_tpu as st
from srack_tpu.compiler import compile_patch
from srack_tpu.engine import render_batch, replicate_params

CFG = st.AudioConfig(sample_rate=8000, block_size=64, channels=1,
                     precision="fast")
N = 512


def _voice(val=0.0):
    p = st.Patch(CFG)
    osc = p.add("Oscillator", val=val, name="vco")
    flt = p.add("Moog Filter", freq=0.4, res=0.3, name="vcf")
    p.connect(osc, "Sawtooth", flt, "Audio")
    p.connect(flt, 0, p.output, 0)
    return p, osc, flt


def test_constant_lane_matches_static():
    p, osc, _ = _voice(val=-1.0)
    ref, _, _ = st.render(p, N, engine="scan")
    lane = jnp.full((N,), -1.0, jnp.float32)
    got, _, _ = st.render(p, N, automation={(osc, "val"): lane},
                          engine="scan")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_val_automation_equals_cv_drive():
    rng = np.random.default_rng(0)
    lane = jnp.asarray(rng.uniform(-1.5, 0.5, N), jnp.float32)

    p, osc, _ = _voice(val=0.0)
    got, _, _ = st.render(p, N, automation={(osc, "val"): lane},
                          engine="scan")

    q = st.Patch(CFG)
    drv = q.add("Input", name="pitch")
    osc2 = q.add("Oscillator", val=0.0, name="vco")
    flt2 = q.add("Moog Filter", freq=0.4, res=0.3, name="vcf")
    q.connect(drv, 0, osc2, "CV")
    q.connect(osc2, "Sawtooth", flt2, "Audio")
    q.connect(flt2, 0, q.output, 0)
    want, _, _ = st.render(q, N, drivers={drv: lane}, engine="scan")

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_filter_sweep_changes_output():
    p, _, flt = _voice(val=-1.0)
    sweep = jnp.linspace(0.05, 0.9, N, dtype=jnp.float32)
    swept, _, _ = st.render(p, N, automation={(flt, "freq"): sweep},
                            engine="scan")
    still, _, _ = st.render(p, N, engine="scan")
    assert float(jnp.abs(swept - still).max()) > 1e-3


def test_fused_interpret_matches_scan():
    p, osc, _ = _voice(val=0.0)
    lane = jnp.asarray(np.linspace(-1.0, -0.2, N), jnp.float32)
    compiled = compile_patch(p, automation=((osc, "val"),))
    v = 2
    params = replicate_params(p.params(), v)
    want = compiled.render(N, params=params, batched=True, engine="scan",
                           automation={(osc, "val"): lane})[0]
    got = compiled.render(N, params=params, batched=True, engine="fused",
                          automation={(osc, "val"): lane})[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_block_engine_declines_and_auto_falls_back():
    p, osc, _ = _voice()
    compiled = compile_patch(p, automation=((osc, "val"),))
    with pytest.raises(ValueError):
        compiled.render(N, engine="block")
    # auto must not choose block for automated patches
    assert compiled.auto_engine(batched=False) == "scan"


def test_unknown_param_rejected():
    p, osc, _ = _voice()
    with pytest.raises(KeyError):
        compile_patch(p, automation=((osc, "nope"),))
    compiled = compile_patch(p, automation=((osc, "val"),))
    with pytest.raises(KeyError):
        # lane not declared at compile time
        compiled.render(N, automation={(p.output, "x"): jnp.zeros(N)})


def test_stream_and_long_match_offline():
    """Automation lanes split across stream blocks / render_long segments
    must reproduce the single-call render exactly (state-carried lanes)."""
    from srack_tpu.engine import render_long, render_stream

    p, osc, flt = _voice(val=0.0)
    lane_v = jnp.asarray(np.linspace(-1.0, -0.2, N), jnp.float32)
    lane_f = jnp.asarray(np.linspace(0.1, 0.8, N), jnp.float32)
    autos = {(osc, "val"): lane_v, (flt, "freq"): lane_f}
    want, _, _ = st.render(p, N, automation=autos, engine="scan")

    blocks = [a for a, _, _ in render_stream(
        p, n_blocks=N // CFG.block_size, automation=autos)]
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(blocks, axis=-1)), np.asarray(want),
        atol=1e-6, rtol=1e-6)

    got, _ = render_long(p, N, segment=3 * CFG.block_size, automation=autos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_stream_holds_last_lane_value():
    from srack_tpu.engine import render_stream

    p, osc, _ = _voice(val=0.0)
    short = jnp.full((CFG.block_size,), -1.0, jnp.float32)  # 1 block only
    blocks = [a for a, _, _ in render_stream(
        p, n_blocks=3, automation={(osc, "val"): short})]
    # past the lane's end the param holds -1.0: same as a constant render
    ref_blocks = [a for a, _, _ in render_stream(
        p, n_blocks=3,
        automation={(osc, "val"): jnp.full((3 * CFG.block_size,), -1.0,
                                           jnp.float32)})]
    for g, w in zip(blocks, ref_blocks):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_batched_shared_lane():
    p, osc, _ = _voice(val=0.0)
    lane = jnp.asarray(np.linspace(-1.0, 0.0, N), jnp.float32)
    params = replicate_params(p.params(), 3)
    audio, _, _ = render_batch(p, N, params=params,
                               automation={(osc, "val"): lane})
    assert audio.shape == (3, 1, N)
    np.testing.assert_array_equal(np.asarray(audio[0]),
                                  np.asarray(audio[2]))
