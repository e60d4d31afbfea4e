"""Tests for observability / debugging / training utilities."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import srack_tpu as st
from srack_tpu import presets
from srack_tpu.utils.debug import (NonFiniteAudio, check_finite,
                                   quarantine_batch, recompile_guard)
from srack_tpu.utils.profiling import timed_render
from srack_tpu.utils.train import SoundMatcher
from srack_tpu.utils.losses import multiscale_spectral_loss

CFG = st.AudioConfig(sample_rate=4800, block_size=64, channels=1,
                     precision="exact")


def test_timed_render_stats():
    p = presets.subtractive_voice(CFG)
    compiled = st.compile_patch(p)
    audio, probes, state, stats = timed_render(compiled, 256)
    assert stats.n_samples == 256 and stats.n_voices == 1
    assert stats.samples_per_sec > 0
    assert stats.nan_lanes == 0
    assert stats.peak_amplitude >= 0


def test_check_finite_passes_healthy_patch():
    p = presets.subtractive_voice(CFG)
    audio, probe_vals, _ = check_finite(p, 128)
    assert len(probe_vals) > 5  # every port probed


def test_check_finite_catches_blowup():
    p = st.Patch(CFG)
    # signed power with huge exponent on a growing signal diverges to inf
    osc = p.add("Oscillator", val=5.0)
    nl = p.add("Non-Linear", constant=200.0)
    big = p.add("Multiply", constant=1e30)
    p.connect(osc, "Sine", big, "In1")
    p.connect(big, 0, nl, "In1")
    nl2 = p.add("Multiply", constant=1e30)
    p.connect(nl, 0, nl2, "In1")
    p.connect(nl2, 0, p.output, 0)
    with pytest.raises(NonFiniteAudio):
        check_finite(p, 64)


def test_quarantine_batch():
    audio = jnp.ones((3, 1, 16))
    audio = audio.at[1, 0, 5].set(jnp.nan)
    clean, ok = quarantine_batch(audio)
    assert list(np.asarray(ok)) == [True, False, True]
    assert np.asarray(clean)[1].sum() == 0.0
    assert np.isfinite(np.asarray(clean)).all()


def test_recompile_guard():
    p = presets.sine_patch(CFG)
    compiled = st.compile_patch(p)
    compiled.render(64)  # warm
    with recompile_guard():
        compiled.render(64)  # cached -> fine
    osc = [i.id for i in p if i.mdef.type_name == "Oscillator"][0]
    p.set_params(osc, val=1.0)
    with recompile_guard():
        st.render(p, 64)  # param edit must NOT recompile


def test_sound_matcher_reduces_loss():
    # fit an output gain: convex in the Multiply constant
    p = st.Patch(CFG)
    osc = p.add("Oscillator", val=-1.0)
    gain = p.add("Multiply", constant=0.0)
    p.connect(osc, "Sine", gain, "In1")
    p.connect(gain, 0, p.output, 0)
    n = 256
    compiled = st.compile_patch(p)
    target_params = jax.tree.map(lambda a: a, compiled.default_params)
    target_params[gain.id] = dict(target_params[gain.id],
                                  constant=jnp.float32(0.7))
    target, _, _ = compiled.render(n, params=target_params)

    sm = SoundMatcher(p, n, loss_fn=lambda a, b: ((a - b) ** 2).mean(),
                      optimizer=optax.adam(5e-2),
                      trainable=lambda mid, name: mid == gain.id)
    ts = sm.init()
    losses = []
    for i in range(40):
        ts, loss = sm.step(ts, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.1
    fitted = float(sm.params(ts)[gain.id]["constant"])
    assert abs(fitted - 0.7) < 0.15


def test_multiscale_loss_zero_for_identical():
    x = jnp.sin(jnp.linspace(0, 100, 2048))[None, :]
    assert float(multiscale_spectral_loss(x, x)) == 0.0


def test_grad_render_fn_matches_scan_grads():
    # fast gate clock so the envelope opens within the short render
    p = presets.subtractive_voice(CFG, gate_rate_oct=-1.0)
    compiled = st.compile_patch(p)
    n, v = 128, 2
    params = st.replicate_params(compiled.default_params, v)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (v,) + a.shape),
                         compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), v)
    gr = compiled.grad_render_fn(n, batched=True)
    scan_fn = compiled.make_render_fn(n, batched=True)

    def loss_with(fn):
        def loss(prm):
            audio, _, _ = fn(prm, state, keys, {})
            return (audio ** 2).mean()
        return loss

    g1 = jax.grad(loss_with(gr))(params)
    g2 = jax.grad(loss_with(scan_fn))(params)
    leaves1, leaves2 = jax.tree.leaves(g1), jax.tree.leaves(g2)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves1)
    # the custom-vjp path re-linearises the forward; f32 rounding through
    # 128 steps of the resonant filter's backward recurrence amplifies, so
    # compare with a relative bound per leaf
    for a, b in zip(leaves1, leaves2):
        a64 = np.asarray(a, dtype=np.float64)
        b64 = np.asarray(b, dtype=np.float64)
        np.testing.assert_allclose(a64, b64,
                                   atol=1e-7 + 0.1 * np.abs(b64).max())


def test_batched_train_step_fast_mode():
    import optax
    from srack_tpu.utils.train import batched_train_step, SoundMatcher
    p = presets.subtractive_voice(CFG, gate_rate_oct=-1.0)
    compiled = st.compile_patch(p)
    n, v = 128, 3
    sm = SoundMatcher(p, n)
    ts = sm.init()
    opt = optax.adam(1e-2)
    targets = jnp.zeros((v, CFG.channels, n), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), v)
    for fast in (False, True):
        step = jax.jit(batched_train_step(compiled, opt, n, fast=fast))
        tr, os_, loss = step(ts["train"], ts["frozen"],
                             opt.init(ts["train"]), targets, keys)
        assert np.isfinite(float(loss))
        # a second step changes params (gradients flowed)
        tr2, _, _ = step(tr, ts["frozen"], os_, targets, keys)
        moved = any(float(jnp.abs(a - b).max()) > 0
                    for a, b in zip(jax.tree.leaves(tr), jax.tree.leaves(tr2)))
        assert moved


def test_multi_train_step_matches_loop():
    """The scanned multi-step trainer equals the explicit python loop of
    batched_train_step with the same per-step key folding."""
    import optax
    from srack_tpu.utils.train import (SoundMatcher, batched_train_step,
                                       multi_train_step)
    p = presets.subtractive_voice(CFG, gate_rate_oct=-1.0)
    compiled = st.compile_patch(p)
    n, v, K = 128, 3, 3
    sm = SoundMatcher(p, n)
    ts = sm.init()
    opt = optax.adam(1e-2)
    targets = jnp.zeros((v, CFG.channels, n), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), v)

    mstep = jax.jit(multi_train_step(compiled, opt, n, K))
    tr_m, _, losses = mstep(ts["train"], ts["frozen"],
                            opt.init(ts["train"]), targets, keys)
    assert losses.shape == (K,)

    one = jax.jit(batched_train_step(compiled, opt, n))
    tr, os_ = ts["train"], opt.init(ts["train"])
    loop_losses = []
    for i in range(K):
        ks = jax.vmap(lambda k: jax.random.fold_in(k, i))(keys)
        tr, os_, loss = one(tr, ts["frozen"], os_, targets, ks)
        loop_losses.append(float(loss))
    np.testing.assert_allclose(np.asarray(losses), loop_losses,
                               rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree.leaves(tr_m), jax.tree.leaves(tr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
