"""Fused Pallas kernel exercised off-TPU via the Pallas interpreter.

Small shapes only (interpret mode is slow); full-size validation runs on
real TPU hardware (bench.py / CLAUDE.md notes).
"""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

import srack_tpu as st
from srack_tpu.ops import fused
from srack_tpu.presets import subtractive_voice, farm_params

def test_fused_kernel_interpret_matches_scan():
    cfg = st.AudioConfig(sample_rate=4800, block_size=64, channels=1,
                         precision="fast")
    patch = subtractive_voice(cfg)
    compiled = st.compile_patch(patch)
    assert compiled.fused_eligible()
    v, n = 4, 32
    params = farm_params(patch, v)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (v,) + a.shape),
                         compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), v)

    run = fused.make_fused_render(compiled, n, t_chunk=16, unroll=4,
                                  interpret=True)
    audio_f, _, state_f = jax.jit(run)(params, state, keys, {})

    scan = compiled._get_fn(n, batched=True, engine="scan")
    audio_s, _, state_s = scan(params, state, keys, {})

    np.testing.assert_allclose(np.asarray(audio_f), np.asarray(audio_s),
                               atol=1e-5, rtol=0)
    # carried state agrees too (phase accumulators bit-exact in int32)
    for mid, sd in state_s["states"].items():
        for k, leaf in sd.items():
            got = np.asarray(state_f["states"][mid][k])
            want = np.asarray(leaf)
            if got.dtype == np.int32:
                np.testing.assert_array_equal(got, want)
            else:
                np.testing.assert_allclose(
                    got.astype(np.float64), want.astype(np.float64),
                    atol=1e-5)


def test_fused_final_state_with_padded_tail():
    """n NOT a multiple of t_chunk: the kernel's zero-padded tail must not
    advance the carried state past sample n (regression: the final-state
    snapshot used to be taken at the padded chunk end)."""
    from srack_tpu.ops.fused_vjp import make_fused_vjp

    cfg = st.AudioConfig(sample_rate=4800, block_size=64, channels=1,
                         precision="fast")
    patch = subtractive_voice(cfg)
    compiled = st.compile_patch(patch)
    v, n = 2, 23  # 23 % 16 != 0 -> padded tail of 9 samples
    params = farm_params(patch, v)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (v,) + a.shape),
                         compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), v)
    scan = compiled._get_fn(n, batched=True, engine="scan")
    _, _, state_s = scan(params, state, keys, {})

    for make in (
        lambda: fused.make_fused_render(compiled, n, t_chunk=16, unroll=4,
                                        interpret=True),
        lambda: make_fused_vjp(compiled, n, t_chunk=16, unroll=4,
                               interpret=True),
    ):
        _, _, state_f = jax.jit(make())(params, state, keys, {})
        for mid, sd in state_s["states"].items():
            for k, leaf in sd.items():
                got = np.asarray(state_f["states"][mid][k])
                want = np.asarray(leaf)
                if got.dtype == np.int32:
                    np.testing.assert_array_equal(got, want, err_msg=f"{mid}.{k}")
                else:
                    np.testing.assert_allclose(
                        got.astype(np.float64), want.astype(np.float64),
                        atol=1e-5, err_msg=f"{mid}.{k}")


@pytest.mark.slow
def test_fused_vjp_padded_tail_final_state_cotangent():
    """d(loss)/d(initial state) through ct_final must be injected at sample
    n-1, not at the padded chunk end (bwd mirror of the snapshot fix)."""
    from srack_tpu.ops.fused_vjp import make_fused_vjp

    cfg = st.AudioConfig(sample_rate=4800, block_size=64, channels=1,
                         precision="fast")
    patch = subtractive_voice(cfg, gate_rate_oct=-1.0)
    compiled = st.compile_patch(patch)
    v, n = 2, 23
    params = farm_params(patch, v)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (v,) + a.shape),
                         compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), v)
    render = make_fused_vjp(compiled, n, t_chunk=16, unroll=4,
                            interpret=True)
    scan_fn = compiled.make_render_fn(n, batched=True)

    def loss_of(fn):
        def loss(prm):
            _, _, fin = fn(prm, state, keys, {})
            # a loss purely on the *final state* exercises ct_final
            return sum((leaf.astype(jnp.float32) ** 2).mean()
                       for leaf in jax.tree.leaves(fin["states"])
                       if jnp.issubdtype(leaf.dtype, jnp.floating))
        return loss

    g1 = jax.grad(loss_of(render))(params)
    g2 = jax.grad(loss_of(scan_fn))(params)
    nonzero = 0
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        a64, b64 = np.asarray(a, np.float64), np.asarray(b, np.float64)
        np.testing.assert_allclose(a64, b64,
                                   atol=1e-8 + 1e-4 * np.abs(b64).max())
        nonzero += np.abs(b64).max() > 0
    assert nonzero >= 2


def test_fused_vjp_interpret_matches_scan_grads():
    """Pallas forward + Pallas backward (ops/fused_vjp) vs scan autodiff."""
    from srack_tpu.ops.fused_vjp import make_fused_vjp

    cfg = st.AudioConfig(sample_rate=4800, block_size=64, channels=1,
                         precision="fast")
    patch = subtractive_voice(cfg, gate_rate_oct=-1.0)
    compiled = st.compile_patch(patch)
    v, n = 2, 32
    params = farm_params(patch, v)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (v,) + a.shape),
                         compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), v)
    render = make_fused_vjp(compiled, n, t_chunk=16, unroll=4,
                            interpret=True)
    scan_fn = compiled.make_render_fn(n, batched=True)

    a1, _, _ = render(params, state, keys, {})
    a2, _, _ = scan_fn(params, state, keys, {})
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))

    def loss_of(fn):
        def loss(prm):
            audio, _, _ = fn(prm, state, keys, {})
            return (audio ** 2).mean()
        return loss

    g1 = jax.grad(loss_of(render))(params)
    g2 = jax.grad(loss_of(scan_fn))(params)
    nonzero = 0
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        a64 = np.asarray(a, np.float64)
        b64 = np.asarray(b, np.float64)
        np.testing.assert_allclose(a64, b64,
                                   atol=1e-8 + 1e-4 * np.abs(b64).max())
        nonzero += np.abs(b64).max() > 0
    assert nonzero >= 4  # gradients actually flowed


@pytest.mark.slow
def test_fused_buffer_feedback_matches_scan_and_oracle():
    """Buffer-feedback compat mode on the fused kernel (per-block kernel
    invocations under an outer scan, fb wires streamed like xs lanes)
    matches the scan engine and the oracle, including continued renders."""
    from srack_tpu import presets
    from srack_tpu.oracle import oracle_render
    cfg = st.AudioConfig(sample_rate=4800, block_size=64, channels=1,
                         precision="fast", buffer_feedback=True)
    patch = presets.feedback_patch(cfg)
    compiled = st.compile_patch(patch)
    n, v = 192, 2
    params = st.replicate_params(compiled.default_params, v)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (v,) + a.shape),
                         compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), v)
    a_s, _, _ = compiled.render(n, params=params, state=state, key=keys,
                                batched=True, engine="scan")
    fn = jax.jit(fused.make_fused_render_buffer(compiled, n))
    a_f, _, st_f = fn(params, state, keys, {})
    np.testing.assert_allclose(np.asarray(a_f), np.asarray(a_s),
                               atol=3e-6, rtol=0)
    # continue from the fused final state on the scan engine
    a_s2, _, _ = compiled.render(n, params=params, state=st_f, key=keys,
                                 batched=True, engine="scan")
    a_f2, _, _ = fn(params, st_f, keys, {})
    np.testing.assert_allclose(np.asarray(a_f2), np.asarray(a_s2),
                               atol=3e-6, rtol=0)
    want = oracle_render(patch, n)
    np.testing.assert_allclose(np.asarray(a_f[0]), want, atol=3e-4, rtol=0)


def test_packed_audio_vjp_matches_unpacked():
    """packed_audio=True (round 5): audio/cotangent stay in the kernels'
    [n, C, tiles, 8, 128] layout.  At V == TILE_VOICES (no pad voices)
    an elementwise loss over the packed array is the same global mean,
    so loss AND parameter gradients must match the unpacked path."""
    from srack_tpu.ops.fused_vjp import make_fused_vjp, pack_lanes

    cfg = st.AudioConfig(sample_rate=4800, block_size=64, channels=1,
                         precision="fast")
    patch = subtractive_voice(cfg, gate_rate_oct=-1.0)
    compiled = st.compile_patch(patch)
    v, n = 1024, 64
    params = farm_params(patch, v)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (v,) + a.shape),
                         compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), v)
    rng = np.random.default_rng(5)
    targets = jnp.asarray(rng.normal(size=(v, 1, n)).astype(np.float32))

    r_plain = make_fused_vjp(compiled, n, interpret=True)
    r_packed = make_fused_vjp(compiled, n, interpret=True,
                              packed_audio=True)
    tgt_p = pack_lanes(targets)

    def loss_plain(p):
        audio, _, _ = r_plain(p, state, keys, {})
        return jnp.mean((audio - targets) ** 2)

    def loss_packed(p):
        audio, _, _ = r_packed(p, state, keys, {})
        return jnp.mean((audio - tgt_p) ** 2)

    l0, g0 = jax.value_and_grad(loss_plain)(params)
    l1, g1 = jax.value_and_grad(loss_packed)(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict((jax.tree_util.keystr(k), v) for k, v in
                 jax.tree_util.tree_leaves_with_path(g1))
    for k, a in flat0:
        b = flat1[jax.tree_util.keystr(k)]
        if a.dtype == np.float32:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-5,
                                       err_msg=jax.tree_util.keystr(k))
