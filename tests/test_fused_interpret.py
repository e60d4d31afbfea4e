"""Fused Pallas kernel exercised off-TPU via the Pallas interpreter.

Small shapes only (interpret mode is slow); full-size validation runs on
real TPU hardware (bench.py / CLAUDE.md notes).
"""

import numpy as np
import jax
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
