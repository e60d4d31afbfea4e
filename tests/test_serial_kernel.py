"""Direct tests of the block engine's serial-stage kernel
(ops/serial_kernel, Pallas interpret mode on CPU -- the engine-level CPU
tests take the lax.scan fallback, so the kernel needs its own pins).

The ragged cases pin the round-4 fix: lanes stream UNPADDED and the
final block runs a statically-shorter loop.  Previously n was padded to
a t_chunk multiple and the serial state stepped through the zero tail --
wrong final state (broken segmented continuity) for any t_chunk that
does not divide n (e.g. the 30 s segment length 480000 % 512 == 256).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srack_tpu.ops import serial_kernel


def decay_step(params, state, x):
    acc = state["acc"] * jnp.float32(0.5) + x["in"]
    flip = jnp.logical_xor(state["flag"], x["in"] > 0.5)
    return ({"acc": acc, "flag": flip},
            {"out": acc, "out2": acc * jnp.float32(2.0)})


def decay_ref(xs):
    v, n = xs.shape
    acc = np.zeros(v, np.float32)
    flag = np.zeros(v, bool)
    out = np.zeros((v, n), np.float32)
    for t in range(n):
        acc = (acc * np.float32(0.5) + xs[:, t]).astype(np.float32)
        flag = flag ^ (xs[:, t] > 0.5)
        out[:, t] = acc
    return out, acc, flag


@pytest.mark.parametrize("n,t_chunk,unroll", [
    (256, 64, 8),    # divisible
    (100, 64, 4),    # ragged final block, full unroll groups (36 = 9*4)
    (70, 64, 4),     # ragged final block + partial tail group (6 = 4+2)
    (50, 64, 8),     # single block, shorter than t_chunk
])
def test_ragged_n_matches_serial_reference(n, t_chunk, unroll):
    v = 8
    rng = np.random.default_rng(0)
    xs = rng.random((v, n)).astype(np.float32)
    run = serial_kernel.make_serial_kernel(
        decay_step, n, ["out", "out2"], t_chunk=t_chunk, unroll=unroll)
    params = {"g": jnp.ones((v,), jnp.float32)}
    state = {"acc": jnp.zeros((v,), jnp.float32),
             "flag": jnp.zeros((v,), bool)}
    outs, fs = run(params, state, {"in": jnp.asarray(xs)})
    want_out, want_acc, want_flag = decay_ref(xs)
    np.testing.assert_array_equal(np.asarray(outs["out"]), want_out)
    np.testing.assert_array_equal(np.asarray(outs["out2"]), want_out * 2)
    np.testing.assert_array_equal(np.asarray(fs["acc"]), want_acc)
    np.testing.assert_array_equal(np.asarray(fs["flag"]), want_flag)


def test_unroll_must_divide_t_chunk():
    with pytest.raises(ValueError):
        serial_kernel.make_serial_kernel(decay_step, 64, ["out"],
                                         t_chunk=64, unroll=3)
