"""Pallas chunked-scan / gather kernels vs the XLA log-doubling primitives.

The kernels (ops/scan_kernel.py) only engage on a real TPU backend; here
they run in Pallas interpret mode (same kernel code, evaluated on CPU) and
must agree with the ops/basic XLA paths -- including tail chunks, carried
prefixes across T_CHUNK boundaries, batched (vmapped) calls, and every scan
kind the modules use.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srack_tpu.ops import basic, scan_kernel


def _rows(seed, r, n, dtype=np.float32):
    rng = np.random.default_rng(seed)
    if np.issubdtype(dtype, np.integer):
        return jnp.asarray(rng.integers(-5, 6, size=(r, n)), dtype)
    return jnp.asarray(rng.normal(size=(r, n)), dtype)


@pytest.mark.parametrize("n", [2048, 5000, 48000])
def test_cumsum_matches_xla(n):
    x = _rows(0, 3, n)
    got = np.asarray(scan_kernel._scan_rows("sum", (x,), (0,), True)[0])
    want = np.cumsum(np.asarray(x, np.float64), axis=1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_cumsum_int_exact():
    x = _rows(1, 2, 6000, np.int32)
    got = np.asarray(scan_kernel._scan_rows("sum", (x,), (0,), True)[0])
    np.testing.assert_array_equal(got, np.cumsum(np.asarray(x), axis=1))


def test_cummax_matches():
    x = _rows(2, 2, 5000)
    ident = float("-inf")
    got = np.asarray(scan_kernel._scan_rows("max", (x,), (ident,), True)[0])
    np.testing.assert_array_equal(got, np.maximum.accumulate(
        np.asarray(x), axis=1))


def test_fill_matches():
    rng = np.random.default_rng(3)
    r, n = 2, 5000
    vals = _rows(4, r, n)
    mask = jnp.asarray(rng.random((r, n)) < 0.01, jnp.int32)
    fv, fo = scan_kernel._scan_rows("fill", (vals, mask), (0, 0), True)
    want_v, want_ok = basic.forward_fill(vals, np.asarray(mask, bool),
                                         axis=1)
    np.testing.assert_array_equal(np.asarray(fo) != 0, np.asarray(want_ok))
    got = np.asarray(fv)[np.asarray(fo) != 0]
    np.testing.assert_array_equal(got, np.asarray(want_v)[
        np.asarray(want_ok)])


def test_affine_matches_serial():
    rng = np.random.default_rng(5)
    n = 4500
    a = jnp.asarray(rng.uniform(0.9, 1.1, (1, n)), jnp.float32)
    b = _rows(6, 1, n)
    A, B = scan_kernel._scan_rows("affine", (a, b), (1, 0), True)
    y0 = 0.7
    y = y0
    ys = np.empty(n)
    an, bn = np.asarray(a[0], np.float64), np.asarray(b[0], np.float64)
    for t in range(n):
        y = an[t] * y + bn[t]
        ys[t] = y
    got = np.asarray(A[0], np.float64) * y0 + np.asarray(B[0], np.float64)
    np.testing.assert_allclose(got, ys, rtol=3e-4, atol=3e-4)


def test_gather_matches():
    rng = np.random.default_rng(7)
    r, n, k = 3, 5000, 400
    table = jnp.asarray(rng.normal(size=(r, k)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, k, size=(r, n)), jnp.int32)
    got = scan_kernel._gather_rows(table, idx, True)
    want = np.take_along_axis(np.asarray(table), np.asarray(idx), axis=1)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_gather_int_table():
    rng = np.random.default_rng(8)
    table = jnp.asarray(rng.integers(0, 99, size=(1, 64)), jnp.int32)
    idx = jnp.asarray(rng.integers(0, 64, size=(1, 3000)), jnp.int32)
    got = scan_kernel._gather_rows(table, idx, True)
    want = np.take_along_axis(np.asarray(table), np.asarray(idx), axis=1)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_vmap_folds_batch_levels():
    """The custom-vmap rule must fold vmap batches into kernel rows (the
    public 1-D wrappers are always called under the engine's voice vmap)."""
    x = _rows(9, 8, 4000)

    def one(row):
        (out,) = scan_kernel._SCANS["sum"](row[None])
        return out[0]

    got = jax.vmap(one)(x)
    want = jnp.cumsum(x, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_eligibility_gates():
    x = jnp.zeros((100,), jnp.float32)          # too short
    assert not scan_kernel.eligible((x,), 0)
    y = jnp.zeros((4096, 2), jnp.float32)       # not 1-D
    assert not scan_kernel.eligible((y,), 0)
    z = jnp.zeros((4096,), jnp.float64)         # unsupported dtype
    assert not scan_kernel.eligible((z,), 0)
    t8 = jnp.zeros((8, 128), jnp.float32)       # fused-kernel tile shape
    assert not scan_kernel.gather_eligible(t8, t8.astype(jnp.int32))


def test_monotone_fill_matches_forward_fill():
    """For non-decreasing non-negative values, the running-max fill gives
    exactly forward_fill's result (float and int), and -1 before the
    first masked entry."""
    rng = np.random.default_rng(9)
    for dtype in (np.float32, np.int32):
        vals = np.cumsum(rng.integers(0, 4, (3, 700)), axis=1).astype(dtype)
        mask = rng.random((3, 700)) < 0.02
        got, ok = basic.monotone_fill(jnp.asarray(vals), jnp.asarray(mask),
                                      axis=1)
        want_v, want_ok = basic.forward_fill(jnp.asarray(vals),
                                             jnp.asarray(mask), axis=1)
        np.testing.assert_array_equal(np.asarray(ok), np.asarray(want_ok))
        np.testing.assert_array_equal(np.asarray(got)[np.asarray(ok)],
                                      np.asarray(want_v)[np.asarray(want_ok)])
        assert (np.asarray(got)[~np.asarray(ok)] == -1).all()
