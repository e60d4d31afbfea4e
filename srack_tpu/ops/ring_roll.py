"""Per-row ring-buffer canonicalization (Pallas TPU).

Freeverb stores each delay line as a ring buffer with a per-voice write
index so its state stays interchangeable with the per-sample scan step
(modules/freeverb.py; reference semantics: the freeverb crate's
comb/allpass rings wrapped by /root/reference/src/synth/freeverb.rs).
The block path needs the lines in chronological order (oldest first) once
per render.  The XLA formulation -- ``vmap`` over per-voice
``dynamic_slice(concat([buf, buf]), idx)`` -- lowers to the known-slow XLA
gather: ~39 ms of a 93 ms 1-s reverb render at 1024 voices (round-3
profile, scripts/profile_reverb.py).  This kernel does the same rotation
in VMEM with per-row ``pltpu.roll`` by a traced shift: HBM cost = one
read + one write of the lines, ~0.3 ms at farm scale.

Hardware constraints (scripts/probe_rot.py, scripts/probe_ring.py):
unaligned dynamic lane-START slices are NOT lowerable ("cannot statically
prove index is a multiple of 128"); ``pltpu.roll`` follows
``np.roll(+s)`` semantics AND its ``tpu.dynamic_rotate`` lowering needs a
128-aligned vector shape ("unsupported unaligned shape" on 1x1214).  So:
double the line into an aligned buffer of ``M = ceil(2L/128)*128`` lanes
and roll THAT by ``(M - idx) %% M`` -- for ``i < L`` the rolled position
``(i + idx) mod M`` stays below ``2L`` (since ``idx < L``), so the pad
junk never reaches the first ``L`` lanes, and a static ``[:L]`` slice
(unaligned static widths are fine) is exactly the left-rotation.

``ring_align(buf, idx)``: logical 1-D ``buf[L]`` and scalar ``idx``;
returns ``chrono[i] = buf[(idx + i) % L]``.  Batch axes (vmap over
voices) fold into kernel rows via ``jax.custom_batching.custom_vmap``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VB = 32  # voices (rows) per kernel instance


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(length: int, m: int):
    def kernel(h2_ref, i_ref, o_ref):
        rows = []
        for r in range(VB):
            # left-rotate row r by idx: np.roll(-idx) == np.roll(M - idx)
            shift = (m - i_ref[r, 0]) % m
            rolled = pltpu.roll(h2_ref[r:r + 1, :], shift, axis=1)
            rows.append(rolled[:, :length])
        o_ref[...] = jnp.concatenate(rows, axis=0)

    return kernel


@functools.partial(jax.jit, static_argnums=(2,))
def _align_rows(buf, idx, interpret):
    """[R, L] rings + [R] starts -> [R, L] chronological."""
    r, length = buf.shape
    rp = _ceil_to(max(r, 1), VB)
    if rp != r:
        buf = jnp.pad(buf, ((0, rp - r), (0, 0)))
        idx = jnp.pad(idx, (0, rp - r))
    m = _ceil_to(2 * length, 128)
    h2 = jnp.pad(jnp.concatenate([buf, buf], axis=1),
                 ((0, 0), (0, m - 2 * length)))
    out = pl.pallas_call(
        _make_kernel(length, m),
        grid=(rp // VB,),
        in_specs=[
            pl.BlockSpec((VB, m), lambda rr: (rr, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((VB, 1), lambda rr: (rr, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((VB, length), lambda rr: (rr, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, length), buf.dtype),
        interpret=interpret,
    )(h2, idx.astype(jnp.int32)[:, None])
    return out[:r]


@jax.custom_batching.custom_vmap
def ring_align(buf, idx):
    out = _align_rows(buf[None], jnp.asarray(idx)[None],
                      jax.default_backend() != "tpu")
    return out[0]


@ring_align.def_vmap
def _align_rule(axis_size, in_batched, buf, idx):
    buf, idx = (a if b else
                jnp.broadcast_to(a[None], (axis_size,) + a.shape)
                for a, b in zip((buf, jnp.asarray(idx)), in_batched))
    out = _align_rows(buf.reshape((-1, buf.shape[-1])),
                      idx.reshape((-1,)),
                      jax.default_backend() != "tpu")
    return out.reshape(buf.shape), True
