"""VMEM-resident chunked associative scans (Pallas TPU).

The block paths lean on log-doubling scans (``ops/basic``: fast_cumsum,
forward_fill, affine_scan) whose XLA form materialises the whole array once
per pass -- log2(n) x 2 x array-size of HBM traffic (CLAUDE.md: a
[1024, 48000] fill moves ~7 GB; the unchunked ADSR machinery peaked >100 GB
of temporaries).  This kernel instead streams the array through VMEM once:
each grid step loads a [rows, T_CHUNK] tile, log-doubles it *in VMEM*
(static lane shifts), folds in a carried prefix from the previous chunk,
and writes the finished tile -- HBM traffic = read input + write output,
the speed-of-light for a scan.

Four scan kinds cover every primitive the modules use:

* ``sum`` / ``max`` -- inclusive cumsum / cummax;
* ``fill``          -- "last value where mask held" (k values, one mask);
* ``affine``        -- compose ``y -> a[t]*y + b[t]`` maps (ADSR retrigger
                       levels, comb damping one-poles).

Batching: the public wrappers in ``ops/basic`` call :func:`scan_1d` on
logically-1-D arrays *inside* ``jax.vmap`` (the block engine vmaps modules
over voices).  ``scan_1d`` carries a ``jax.custom_batching.custom_vmap``
rule that flattens each batch level into the kernel's row axis, so the
kernel always sees a dense [rows, n] problem and Pallas's default
pallas_call batching (whose grid/program_id interplay is easy to get
wrong) is never used.

No reference analogue: this is TPU memory-system engineering for the block
engine (the Rust engine is per-sample serial, synth.rs:97-101).

Autodiff: pallas_call has no VJP -- gradients go through the XLA
log-doubling path (ops/basic falls back off-TPU; TPU training uses the
fused custom-VJP kernel, ops/fused_vjp.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROW_BLOCK = 32     # rows (voices) per kernel instance
T_CHUNK = 2048     # time lanes per grid step (VMEM tile: 32x2048 f32 = 256K)

# below this length the XLA log-doubling path wins (kernel launch + pad
# overhead).  1024 admits Freeverb's ~1.2k-sample comb-damping recurrences
# (16 per chunk scan body at farm scale -- the XLA form moved ~70 GB of
# log-doubling traffic per rendered second).
MIN_N = 1024

KINDS = {
    # kind -> number of scanned arrays given k "value" arrays
    "sum": 1,
    "max": 1,
    "fill": None,   # k values + 1 mask
    "affine": 2,    # (A, B)
}


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _idents(kind, arrs):
    """Per-array scan identity as *static Python scalars* (they are baked
    into the kernel: tail padding, shift fill and the chunk-0 carry)."""
    if kind == "sum":
        return (0,)
    if kind == "max":
        d = arrs[0].dtype
        return ((jnp.iinfo(d).min if jnp.issubdtype(d, jnp.integer)
                 else float("-inf")),)
    if kind == "fill":
        return (0,) * len(arrs)  # mask identity 0: not-yet-valid
    if kind == "affine":
        return (1, 0)
    raise ValueError(kind)


def _shift(x, s, fill):
    """x shifted ``s`` lanes later along axis 1, front-filled (static s)."""
    rows, n = x.shape
    if s >= n:
        return jnp.full_like(x, fill)
    pad = jnp.full((rows, s), fill, x.dtype)
    return jnp.concatenate([pad, x[:, : n - s]], axis=1)


def _scan_block(kind, vals, idents):
    """Inclusive Hillis-Steele scan of [rows, T] arrays along axis 1."""
    n = vals[0].shape[1]
    s = 1
    while s < n:
        if kind == "sum":
            vals = [vals[0] + _shift(vals[0], s, idents[0])]
        elif kind == "max":
            vals = [jnp.maximum(vals[0], _shift(vals[0], s, idents[0]))]
        elif kind == "fill":
            ok = vals[-1]
            shifted = [_shift(v, s, i) for v, i in zip(vals, idents)]
            vals = [jnp.where(ok != 0, v, sv)
                    for v, sv in zip(vals[:-1], shifted[:-1])]
            vals.append(ok | shifted[-1])
        elif kind == "affine":
            a, b = vals
            a_s = _shift(a, s, idents[0])
            b_s = _shift(b, s, idents[1])
            vals = [a * a_s, a * b_s + b]
        s <<= 1
    return vals


def _apply_carry(kind, carry, vals):
    """Fold the previous chunks' prefix (carry: [rows, 1]) into a scanned
    chunk.  The carry is the combined value of everything before the chunk,
    applied on the left."""
    if kind == "sum":
        return [vals[0] + carry[0]]
    if kind == "max":
        return [jnp.maximum(vals[0], carry[0])]
    if kind == "fill":
        ok = vals[-1]
        out = [jnp.where(ok != 0, v, c)
               for v, c in zip(vals[:-1], carry[:-1])]
        out.append(ok | carry[-1])
        return out
    if kind == "affine":
        a, b = vals
        return [a * carry[0], a * carry[1] + b]
    raise ValueError(kind)


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def _scan_rows(kind, arrs, idents, interpret):
    """The kernel proper: inclusive scan of [R, n] arrays along axis 1.

    ``idents`` are static Python scalars; tail padding holds the scan
    identity so it can't corrupt the carried prefix."""
    r, n = arrs[0].shape
    rp = _ceil_to(max(r, 1), ROW_BLOCK)
    np_ = _ceil_to(n, T_CHUNK)
    padded = [jnp.pad(a, ((0, rp - r), (0, np_ - n)), constant_values=ident)
              for a, ident in zip(arrs, idents)]
    n_arr = len(padded)

    def kernel(*refs):
        in_refs = refs[:n_arr]
        out_refs = refs[n_arr:2 * n_arr]
        scratches = refs[2 * n_arr:]
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            for sc, ident in zip(scratches, idents):
                sc[...] = jnp.full(sc.shape, ident, sc.dtype)

        vals = [ref[...] for ref in in_refs]
        scanned = _scan_block(kind, vals, idents)
        carry = [sc[:, :1] for sc in scratches]
        out = _apply_carry(kind, carry, scanned)
        for ref, o in zip(out_refs, out):
            ref[...] = o
        for sc, o in zip(scratches, out):
            sc[...] = jnp.broadcast_to(o[:, -1:], sc.shape)

    spec = pl.BlockSpec((ROW_BLOCK, T_CHUNK), lambda rr, tt: (rr, tt),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(rp // ROW_BLOCK, np_ // T_CHUNK),
        in_specs=[spec] * n_arr,
        out_specs=[spec] * n_arr,
        out_shape=[jax.ShapeDtypeStruct((rp, np_), a.dtype) for a in padded],
        scratch_shapes=[pltpu.VMEM((ROW_BLOCK, LANES), a.dtype)
                        for a in padded],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*padded)
    return [o[:r, :n] for o in outs]


def _make_scan1d(kind):
    """[n]-array scan with a custom vmap rule that folds every batch level
    into the kernel's row axis (each rule application removes one level)."""

    @jax.custom_batching.custom_vmap
    def f(*arrs):  # each [rows, n]
        idents = _idents(kind, list(arrs))
        return tuple(_scan_rows(kind, tuple(arrs), tuple(idents),
                                jax.default_backend() != "tpu"))

    @f.def_vmap
    def _rule(axis_size, in_batched, *arrs):
        arrs = [a if b else
                jnp.broadcast_to(a[None], (axis_size,) + a.shape)
                for a, b in zip(arrs, in_batched)]
        flat = [a.reshape((-1, a.shape[-1])) for a in arrs]
        outs = f(*flat)
        outs = tuple(o.reshape((axis_size, -1, o.shape[-1])) for o in outs)
        return outs, (True,) * len(outs)

    return f


_SCANS = {k: _make_scan1d(k) for k in KINDS}


# -- table gather -------------------------------------------------------

# largest table the in-kernel select chain unrolls over (the chain is
# O(K) vector ops per tile; past this the XLA gather is no worse)
GATHER_MAX_K = 1024


@functools.partial(jax.jit, static_argnums=(2,))
def _gather_rows(table, idx, interpret):
    """``out[r, j] = table[r, idx[r, j]]`` -- [R, K] table, [R, n] int32
    indices already clipped to [0, K).

    In-kernel K-way select chain: the same op count as the XLA
    ``table_lookup`` chain, but guaranteed to run as ONE VMEM-resident
    pass.  XLA splits long elementwise chains into several fusions, each
    re-materializing the [R, n] array through HBM -- measured 128 ms for a
    K=400 lookup over [1024, 48000] where the chain itself is ~40 ms of
    VPU work."""
    r, k = table.shape
    _, n = idx.shape
    rp = _ceil_to(max(r, 1), ROW_BLOCK)
    np_ = _ceil_to(n, T_CHUNK)
    kp = _ceil_to(k, LANES)
    table = jnp.pad(table, ((0, rp - r), (0, kp - k)))
    idx = jnp.pad(idx, ((0, rp - r), (0, np_ - n)))

    def kernel(t_ref, i_ref, o_ref):
        tbl = t_ref[...]
        ix = i_ref[...]
        acc = jnp.broadcast_to(tbl[:, :1], ix.shape).astype(tbl.dtype)
        for j in range(1, k):
            acc = jnp.where(ix == j, tbl[:, j:j + 1], acc)
        o_ref[...] = acc

    out = pl.pallas_call(
        kernel,
        grid=(rp // ROW_BLOCK, np_ // T_CHUNK),
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, kp), lambda rr, tt: (rr, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_BLOCK, T_CHUNK), lambda rr, tt: (rr, tt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK, T_CHUNK), lambda rr, tt: (rr, tt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, np_), table.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(table, idx)
    return out[:r, :n]


@jax.custom_batching.custom_vmap
def _gather2d(table, idx):
    return _gather_rows(table, idx, jax.default_backend() != "tpu")


@_gather2d.def_vmap
def _gather_rule(axis_size, in_batched, table, idx):
    table, idx = (a if b else
                  jnp.broadcast_to(a[None], (axis_size,) + a.shape)
                  for a, b in zip((table, idx), in_batched))
    out = _gather2d(table.reshape((-1, table.shape[-1])),
                    idx.reshape((-1, idx.shape[-1])))
    return out.reshape((axis_size, -1, out.shape[-1])), True


def gather_eligible(table, idx) -> bool:
    return (table.ndim == 1 and idx.ndim == 1
            and idx.shape[0] >= MIN_N
            and 2 <= table.shape[0] <= GATHER_MAX_K
            and table.dtype in _OK_DTYPES
            and jax.default_backend() == "tpu")


def gather_1d(table, idx):
    """``table[idx]`` -- 1-D table and indices (idx clipped by caller)."""
    out = _gather2d(table[None], idx.astype(jnp.int32)[None])
    return out[0]


# -- wrappers ------------------------------------------------------------

def _to2d(x):
    return x[None] if x.ndim == 1 else x


_OK_DTYPES = (jnp.float32, jnp.int32)


def eligible(arrs, axis) -> bool:
    """True when the Pallas path applies: scan along the last axis of a
    1-D ([n]) or 2-D ([rows, n]) logical array (any vmap batch axes are
    hidden and folded into rows by the custom-vmap rule), a long-enough
    scan axis, supported dtypes, and a real TPU backend."""
    a0 = arrs[0]
    return (a0.ndim in (1, 2)
            and axis == a0.ndim - 1
            and a0.shape[-1] >= MIN_N
            and all(a.shape == a0.shape for a in arrs)
            and all(a.dtype in _OK_DTYPES or a.dtype == jnp.bool_
                    for a in arrs)
            and jax.default_backend() == "tpu")


def cumsum_1d(x):
    (out,) = _SCANS["sum"](_to2d(x))
    return out[0] if x.ndim == 1 else out


def cummax_1d(x):
    (out,) = _SCANS["max"](_to2d(x))
    return out[0] if x.ndim == 1 else out


def fill_1d(values: tuple, mask):
    """forward_fill_multi on 1-D arrays: returns (filled_tuple, ok_bool)."""
    m = _to2d(mask).astype(jnp.int32)
    vs = [_to2d(v) for v in values]
    outs = _SCANS["fill"](*vs, m)
    filled = tuple(o[0] if v.ndim == 1 else o
                   for o, v in zip(outs[:-1], values))
    ok = outs[-1] != 0
    return filled, (ok[0] if mask.ndim == 1 else ok)


def affine_1d(a, b):
    """Inclusive composition of y -> a[t]*y + b[t]; returns (A, B)."""
    A, B = _SCANS["affine"](_to2d(a), _to2d(b))
    if b.ndim == 1:
        return A[0], B[0]
    return A, B
