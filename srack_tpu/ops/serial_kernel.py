"""Generic serial-stage Pallas kernel builder.

Runs an arbitrary per-sample step function over a [V, n] batch with the
sample loop *inside* the kernel: voices on VPU lanes as (8, 128) tiles,
state in registers between samples, VMEM scratch carrying tile state across
time chunks.  Used by both the whole-patch fused engine (ops/fused.py) and
the block engine's serial stages (block_engine.py).

``step(params, state, ins) -> (state, outs)`` where every per-voice scalar
is an (8, 128) tile; ``ins``/``outs`` are dicts of per-sample lanes.  The
step must be pure jnp register math (no gathers / ragged buffers) --
callers gate eligibility on module types.

All input wires are packed into ONE array so each sample costs a single
dynamic VMEM read, not one per wire -- per-sample dynamic accesses are
tens of cycles each and dominate multi-wire stages otherwise.  Output
wires are SEPARATE buffers written once per wire per unroll group (an
extra ~(n_outs-1)/unroll dynamic writes per sample): a packed
[n, n_outs, ...] output costs that whole stacked array in HBM *plus* a
materialized per-wire slice copy for every downstream Pallas consumer
(custom-call operands can't alias slices) -- measured 5.5 G + 3 x 1.83 G
of a 17 G peak on the sampler kit at [1024 x 480k], the allocation that
OOMed 30 s segmented renders.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..modules.base import CV_DTYPE

LANES = 128
SUBLANES = 8
TILE_VOICES = LANES * SUBLANES  # 1024


def ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def to_tiles(leaf, v, vp):
    """[V, *rest] -> [*rest, V_tiles, 8, 128] (+ bool -> int32)."""
    if leaf.dtype == jnp.bool_:
        leaf = leaf.astype(jnp.int32)
    rest = leaf.shape[1:]
    if vp != v:
        leaf = jnp.concatenate(
            [leaf, jnp.zeros((vp - v,) + rest, leaf.dtype)], axis=0)
    leaf = jnp.moveaxis(leaf, 0, -1)
    return leaf.reshape(rest + (vp // TILE_VOICES, SUBLANES, LANES))


def from_tiles(leaf, v, dtype):
    """Inverse of :func:`to_tiles`."""
    rest = leaf.shape[:-3]
    vp = leaf.shape[-3] * TILE_VOICES
    leaf = leaf.reshape(rest + (vp,))
    leaf = jnp.moveaxis(leaf, -1, 0)[:v]
    return leaf.astype(dtype)


def make_serial_kernel(step, n: int, out_keys, t_chunk: int = 512,
                       unroll: int = 8, interpret: bool = None):
    """Build ``run(params, state, ins) -> (outs, final_state)``.

    * ``params`` / ``state``: pytrees with a leading V axis on every leaf
      (state must have at least one leaf);
    * ``ins``: dict {key: [V, n] f32} of per-sample input lanes;
    * ``outs``: dict {key: [V, n] f32} for each key in ``out_keys``.
    Bool state leaves travel as int32 through VMEM and loop carries.
    """
    if t_chunk % unroll:
        raise ValueError(f"unroll={unroll} must divide t_chunk={t_chunk}")
    n_chunks = ceil_to(n, t_chunk) // t_chunk
    out_keys = list(out_keys)
    n_outs = len(out_keys)
    if interpret is None:
        # interpreter mode lets the kernels run (slowly) off-TPU for tests
        interpret = jax.default_backend() != "tpu"

    def run(params, state, ins):
        state_leaves, state_def = jax.tree.flatten(state)
        if not state_leaves:
            raise ValueError("serial kernel needs at least one state leaf")
        v = state_leaves[0].shape[0]
        vp = ceil_to(max(v, 1), TILE_VOICES)
        n_tiles = vp // TILE_VOICES

        # n need not be a t_chunk multiple: lanes stream UNPADDED (a
        # whole-render jnp.pad cost a fresh [V, n] HBM copy per wire) and
        # the final block runs a statically-shorter loop -- padding and
        # then stepping the serial state through the zero tail was also a
        # CORRECTNESS bug (the returned final state had absorbed
        # n_pad - n zero-input steps, breaking segmented continuity for
        # any t_chunk that doesn't divide the segment length).
        ins = {k: jnp.asarray(a, CV_DTYPE) for k, a in ins.items()}
        in_keys = sorted(ins)
        n_x = len(in_keys)
        # pack every input wire into one [T, n_x, tiles, 8, 128] array
        if n_x:
            ins_packed = jnp.stack(
                [to_tiles(ins[k], v, vp) for k in in_keys], axis=1)

        params_leaves, params_def = jax.tree.flatten(params)
        p_dtypes = [l.dtype for l in params_leaves]
        s_dtypes = [l.dtype for l in state_leaves]
        p_tiled = [to_tiles(l, v, vp) for l in params_leaves]
        s_tiled = [to_tiles(l, v, vp) for l in state_leaves]

        n_p, n_s = len(p_tiled), len(s_tiled)

        def kernel(*refs):
            p_refs = refs[:n_p]
            s_refs = refs[n_p:n_p + n_s]
            x_ref = refs[n_p + n_s] if n_x else None
            base = n_p + n_s + (1 if n_x else 0)
            out_refs = refs[base:base + n_outs]
            base += n_outs
            sout_refs = refs[base:base + n_s]
            scratches = refs[base + n_s:]

            t = pl.program_id(1)

            @pl.when(t == 0)
            def _():
                for sc, sr in zip(scratches, s_refs):
                    sc[...] = sr[...].reshape(sc.shape)

            def squeeze_tile(x):
                return x.reshape(x.shape[:-3] + (SUBLANES, LANES))

            p_vals = [squeeze_tile(r[...]).astype(d)
                      for r, d in zip(p_refs, p_dtypes)]
            params_k = jax.tree.unflatten(params_def, p_vals)

            # loop carries stay int32-or-wider (bool i1 vectors fail to
            # legalize in Mosaic's scf.for); cast at iteration edges
            carry0 = tuple(sc[...] for sc in scratches)

            def body(u, carry, x_rows):
                vals = [c.astype(d) if d == jnp.bool_ else c
                        for c, d in zip(carry, s_dtypes)]
                st = jax.tree.unflatten(state_def, vals)
                if n_x:
                    x_t = {k: x_rows[u, j] for j, k in enumerate(in_keys)}
                else:
                    x_t = {}
                new_state, outs = step(params_k, st, x_t)
                out_row = None
                if n_outs:
                    out_row = [
                        jnp.broadcast_to(outs[k], (SUBLANES, LANES))
                        .astype(CV_DTYPE) for k in out_keys]
                # a leaf fed by an unconnected (constant) input can collapse
                # to a scalar; broadcast back, store bools as int32
                out = []
                for leaf, ref in zip(jax.tree.leaves(new_state), carry):
                    out.append(jnp.broadcast_to(leaf, ref.shape).astype(ref.dtype))
                return tuple(out), out_row

            # manual unrolling (Pallas fori_loop can't partially unroll);
            # streamed wires are read/written ONCE per unroll group --
            # per-sample dynamic VMEM accesses are tens of cycles each
            def run_group(carry, base_i, m):
                x_rows = (x_ref[pl.ds(base_i, m), :, 0]
                          if n_x else None)  # (m, n_x, 8, 128)
                rows = []
                for u in range(m):
                    carry, out_row = body(u, carry, x_rows)
                    rows.append(out_row)
                for j in range(n_outs):
                    out_refs[j][pl.ds(base_i, m), 0] = jnp.stack(
                        [rows[u][j] for u in range(m)])
                return carry

            def body_u(j, carry):
                return run_group(carry, j * unroll, unroll)

            def finish(carry):
                for sc, val, sr in zip(scratches, carry, sout_refs):
                    sc[...] = val.reshape(sc.shape)
                    sr[...] = sc[...].reshape(sr.shape)

            # rem: samples in the FINAL block -- static, so the ragged
            # tail is a statically-shorter loop + one partial group (no
            # per-sample predication, no stepping past sample n-1)
            rem = n - (n_chunks - 1) * t_chunk
            if rem == t_chunk:
                finish(jax.lax.fori_loop(0, t_chunk // unroll, body_u,
                                         carry0))
            else:
                @pl.when(t != n_chunks - 1)
                def _():
                    finish(jax.lax.fori_loop(0, t_chunk // unroll, body_u,
                                             carry0))

                @pl.when(t == n_chunks - 1)
                def _():
                    carry = jax.lax.fori_loop(0, rem // unroll, body_u,
                                              carry0)
                    if rem % unroll:
                        carry = run_group(carry, (rem // unroll) * unroll,
                                          rem % unroll)
                    finish(carry)

        def tile_spec(leaf):
            rest = leaf.shape[:-3]
            block = rest + (1, SUBLANES, LANES)
            zeros = (0,) * len(rest)
            return pl.BlockSpec(
                block, lambda vtile, t, z=zeros: z + (vtile, 0, 0),
                memory_space=pltpu.VMEM)

        def packed_spec(width):
            return pl.BlockSpec(
                (t_chunk, width, 1, SUBLANES, LANES),
                lambda vtile, t: (t, 0, vtile, 0, 0),
                memory_space=pltpu.VMEM)

        def stream_spec():
            return pl.BlockSpec(
                (t_chunk, 1, SUBLANES, LANES),
                lambda vtile, t: (t, vtile, 0, 0),
                memory_space=pltpu.VMEM)

        in_specs = ([tile_spec(l) for l in p_tiled]
                    + [tile_spec(l) for l in s_tiled]
                    + ([packed_spec(n_x)] if n_x else []))
        out_specs = ([stream_spec() for _ in range(n_outs)]
                     + [tile_spec(l) for l in s_tiled])
        out_shape = (
            [jax.ShapeDtypeStruct(
                (n, n_tiles, SUBLANES, LANES), CV_DTYPE)
             for _ in range(n_outs)]
            + [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in s_tiled])
        scratch_shapes = [
            pltpu.VMEM(l.shape[:-3] + (SUBLANES, LANES), l.dtype)
            for l in s_tiled]

        operands = p_tiled + s_tiled + ([ins_packed] if n_x else [])
        results = pl.pallas_call(
            kernel,
            grid=(n_tiles, n_chunks),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=interpret,
        )(*operands)

        outs = {k: from_tiles(results[j], v, CV_DTYPE)[:, :n]
                for j, k in enumerate(out_keys)}
        state_results = results[n_outs:]
        final_leaves = [from_tiles(l, v, d)
                        for l, d in zip(state_results, s_dtypes)]
        final_state = jax.tree.unflatten(state_def, final_leaves)
        return outs, final_state

    return run
