"""Batch render farm: thousands of voices/patches over a device mesh.

BASELINE config 5: independent randomized patches of one topology rendered
in parallel for dataset generation.  Voices are pure data parallelism --
the hot path has zero cross-chip traffic; audio is gathered (or mix-bussed
with a ``psum``) only at collection (SURVEY.md §2f).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from ..compiler import compile_patch
from ..patch import Patch, ModuleHandle
from .mesh import batch_sharding, make_mesh, replicated, shard_batch


def render_farm(patch: Patch, n_samples: int, *, params: dict,
                mesh=None, state: Optional[dict] = None, key=None,
                drivers=None, mixdown: bool = False,
                probes: Sequence = ()):
    """Render a sharded batch of voices.

    ``params`` carries a leading voice axis on every leaf; it is sharded
    over all mesh axes.  With ``mixdown=True`` the per-voice audio is summed
    into one ``[channels, n]`` mix bus -- on a mesh this lowers to an XLA
    ``psum`` over ICI (the only collective synthesis needs).
    """
    if mesh is None:
        mesh = make_mesh()
    compiled = compile_patch(patch, probes=probes)
    v = jax.tree.leaves(params)[0].shape[0]

    params = shard_batch(params, mesh)
    if state is None:
        state = compiled.init_state()
        state = jax.tree.map(lambda a: jnp.broadcast_to(a, (v,) + a.shape),
                             state)
    state = shard_batch(state, mesh)
    if key is None:
        key = jax.random.PRNGKey(0)
    elif isinstance(key, int):
        key = jax.random.PRNGKey(key)
    keys = shard_batch(jax.random.split(key, v), mesh)

    drv = {}
    if drivers:
        for module, arr in drivers.items():
            mid = module.id if isinstance(module, ModuleHandle) else module
            drv[mid] = arr
    drv = shard_batch(drv, mesh)

    vmapped = compiled._get_fn(int(n_samples), batched=True,
                               engine=compiled.auto_engine(batched=True))

    if not mixdown:
        return vmapped(params, state, keys, drv)

    def run_and_mix(p, s, k, d):
        audio, probe_ys, final_state = vmapped(p, s, k, d)
        return audio.sum(axis=0), probe_ys, final_state

    out_shardings = (replicated(mesh), batch_sharding(mesh),
                     batch_sharding(mesh))
    mixed = jax.jit(run_and_mix, out_shardings=out_shardings)(
        params, state, keys, drv)
    return mixed
