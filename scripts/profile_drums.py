#!/usr/bin/env python
"""Per-component timing of the drums config's block-engine phases (dev tool).

Times each block-capable module's whole-block function and the serial stage
in isolation at farm scale, to show where drum-machine render time goes.
"""
import sys
import time

import jax
import jax.numpy as jnp

import srack_tpu as st
from srack_tpu.modules import CATALOG
from srack_tpu.ops import adsr_block

jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V, N = 1024, 48000
CFG = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                     precision="fast")


def timeit(name, fn, *args):
    out = fn(*args)
    peak = float(jnp.abs(jax.tree.leaves(out)[0]).max())  # force fetch
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        peak = float(jnp.abs(jax.tree.leaves(out)[0]).max())
        best = min(best, time.perf_counter() - t0)
    print(f"[{name}] best={best * 1e3:7.1f}ms "
          f"rate={V * N / best / 1e9:7.3f}G (peak {peak:.3f})",
          file=sys.stderr, flush=True)


def mod_block(type_name, ins_spec, **kwargs):
    """ins_spec: one char per module input -- 'g' gate drive, 'z' zeros,
    '.' unconnected."""
    mdef = CATALOG[type_name]
    statics, params = mdef.make(CFG, **kwargs)
    state = mdef.init_state(CFG, statics)
    n_driven = sum(c != "." for c in ins_spec)

    def one(params, state, ins):
        full = []
        j = 0
        for c in ins_spec:
            if c == ".":
                full.append(None)
            else:
                full.append(ins[j])
                j += 1
        new_state, outs = mdef.block(CFG, statics, params, state,
                                     full, None, N)
        return outs[0]

    params_v = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape),
                            params)
    state_v = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape),
                           state)
    # a plausible gate/cv drive: 8 Hz clock square
    t = jnp.arange(N, dtype=jnp.float32)
    gate = jnp.where((t % 6000) < 3000, 1.0, 0.0)
    ins = [jnp.broadcast_to(gate, (V, N))] + [
        jnp.zeros((V, N), jnp.float32)] * max(0, n_driven - 1)

    fn = jax.jit(jax.vmap(one))
    timeit(type_name + (f"[{kwargs.get('max_len', '')}]"
                        if type_name == "Sample" else ""),
           fn, params_v, state_v, ins)


def main():
    import numpy as np
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)

    wav = (np.sin(np.linspace(0, 60, 400)) * 0.5).astype(np.float32)
    mod_block("Sample", "gz", samples=wav, wav_sample_rate=48000.0)
    mod_block("ADSR", "g", a_sec=0.001, d_sec=0.08, s_val=0.0, r_sec=0.03)
    mod_block("Pattern Sequencer", "g.",
              pattern=[[True, None, False, None] * 4] * 3, n_steps=16)
    mod_block("Oscillator", "..", val=-3.5)

    # serial stage alone: noise->moog->vca sub-patch via the block engine
    p = st.Patch(CFG)
    noise = p.add("Noise", name="noise")
    flt = p.add("Moog Filter", freq=0.6, res=0.3, name="flt")
    p.connect(noise, 0, flt, "Audio")
    p.connect(flt, 1, p.output, 0)
    compiled = st.compile_patch(p)
    params = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape),
                          p.params())
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape),
                         compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), V)
    fn = compiled._get_fn(N, True, "block")
    timeit("serial:noise+moog", fn, params, state, keys, {})


if __name__ == "__main__":
    main()
