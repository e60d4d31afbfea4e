"""Block (stage-partition) engine tests: partition correctness and
agreement with the scan engine on every preset."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import srack_tpu as st
from srack_tpu import presets
from srack_tpu.presets import farm_params

CFG_KW = dict(sample_rate=4800, block_size=64, precision="exact")


def _compare(patch, n=512, v=3, atol=5e-6):
    compiled = st.compile_patch(patch)
    params = farm_params(patch, v)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (v,) + a.shape),
                         compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), v)
    a_scan, _, st_s = compiled.render(n, params=params, state=state,
                                      key=keys, batched=True, engine="scan")
    a_blk, _, st_b = compiled.render(n, params=params, state=state,
                                     key=keys, batched=True, engine="block")
    np.testing.assert_allclose(np.asarray(a_blk), np.asarray(a_scan),
                               atol=atol, rtol=0)
    return compiled


@pytest.mark.parametrize("name", ["sine", "subtractive", "sequencer",
                                  "feedback", "reverb", "drums", "sampler"])
def test_block_matches_scan_presets(name):
    channels = 2 if name == "reverb" else 1
    cfg = st.AudioConfig(channels=channels, **CFG_KW)
    _compare(presets.PRESETS[name](cfg))


def test_partition_subtractive():
    cfg = st.AudioConfig(channels=1, **CFG_KW)
    compiled = st.compile_patch(presets.subtractive_voice(cfg))
    prog = compiled.block_program()
    types = {mid: compiled.instances[mid][0].type_name
             for mid in compiled.instances}
    stage_types = sorted(types[m] for m in prog.stage_plan)
    # the recurrence cores run per-sample in the serial stage (ADSR by
    # measured preference over its segment-parallel form, see
    # block_engine.SERIAL_TYPES); oscillators/mixers stay block-wise
    assert stage_types == ["ADSR", "Moog Filter"]
    assert len(prog.pre_plan) == 4 and len(prog.post_plan) == 2


def test_partition_pure_block():
    cfg = st.AudioConfig(channels=1, **CFG_KW)
    compiled = st.compile_patch(presets.sine_patch(cfg))
    prog = compiled.block_program()
    assert not prog.stage_plan  # no serial modules at all


def test_feedback_cycle_forces_serial():
    cfg = st.AudioConfig(channels=1, **CFG_KW)
    compiled = st.compile_patch(presets.feedback_patch(cfg))
    prog = compiled.block_program()
    # the cross-FM oscillators and their Multiplys are all cycle members
    assert len(prog.stage_plan) >= 4


def test_block_engine_osc_sync():
    cfg = st.AudioConfig(channels=1, **CFG_KW)
    p = st.Patch(cfg)
    clock = p.add("Oscillator", val=-6.0)
    osc = p.add("Oscillator", val=-1.0)
    lfo = p.add("Oscillator", val=-7.0)
    depth = p.add("Multiply", constant=0.3)
    p.connect(lfo, "Sine", depth, "In1")
    p.connect(depth, 0, osc, "CV")       # CV-modulated (true cumsum path)
    p.connect(clock, "Square", osc, "Sync")  # hard sync (segmented path)
    p.connect(osc, "Sawtooth", p.output, 0)
    _compare(p)


def test_block_engine_state_continuity():
    cfg = st.AudioConfig(channels=1, **CFG_KW)
    p = presets.subtractive_voice(cfg)
    compiled = st.compile_patch(p)
    v, n = 2, 256
    params = farm_params(p, v)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (v,) + a.shape),
                         compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), v)
    full, _, _ = compiled.render(n, params=params, state=state, key=keys,
                                 batched=True, engine="block")
    a1, _, mid_state = compiled.render(n // 2, params=params, state=state,
                                       key=keys, batched=True, engine="block")
    a2, _, _ = compiled.render(n // 2, params=params, state=mid_state,
                               key=keys, batched=True, engine="block")
    joined = jnp.concatenate([a1, a2], axis=-1)
    np.testing.assert_allclose(np.asarray(joined), np.asarray(full),
                               atol=5e-6, rtol=0)


def test_unbatched_block_render():
    cfg = st.AudioConfig(channels=1, **CFG_KW)
    p = presets.subtractive_voice(cfg)
    compiled = st.compile_patch(p)
    a_blk, _, _ = compiled.render(256, engine="block")
    a_scan, _, _ = compiled.render(256, engine="scan")
    np.testing.assert_allclose(np.asarray(a_blk), np.asarray(a_scan),
                               atol=5e-6, rtol=0)


def test_block_engine_probes():
    cfg = st.AudioConfig(channels=1, **CFG_KW)
    p = presets.subtractive_voice(cfg)
    env_id = [i.id for i in p if i.mdef.type_name == "ADSR"][0]   # stage
    lfo_id = [i.id for i in p if i.name == "lfo"][0]              # pre
    compiled = st.compile_patch(p, probes=[(env_id, 0), (lfo_id, "Sine")])
    n, v = 256, 2
    params = farm_params(p, v)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (v,) + a.shape),
                         compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), v)
    a_b, probes_b, _ = compiled.render(n, params=params, state=state,
                                       key=keys, batched=True,
                                       engine="block")
    a_s, probes_s, _ = compiled.render(n, params=params, state=state,
                                       key=keys, batched=True,
                                       engine="scan")
    assert set(probes_b) == set(probes_s) == {f"{env_id}:0", f"{lfo_id}:0"}
    for k in probes_b:
        np.testing.assert_allclose(np.asarray(probes_b[k]),
                                   np.asarray(probes_s[k]),
                                   atol=5e-6, rtol=0)


def test_sample_player_block_matches_scan():
    cfg = st.AudioConfig(channels=1, **CFG_KW)
    p = st.Patch(cfg)
    # exact power-of-two rate so f32 prefix sums are bit-identical to the
    # serial accumulation (no nearest-neighbour index ties)
    wav = np.linspace(-1, 1, 40).astype(np.float32)
    smp = p.add("Sample", samples=wav, wav_sample_rate=cfg.sample_rate // 2)
    clk = p.add("Oscillator", val=-6.0)  # retriggers during the render
    p.connect(clk, "Square", smp, "Gate")
    p.connect(smp, 0, p.output, 0)
    _compare(p, n=512, atol=0)


@pytest.mark.parametrize("name", ["sine", "subtractive", "sequencer",
                                  "feedback", "reverb", "drums"])
def test_buffer_feedback_block_matches_scan(name):
    """Buffer-feedback compat mode on the block engine (outer scan over
    blocks; fb edges read the previous block's lanes) matches the scan
    engine's reference-exact previous-buffer timing, including continued
    renders from a carried state."""
    channels = 2 if name == "reverb" else 1
    cfg = st.AudioConfig(sample_rate=4800, block_size=64, channels=channels,
                         precision="exact", buffer_feedback=True)
    patch = presets.PRESETS[name](cfg)
    compiled = st.compile_patch(patch)
    n, v = 512, 2
    params = farm_params(patch, v)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (v,) + a.shape),
                         compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), v)
    a_s, _, _ = compiled.render(n, params=params, state=state, key=keys,
                                batched=True, engine="scan")
    a_b, _, st_b = compiled.render(n, params=params, state=state, key=keys,
                                   batched=True, engine="block")
    np.testing.assert_allclose(np.asarray(a_b), np.asarray(a_s),
                               atol=5e-6, rtol=0)
    a_s2, _, _ = compiled.render(n, params=params, state=st_b, key=keys,
                                 batched=True, engine="scan")
    a_b2, _, _ = compiled.render(n, params=params, state=st_b, key=keys,
                                 batched=True, engine="block")
    np.testing.assert_allclose(np.asarray(a_b2), np.asarray(a_s2),
                               atol=5e-6, rtol=0)


def test_buffer_feedback_block_matches_oracle():
    """Cross-FM + filter-feedback patch in buffer mode on the block engine
    matches the NumPy oracle's literal reference semantics."""
    from srack_tpu.oracle import oracle_render
    cfg = st.AudioConfig(sample_rate=4800, block_size=64, channels=1,
                         precision="exact", buffer_feedback=True)
    patch = presets.feedback_patch(cfg)
    a_b, _, _ = st.render(patch, 256, engine="block")
    want = oracle_render(patch, 256)
    np.testing.assert_allclose(np.asarray(a_b), want, atol=3e-6, rtol=0)


@pytest.mark.slow
def test_freeverb_block_partial_chunk_state_carry():
    """Regression: renders whose length is not a multiple of the Freeverb
    chunk size must not push padding into the delay lines -- continued
    renders stay sample-exact (bug found writing the buffer-mode engine)."""
    from srack_tpu.modules.freeverb import FREEVERB
    cfg = st.AudioConfig(sample_rate=4800, block_size=64, channels=2,
                         precision="exact")
    statics, params = FREEVERB.make(cfg)
    n = 400
    rng = np.random.default_rng(0)
    l = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.3)
    r = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.3)
    s_ref = FREEVERB.init_state(cfg, statics)
    ref = []
    for t in range(n):
        s_ref, o = FREEVERB.step(cfg, statics, params, s_ref, [l[t], r[t]])
        ref.append([float(o[0]), float(o[1])])
    ref = np.array(ref)
    for sizes in ([64] * 6 + [16], [33, 367], [400]):
        s = FREEVERB.init_state(cfg, statics)
        got, pos = [], 0
        for sz in sizes:
            s, o = FREEVERB.block(cfg, statics, params, s,
                                  [l[pos:pos + sz], r[pos:pos + sz]],
                                  None, sz)
            got.append(np.stack([np.asarray(o[0]), np.asarray(o[1])], 1))
            pos += sz
        np.testing.assert_allclose(np.concatenate(got), ref,
                                   atol=1e-12, rtol=0)


def test_pallas_safe_is_the_fused_register_set():
    """One shared eligibility set: the serial stage's Pallas-safe types are
    exactly the fused engine's register-math types (drift regression)."""
    from srack_tpu import block_engine
    from srack_tpu.ops import fused
    assert block_engine.PALLAS_SAFE is fused.REGISTER_TYPES


def test_partition_absorbs_safe_neighbors_into_stage():
    """Stage absorption + parallel-modules-post (perf regression pins):
    the drum machine's clock/sequencer/voice chain all run inside the
    serial Pallas stage (their XLA block impls cost whole-render HBM
    passes -- the sequencer's [n, V] monotone_fill alone OOMed 30 s
    renders); the hat Sample, parallel to the stage, runs POST so its
    producers stay absorbable."""
    from srack_tpu.block_engine import BlockProgram
    cfg = st.AudioConfig(sample_rate=4800, block_size=64, precision="fast")
    compiled = st.compile_patch(presets.drum_machine(cfg))
    prog = BlockProgram(compiled)
    names = lambda mids: [compiled.instances[m][0].type_name for m in mids]
    assert prog.pre_plan == []
    assert "Pattern Sequencer" in names(prog.stage_plan)
    assert names(prog.post_plan) == ["Sample", "Mono Mixer", "Output"]
    assert prog.pallas_ok


def test_partition_synthesizes_stage_without_serial_core():
    """A patch with no ADSR/Moog (sampler kit) still gets a Pallas stage
    seeded from the register-safe ancestors of its Sample modules."""
    from srack_tpu.block_engine import BlockProgram
    cfg = st.AudioConfig(sample_rate=4800, block_size=64, precision="fast")
    compiled = st.compile_patch(presets.sampler_kit(cfg))
    prog = BlockProgram(compiled)
    names = lambda mids: [compiled.instances[m][0].type_name for m in mids]
    assert prog.pre_plan == []
    assert set(names(prog.stage_plan)) == {"Oscillator", "Pattern Sequencer"}
    assert names(prog.post_plan).count("Sample") == 3
    assert prog.pallas_ok
    # exact mode keeps the old fully-block partition (no synthesized stage)
    cfgx = st.AudioConfig(sample_rate=4800, block_size=64, precision="exact")
    progx = BlockProgram(st.compile_patch(presets.sampler_kit(cfgx)))
    assert progx.stage_plan == []
