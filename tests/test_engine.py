"""Engine entry-point tests: state continuity, streaming, batching, probes,
compile caching."""

import numpy as np
import jax

import srack_tpu as st


def subtractive_voice(cfg):
    """BASELINE config 2: VCO -> Moog LP -> VCA with ADSR + LFO pitch mod."""
    p = st.Patch(cfg)
    lfo = p.add("Oscillator", val=-7.0)
    depth = p.add("Multiply", constant=0.02)
    osc = p.add("Oscillator", val=-1.0)
    flt = p.add("Moog Filter", freq=0.35, res=0.4)
    env = p.add("ADSR", a_sec=0.01, d_sec=0.05, s_val=0.5, r_sec=0.1)
    gate = p.add("Input")
    vca = p.add("VCA")
    p.connect(lfo, "Sine", depth, "In1")
    p.connect(depth, 0, osc, "CV")
    p.connect(osc, "Sawtooth", flt, "Audio")
    p.connect(gate, 0, env, "Gate")
    p.connect(flt, 0, vca, "Audio")
    p.connect(env, 0, vca, "CV")
    p.connect(vca, 0, p.output, 0)
    return p, gate


CFG = st.AudioConfig(sample_rate=4800, block_size=64, channels=1,
                     precision="exact")


def gate_sig(n):
    return ((np.arange(n) % 200) < 100).astype(np.float32)


def test_state_continuity_split_render():
    p, gate = subtractive_voice(CFG)
    n = 512
    g = gate_sig(n)
    full, _, _ = st.render(p, n, drivers={gate: g})
    first, _, state = st.render(p, n // 2, drivers={gate: g[: n // 2]})
    second, _, _ = st.render(p, n // 2, state=state, drivers={gate: g[n // 2:]})
    joined = np.concatenate([np.asarray(first), np.asarray(second)], axis=1)
    np.testing.assert_allclose(np.asarray(full), joined, atol=1e-6, rtol=0)


def test_stream_matches_offline():
    cfg = CFG
    p = st.Patch(cfg)
    osc = p.add("Oscillator", val=0.5)
    p.connect(osc, "Square", p.output, 0)
    n_blocks = 4
    offline, _, _ = st.render(p, cfg.block_size * n_blocks)
    chunks = [np.asarray(a) for a, _, _ in
              st.render_stream(p, n_blocks=n_blocks)]
    np.testing.assert_allclose(
        np.asarray(offline), np.concatenate(chunks, axis=1), atol=1e-6, rtol=0)


def test_probes_tap_internal_wires():
    p, gate = subtractive_voice(CFG)
    env_id = [inst.id for inst in p if inst.mdef.type_name == "ADSR"][0]
    n = 256
    audio, probes, _ = st.render(p, n, drivers={gate: gate_sig(n)},
                                 probes=[(env_id, 0)])
    key = f"{env_id}:0"
    assert key in probes
    env = np.asarray(probes[key])
    assert env.shape == (n,)
    assert env.max() > 0.5  # envelope opened


def test_render_batch_matches_individual_renders():
    p, gate = subtractive_voice(CFG)
    n = 256
    vals = [-1.0, -0.5, 0.0, 0.5]
    base = p.params()
    osc_id = [inst.id for inst in p if inst.mdef.type_name == "Oscillator"][1]
    plist = []
    for v in vals:
        pp = jax.tree.map(lambda a: a, base)
        pp[osc_id] = dict(pp[osc_id], val=np.float32(v))
        plist.append(pp)
    stacked = st.stack_params(plist)
    g = np.tile(gate_sig(n), (len(vals), 1))
    batch, _, _ = st.render_batch(p, n, params=stacked, drivers={gate: g})
    batch = np.asarray(batch)
    assert batch.shape == (len(vals), 1, n)
    for i, v in enumerate(vals):
        single, _, _ = st.render(p, n, params=plist[i],
                                 drivers={gate: gate_sig(n)})
        # vmapped XLA program fuses/FMAs slightly differently than the
        # unbatched one; ulp differences amplify through the resonant
        # filter recurrence, so the tolerance is looser than elsewhere
        np.testing.assert_allclose(batch[i], np.asarray(single),
                                   atol=1e-4, rtol=0)


def test_compile_cache_reuse_and_param_edit_no_recompile():
    p = st.Patch(CFG)
    osc = p.add("Oscillator", val=0.0)
    p.connect(osc, "Sine", p.output, 0)
    c1 = st.compile_patch(p)
    p.set_params(osc, val=1.0)
    c2 = st.compile_patch(p)
    assert c1 is c2  # topology unchanged -> same compiled object
    audio, _, _ = st.render(p, 64)
    # param edit took effect (880 Hz vs 440 Hz)
    p.set_params(osc, val=0.0)
    audio2, _, _ = st.render(p, 64)
    assert not np.allclose(np.asarray(audio), np.asarray(audio2))


def test_render_is_differentiable():
    """Sound-matching gradients flow through the full scan program."""
    p = st.Patch(CFG)
    osc = p.add("Oscillator", val=0.0)
    p.connect(osc, "Sine", p.output, 0)
    compiled = st.compile_patch(p)
    target, _, _ = compiled.render(128)

    def loss(val):
        params = compiled.default_params.copy()
        params = jax.tree.map(lambda a: a, params)
        params[osc.id] = dict(params[osc.id], val=val)
        audio, _, _ = compiled.render(128, params=params)
        return ((audio - target) ** 2).mean()

    g = jax.grad(loss)(np.float32(0.3))
    assert np.isfinite(g) and g != 0.0


def test_set_audio_config():
    p = st.Patch(st.AudioConfig(sample_rate=4800, block_size=64, channels=1,
                                precision="exact"))
    osc = p.add("Oscillator")
    p.connect(osc, "Sine", p.output, 0)
    a1, _, _ = st.render(p, 64)
    # switch to stereo at a different rate: Output inputs reset
    # disconnected, exactly as the reference's set_audio_config does
    # (output.rs:39-44)
    p.set_audio_config(st.AudioConfig(sample_rate=9600, block_size=64,
                                      channels=2, precision="exact"))
    assert all(c is None for c in p[p.output].inputs)
    p.connect(osc, "Sine", p.output, 0)
    p.connect(osc, "Sine", p.output, 1)
    a2, _, _ = st.render(p, 64)
    assert a2.shape == (2, 64)
    # double the rate halves the per-sample phase step
    assert not np.allclose(np.asarray(a1[0]), np.asarray(a2[0]))


def test_render_many_groups_topologies():
    # two identical-topology patches + one different -> 2 compiled groups
    def mk(val):
        p = st.Patch(CFG)
        o = p.add("Oscillator", val=val)
        p.connect(o, "Sine", p.output, 0)
        return p

    def mk_other():
        p = st.Patch(CFG)
        o = p.add("Oscillator", val=0.0)
        g = p.add("Multiply", constant=0.5)
        p.connect(o, "Sine", g, "In1")
        p.connect(g, 0, p.output, 0)
        return p

    patches = [mk(0.0), mk_other(), mk(-1.0)]
    outs = st.render_many(patches, 128)
    assert len(outs) == 3
    for i, p in enumerate(patches):
        want, _, _ = st.render(p, 128)
        np.testing.assert_allclose(np.asarray(outs[i]), np.asarray(want),
                                   atol=1e-4, rtol=0)


def test_pitch_helpers():
    from srack_tpu.utils import note_to_cv, midi_to_cv, cv_to_hz
    assert note_to_cv("A4") == 0.0
    assert abs(cv_to_hz(note_to_cv("A5")) - 880.0) < 1e-6
    assert abs(note_to_cv("C4") - (-9 / 12)) < 1e-9
    assert abs(note_to_cv("C#3") - (-1 - 8 / 12)) < 1e-9
    assert midi_to_cv(69) == 0.0


def test_render_long_matches_single_render():
    # self-contained patch (no drivers) for segment-vs-single equality
    q = st.Patch(CFG)
    osc = q.add("Oscillator", val=-1.0)
    flt = q.add("Moog Filter", freq=0.4, res=0.5)
    q.connect(osc, "Sawtooth", flt, "Audio")
    q.connect(flt, 0, q.output, 0)
    n = 512
    full, _, _ = st.render(q, n, engine="scan")
    long_audio, final = st.render_long(q, n, segment=128)
    np.testing.assert_allclose(long_audio, np.asarray(full), atol=1e-6,
                               rtol=0)


def test_second_output_add_fails_cleanly():
    """A failed add('Output') must not leave an orphan module behind."""
    import pytest
    p = st.Patch(CFG)
    before = len(list(p))
    with pytest.raises(ValueError, match="already has an Output"):
        p.add("Output")
    assert len(list(p)) == before
    assert [i.mdef.type_name for i in p].count("Output") == 1


def test_farm_params_keep_clock_tempo_shared():
    """farm_params randomizes notes/cutoffs/envelopes but NOT clocks: a
    per-voice random clock tempo contradicts the documented farm story
    (random notes over a shared topology, presets.farm_params) and
    scatters every voice's trigger positions (round-5 finding: the kit's
    Sample kernels ran 71.7 ms vs ~25 ms per call with randomized
    tempos).  Pin: any oscillator whose name contains "clock" keeps an
    identical val across voices; other oscillators do vary."""
    from srack_tpu.presets import farm_params, sampler_kit, \
        subtractive_voice

    saw_clock = saw_varied = False
    for patch in (sampler_kit(st.AudioConfig()),
                  subtractive_voice(st.AudioConfig())):
        params = farm_params(patch, 8)
        for inst in patch:
            if inst.mdef.type_name != "Oscillator":
                continue
            vals = np.asarray(params[inst.id]["val"])
            assert vals.shape[0] == 8
            if "clock" in inst.name:
                saw_clock = True
                assert np.all(vals == vals[0]), inst.name
            else:
                saw_varied = True
                assert np.unique(vals).size > 1, inst.name
    assert saw_clock and saw_varied
