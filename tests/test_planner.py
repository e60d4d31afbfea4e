"""Planner tests mirroring the reference's topological_sort property test
(src/synth.rs:537-613): a 7-node diamond with a deliberate 2-cycle, module
list shuffled many times, partial-order constraints asserted on every plan.
"""

import random

import pytest

import srack_tpu as st
from srack_tpu.planner import plan_execution


def connect_first_free(patch, src, sink):
    """Reference test helper: connect src output 0 to sink's first free
    input (synth.rs:523-535)."""
    inst = patch[sink]
    for idx, conn in enumerate(inst.inputs):
        if conn is None:
            patch.connect(src, 0, sink, idx)
            return
    raise AssertionError("no free input")


def build_diamond_with_cycle():
    #     0 -> 1 -> 2 -> 3 -> o
    #      \----> 4 -----^
    #        5<->6^
    cfg = st.AudioConfig(sample_rate=44100, block_size=64, channels=2)
    p = st.Patch(cfg)
    m = [p.add("Mono Mixer") for _ in range(7)]
    connect_first_free(p, m[0], m[1])
    connect_first_free(p, m[1], m[2])
    connect_first_free(p, m[2], m[3])
    connect_first_free(p, m[3], p.output)
    connect_first_free(p, m[0], m[4])
    connect_first_free(p, m[4], m[3])
    connect_first_free(p, m[6], m[4])
    connect_first_free(p, m[5], m[6])
    connect_first_free(p, m[6], m[5])
    return p, m


def test_topological_sort_with_cycle():
    p, m = build_diamond_with_cycle()
    rng = random.Random(1234)
    for _ in range(200):
        # shuffle module insertion order via a shuffled view
        order = p.module_ids
        rng.shuffle(order)
        p._modules = {mid: p._modules[mid] for mid in order}
        plan, broken = plan_execution(p)
        idx = {mid: i for i, mid in enumerate(plan)}
        assert len(plan) == len(p)
        assert idx[m[0].id] < idx[m[1].id]
        assert idx[m[1].id] < idx[m[2].id]
        assert idx[m[2].id] < idx[m[3].id]
        assert idx[m[3].id] < idx[p.output.id]
        assert idx[m[0].id] < idx[m[4].id]
        assert idx[m[4].id] < idx[m[3].id]
        assert idx[m[6].id] < idx[m[4].id]
        assert idx[m[5].id] < idx[m[6].id]
        assert broken  # the 5<->6 cycle was broken


def test_plan_includes_disconnected_modules():
    p = st.Patch(st.AudioConfig(channels=1))
    lone = p.add("Oscillator")
    plan, _ = plan_execution(p)
    assert lone.id in plan and p.output.id in plan


def test_self_loop_broken():
    p = st.Patch(st.AudioConfig(channels=1))
    add = p.add("Add")
    p.connect(add, 0, add, "In1")
    p.connect(add, 0, p.output, 0)
    plan, broken = plan_execution(p)
    assert (add.id, add.id) in broken
    assert len(plan) == 2


def test_no_output_raises():
    p = st.Patch(st.AudioConfig(channels=1), auto_output=False)
    p.add("Oscillator")
    with pytest.raises(ValueError):
        plan_execution(p)


def test_disconnect_output_clears_all_sinks():
    """Right-click-an-output disconnects every sink it feeds
    (ui.rs:552-567)."""
    p = st.Patch(st.AudioConfig(channels=1))
    osc = p.add("Oscillator")
    a = p.add("Add")
    b = p.add("Multiply")
    p.connect(osc, "Sine", a, "In1")
    p.connect(osc, "Sine", b, "In1")
    p.connect(osc, "Square", b, "In2")   # different port: must survive
    p.connect(a, 0, p.output, 0)
    p.disconnect_output(osc, "Sine")
    assert p[a].inputs[0] is None
    assert p[b].inputs[0] is None
    assert p[b].inputs[1] == (osc.id, 1)  # Square wire untouched
    assert p[p.output].inputs[0] == (a.id, 0)
