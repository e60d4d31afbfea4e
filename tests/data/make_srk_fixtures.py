#!/usr/bin/env python
"""Generate ground-truth ``.srk`` fixtures byte-by-byte.

``tests/data/*.srk`` must test the reader against bytes it did NOT write,
so this generator deliberately shares no code with srack_tpu.io.srk: it is
a from-scratch MessagePack emitter that follows the rmp / rmp-serde 1.3
wire rules the reference app uses (ui.rs:112,125, ``Serializer::new`` --
the compact default):

* struct -> positional array of its non-``#[serde(skip)]`` fields;
* externally-tagged enum: newtype variant -> fixmap(1) {name: payload},
  unit variant -> the variant-name string;
* Option -> nil / value; tuple -> array; Vec/Box<[T]>/[T; N] -> array;
* f32 fields -> 0xca float32, f64 -> 0xcb float64 (rmp never widens);
* unsigned ints -> minimal representation (positive fixint/u8/u16/...).

Every field list below is transcribed directly from the Rust struct
declarations (file:line cited inline); values are non-default so a
field-order mistake in the reader cannot pass.  Run from the repo root:

    python tests/data/make_srk_fixtures.py
"""

import struct
from pathlib import Path


class EmitBase:
    """Serde-shape helpers shared by both encoders.  Subclasses supply the
    byte-level MessagePack primitives; the two implementations below are
    independent (hand-assembled from the wire spec vs the ``msgpack``
    wheel), so a shared misreading of the encoding rules cannot pass
    tests/test_io.py::test_independent_encoders_agree."""

    # -- serde shapes ---------------------------------------------------------
    def audio_buffer(self, block: int, fill: float = 0.25):
        """AudioBuffer(Option<Arc<RwLock<Box<[f32]>>>>) (synth.rs:28):
        newtype -> inner; Some -> the boxed slice as an f32 array."""
        self.arr(block)
        for i in range(block):
            self.f32(fill * ((i % 3) - 1))

    def detector(self, last=True):
        """TransitionDetector { last } (synth.rs:277-279)."""
        self.arr(1)
        self.boolean(last)

    def variant(self, name: str, n_fields: int):
        self.map(1)
        self.s(name)
        self.arr(n_fields)


class Emit(EmitBase):
    """Hand-assembled bytes straight from the rmp 1.3 wire rules."""

    def __init__(self):
        self.b = bytearray()

    # -- messagepack primitives (rmp encoding choices) -----------------------
    def s(self, text: str):
        e = text.encode()
        n = len(e)
        if n < 32:
            self.b.append(0xA0 | n)
        elif n < 256:
            self.b += bytes([0xD9, n])
        else:
            self.b += struct.pack(">BH", 0xDA, n)
        self.b += e

    def u(self, v: int):
        if v < 0x80:
            self.b.append(v)
        elif v < 0x100:
            self.b += bytes([0xCC, v])
        elif v < 0x10000:
            self.b += struct.pack(">BH", 0xCD, v)
        else:
            self.b += struct.pack(">BI", 0xCE, v)

    def f32(self, v: float):
        self.b += struct.pack(">Bf", 0xCA, v)

    def f64(self, v: float):
        self.b += struct.pack(">Bd", 0xCB, v)

    def boolean(self, v: bool):
        self.b.append(0xC3 if v else 0xC2)

    def nil(self):
        self.b.append(0xC0)

    def arr(self, n: int):
        if n < 16:
            self.b.append(0x90 | n)
        else:
            self.b += struct.pack(">BH", 0xDC, n)

    def map(self, n: int):
        self.b.append(0x80 | n)


class MsgpackEmit(EmitBase):
    """The same primitive interface encoded by the ``msgpack`` wheel
    (clean-room w.r.t. Emit: every byte comes from the C/Python msgpack
    packer, which implements the spec independently of this repo).
    rmp-serde's encoding choices map onto the wheel's: minimal-width ints,
    fixstr/str8 strings, and explicit f32 (``use_single_float``) for Rust
    f32 fields vs f64 otherwise."""

    def __init__(self):
        import msgpack
        self.b = bytearray()
        self._p32 = msgpack.Packer(use_single_float=True, autoreset=True)
        self._p64 = msgpack.Packer(autoreset=True)

    def s(self, text: str):
        self.b += self._p64.pack(text)

    def u(self, v: int):
        self.b += self._p64.pack(v)

    def f32(self, v: float):
        self.b += self._p32.pack(struct.unpack(
            ">f", struct.pack(">f", v))[0])

    def f64(self, v: float):
        self.b += self._p64.pack(v)

    def boolean(self, v: bool):
        self.b += self._p64.pack(bool(v))

    def nil(self):
        self.b += self._p64.pack(None)

    def arr(self, n: int):
        self.b += self._p64.pack_array_header(n)

    def map(self, n: int):
        self.b += self._p64.pack_map_header(n)


BLOCK = 16  # the fixture app's buffer_size (any value works; state only)


def build(emit_cls=Emit) -> bytes:
    e = emit_cls()
    ids = {k: f"00000000-0000-4000-8000-{i:012d}" for i, k in enumerate((
        "out", "osc", "noise", "gridv0", "gridv1", "pat", "adsr", "vca",
        "moogv0", "moogv1", "mix", "sample", "add", "sub", "mul", "nl",
        "verb"))}

    # FileFormat { modules, connections, positions } (ui.rs:578-586)
    e.arr(3)

    modules = [
        "out", "osc", "noise", "gridv0", "gridv1", "pat", "adsr", "vca",
        "moogv0", "moogv1", "mix", "sample", "add", "sub", "mul", "nl",
        "verb"]
    e.arr(len(modules))

    # OutputModule: id, bufs (output.rs:7-12); stereo
    e.variant("OutputModuleV0", 2)
    e.s(ids["out"])
    e.arr(2)
    e.audio_buffer(BLOCK)
    e.audio_buffer(BLOCK)

    # OscillatorModule: id, val, sample_rate, sine, square, saw, pos,
    # antialiasing, sync_detector (oscillator.rs:10-24)
    e.variant("OscillatorModuleV0", 9)
    e.s(ids["osc"])
    e.f32(-1.25)          # val
    e.u(48000)            # sample_rate: u16
    e.audio_buffer(BLOCK)
    e.audio_buffer(BLOCK)
    e.audio_buffer(BLOCK)
    e.f64(0.62)           # pos: f64
    e.boolean(True)       # antialiasing
    e.detector(False)

    # NoiseModule: id, out (oscillator.rs:309-312)
    e.variant("NoiseModuleV0", 2)
    e.s(ids["noise"])
    e.audio_buffer(BLOCK)

    # GridSequencerModuleV0: id, cv_out, gate_out, sync_out,
    # sequence: Vec<Option<u16>>, octaves, steps_per_octave, current_step,
    # td, std, last, ui_dirty (sequencer.rs:628-645)
    e.variant("GridSequencerModuleV0", 12)
    e.s(ids["gridv0"])
    e.audio_buffer(BLOCK)
    e.audio_buffer(BLOCK)
    e.audio_buffer(BLOCK)
    v0_seq = [None, 3, 7, None, 12, 24, None, 1]
    e.arr(len(v0_seq))
    for c in v0_seq:
        e.nil() if c is None else e.u(c)
    e.u(2)     # octaves: u8
    e.u(12)    # steps_per_octave: u16
    e.u(5)     # current_step
    e.detector()
    e.detector()
    e.f32(0.25)        # last: ControlVoltage
    e.boolean(False)   # ui_dirty

    # GridSequencerModule (V1): sequence: Vec<Option<(u16, bool)>>
    # (sequencer.rs:13-30)
    e.variant("GridSequencerModuleV1", 12)
    e.s(ids["gridv1"])
    e.audio_buffer(BLOCK)
    e.audio_buffer(BLOCK)
    e.audio_buffer(BLOCK)
    v1_seq = [(0, False), None, (5, True), (9, False), None, (23, True)]
    e.arr(len(v1_seq))
    for c in v1_seq:
        if c is None:
            e.nil()
        else:
            e.arr(2)
            e.u(c[0])
            e.boolean(c[1])
    e.u(3)     # octaves
    e.u(12)    # steps_per_octave
    e.u(1)     # current_step
    e.detector()
    e.detector(False)
    e.f32(-0.5)
    e.boolean(False)

    # PatternSequencerModule: id, gate_outs, sync_out,
    # sequence: Vec<Vec<Option<bool>>>, current_step, td, std, ui_dirty
    # (sequencer.rs:337-350)
    e.variant("PatternSequencerModuleV0", 8)
    e.s(ids["pat"])
    e.arr(8)
    for _ in range(8):
        e.audio_buffer(BLOCK)
    e.audio_buffer(BLOCK)
    pat = [[True, None, False, None] if r % 2 == 0
           else [None, True, None, True] for r in range(8)]
    e.arr(8)
    for row in pat:
        e.arr(len(row))
        for c in row:
            e.nil() if c is None else e.boolean(c)
    e.u(2)
    e.detector()
    e.detector()
    e.boolean(False)

    # ADSRModule: id, a_sec, d_sec, s_val, r_sec, phase, mode, r_val,
    # from_a_val, sample_rate, transition_detector, output_buffer, ui_dirty
    # (adsr.rs:8-24); mode is a unit variant -> name string
    e.variant("ADSRModuleV0", 13)
    e.s(ids["adsr"])
    e.f32(0.11)
    e.f32(0.22)
    e.f32(0.33)
    e.f32(0.44)
    e.f32(0.5)         # phase (mid-envelope runtime state)
    e.s("Decay")       # ADSRMode unit variant (adsr.rs:27-33)
    e.f32(0.9)
    e.f32(0.8)
    e.f32(48000.0)     # sample_rate: f32
    e.detector(False)
    e.audio_buffer(BLOCK)
    e.boolean(True)

    # VCAModule: id, buf, negative (vca.rs:7-15)
    e.variant("VCAModuleV0", 3)
    e.s(ids["vca"])
    e.audio_buffer(BLOCK)
    e.boolean(True)

    def moog_state():
        # InternalMoogFilterState { f, p, q, b: [f32; 5], freq, res }
        # (filter.rs:48-56)
        e.arr(6)
        e.f32(0.1)
        e.f32(0.2)
        e.f32(0.3)
        e.arr(5)
        for i in range(5):
            e.f32(0.01 * i)
        e.f32(0.4)
        e.f32(0.5)

    # MoogFilterModuleV0: id, buf, freq, res, exp_amt, state
    # (filter.rs:252-263)
    e.variant("MoogFilterModuleV0", 6)
    e.s(ids["moogv0"])
    e.audio_buffer(BLOCK)
    e.f32(0.61)
    e.f32(0.71)
    e.f32(0.81)
    moog_state()

    # MoogFilterModule (V1): id, lowpass, bandpass, highpass, freq, res,
    # exp_amt, state (filter.rs:12-25)
    e.variant("MoogFilterModuleV1", 8)
    e.s(ids["moogv1"])
    e.audio_buffer(BLOCK)
    e.audio_buffer(BLOCK)
    e.audio_buffer(BLOCK)
    e.f32(0.62)
    e.f32(0.72)
    e.f32(0.82)
    moog_state()

    # MonoMixerModule: id, gain, buf (mixer.rs:7-13)
    e.variant("MonoMixerModuleV0", 3)
    e.s(ids["mix"])
    e.arr(4)
    for g in (1.5, 0.5, 0.25, 2.0):
        e.f32(g)
    e.audio_buffer(BLOCK)

    # SampleModule: id, transition_detector, pos, buf,
    # wavebox: WaveBox { samples, sample_rate, new }, playing, sample_rate
    # (sample.rs:72-85, WaveBox sample.rs:16-20)
    e.variant("SampleModuleV0", 7)
    e.s(ids["sample"])
    e.detector()
    e.f32(3.5)         # pos
    e.audio_buffer(BLOCK)
    e.arr(3)
    wav = [0.0, 0.5, -0.5, 1.0, -1.0, 0.25]
    e.arr(len(wav))
    for x in wav:
        e.f32(x)
    e.f32(22050.0)     # WaveBox.sample_rate
    e.boolean(False)   # WaveBox.new
    e.boolean(True)    # playing
    e.f32(48000.0)     # module sample_rate

    # MathModule: id, buf, constant, operation (math.rs:14-23);
    # MathOperation unit variant -> name string (math.rs:7-11)
    for key, op, const in (("add", "Add", 0.5), ("sub", "Subtract", -1.5),
                           ("mul", "Multiply", 2.0)):
        e.variant("MathModuleV0", 4)
        e.s(ids[key])
        e.audio_buffer(BLOCK)
        e.f32(const)
        e.s(op)

    # NonLinearModule: id, buf, constant (math.rs:177-185)
    e.variant("NonLinearModuleV0", 3)
    e.s(ids["nl"])
    e.audio_buffer(BLOCK)
    e.f32(1.75)

    # FreeverbModule: id, left_out, right_out, sample_rate: usize,
    # dampening, dampening_ctl, freeze, freeze_ctl, wet, wet_ctl, width,
    # width_ctl, room_size, room_size_ctl, dry, dry_ctl -- all f64
    # (freeverb.rs:8-31)
    e.variant("FreeverbModuleV0", 16)
    e.s(ids["verb"])
    e.audio_buffer(BLOCK)
    e.audio_buffer(BLOCK)
    e.u(48000)
    e.f64(0.1)         # dampening (applied)
    e.f64(0.65)        # dampening_ctl (the UI slider the reader wants)
    e.boolean(False)
    e.boolean(True)    # freeze_ctl
    e.f64(0.2)
    e.f64(0.85)        # wet_ctl
    e.f64(0.3)
    e.f64(0.45)        # width_ctl
    e.f64(0.4)
    e.f64(0.35)        # room_size_ctl
    e.f64(0.5)
    e.f64(0.15)        # dry_ctl

    # connections: Vec<(String, u8, String, u8)> (ui.rs:582)
    conns = [
        (ids["osc"], 2, ids["moogv1"], 0),   # saw -> filter audio
        (ids["adsr"], 0, ids["vca"], 1),     # env -> vca cv
        (ids["moogv1"], 0, ids["vca"], 0),   # lp -> vca audio
        (ids["vca"], 0, ids["mix"], 0),
        (ids["noise"], 0, ids["mix"], 1),
        (ids["mix"], 0, ids["out"], 0),
        (ids["mix"], 0, ids["out"], 1),
        (ids["gridv1"], 0, ids["osc"], 0),   # cv -> osc
        (ids["gridv1"], 1, ids["adsr"], 0),  # gate -> env
    ]
    e.arr(len(conns))
    for (a, pa, b, pb) in conns:
        e.arr(4)
        e.s(a)
        e.u(pa)
        e.s(b)
        e.u(pb)

    # positions: Vec<(String, (f32, f32))> (ui.rs:585)
    e.arr(2)
    for mid, (x, y) in ((ids["osc"], (10.5, -20.0)),
                        (ids["out"], (300.0, 40.25))):
        e.arr(2)
        e.s(mid)
        e.arr(2)
        e.f32(x)
        e.f32(y)

    return bytes(e.b)


if __name__ == "__main__":
    out = Path(__file__).parent / "reference_all_modules.srk"
    data = build()
    out.write_bytes(data)
    print(f"wrote {out} ({len(data)} bytes)")
