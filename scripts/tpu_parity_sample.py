"""On-DEVICE parity for the fused position+gather kernel: run the same
cases tests/test_sample_kernel.py pins in interpret mode, but compiled
through Mosaic on the real TPU (scalar extraction via VMEM scratch and
the in-kernel residual reductions are device-specific code paths the
interpreter can't validate).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_parity_sample.py
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

log = lambda *a: print(*a, file=sys.stderr, flush=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo/tests")
from test_sample_kernel import serial_ref  # noqa: E402
from srack_tpu.ops import sample_kernel  # noqa: E402

float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((8, 128))))
log("warmed; backend =", jax.default_backend())

K, N, R = 5000, 4608, 4
RNG = np.random.default_rng(0)
TBL = RNG.normal(size=(R, K)).astype(np.float32)
GATE = (RNG.random((R, N)) > 0.998).astype(np.float32)
ZCV = np.zeros((R, N), np.float32)

fails = 0


def check(name, gate, cvl, table, length, rate_base, **state):
    global fails
    r = gate.shape[0]
    pos = state.get("pos", np.zeros(r, np.float32))
    playing = state.get("playing", np.zeros(r, bool))
    last = state.get("last", np.ones(r, bool))
    outs = sample_kernel.play_rows(
        jnp.asarray(gate, jnp.float32),
        None if cvl is None else jnp.asarray(cvl, jnp.float32),
        jnp.asarray(table, jnp.float32),
        jnp.full((r,), rate_base, jnp.float32),
        jnp.asarray(pos, jnp.float32), jnp.asarray(playing),
        jnp.asarray(last), jnp.full((r,), length, jnp.int32))
    got, pos_e, play_e, last_e = (np.asarray(o) for o in outs)
    bad = 0
    for v in range(r):
        cv_v = np.zeros(gate.shape[1], np.float32) if cvl is None else cvl[v]
        want, wpos, wplay, wlast = serial_ref(
            gate[v], cv_v, table[v], length, rate_base,
            pos=pos[v], playing=bool(playing[v]), last=bool(last[v]))
        bad += int((got[v] != want).sum())
        bad += int(pos_e[v] != np.float32(wpos))
        bad += int(bool(play_e[v]) != wplay) + int(bool(last_e[v]) != wlast)
    ok = bad == 0
    fails += not ok
    log(f"[{name}] {'OK' if ok else f'FAIL ({bad} mismatches)'}")


check("triggers_rate_one", GATE, ZCV, TBL, K, 1.0)
check("const_rate", GATE, None, TBL, K, 1.5)
check("end_crossing", (RNG.random((R, N)) > 0.999).astype(np.float32),
      ZCV, TBL, 600, 2.0)
check("small_table", GATE, ZCV, RNG.normal(size=(R, 400)).astype(np.float32),
      400, 1.0)
check("carried", ZCV, ZCV, TBL, K, 1.5,
      pos=np.array([10.0, 4000.0, 0.0, 4999.0], np.float32),
      playing=np.array([True, True, False, True]),
      last=np.zeros(R, bool))
# cv in {-1,0,1} exercises real prefix sums at exact rates
check("mixed_cv", GATE, RNG.integers(-1, 2, (R, N)).astype(np.float32),
      TBL, K, 0.5)
# 48k-frame table through the big windowed path at rb=32 fold
k2, r2 = 48000, 16
check("long_table", (RNG.random((r2, N)) > 0.999).astype(np.float32),
      RNG.integers(-1, 2, (r2, N)).astype(np.float32),
      RNG.normal(size=(r2, k2)).astype(np.float32), k2, 1.5)

log("DEVICE PARITY:", "ALL OK" if fails == 0 else f"{fails} case(s) FAILED")
