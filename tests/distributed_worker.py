"""Worker process for the two-process localhost distributed test.

Launched twice by tests/test_distributed.py (process_id 0 and 1), each
with 4 virtual CPU devices -> an 8-device global mesh.  Exercises:

* parallel.init_distributed (explicit coordinator wiring);
* make_mesh over the global device list;
* render_farm with mixdown=True -- the mix-bus ``psum`` crosses processes
  (gloo CPU collectives, the DCN stand-in);
* result check against a locally-computed single-host reference.

Exit code 0 = all assertions passed on this worker.
"""

import os
import sys

PID = int(sys.argv[1])
NPROC = int(sys.argv[2])
PORT = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import srack_tpu as st  # noqa: E402
from srack_tpu import parallel  # noqa: E402


def main():
    info = parallel.init_distributed(
        coordinator_address=f"localhost:{PORT}",
        num_processes=NPROC, process_id=PID)
    assert info["process_count"] == NPROC, info
    assert info["global_devices"] == 4 * NPROC, info
    print(f"[p{PID}] init: {info}", flush=True)

    mesh = parallel.make_mesh()
    assert mesh.devices.size == 4 * NPROC

    cfg = st.AudioConfig(sample_rate=4800, block_size=64, channels=1,
                         precision="fast")
    p = st.Patch(cfg)
    osc = p.add("Oscillator", val=0.0)
    p.connect(osc, "Sine", p.output, 0)

    v, n = 16, 256
    vals = np.linspace(-1.0, 0.5, v, dtype=np.float32)
    params = st.stack_params([p.params() for _ in range(v)])
    params[osc.id]["val"] = vals

    # sharded mixdown: the sum over voices is a cross-process psum
    audio, _, _ = parallel.render_farm(p, n, params=params, mesh=mesh,
                                       mixdown=True)
    got = np.asarray(audio)  # replicated output: fully addressable

    # single-host reference (computed independently on every worker)
    want = np.zeros((1, n), np.float32)
    for i in range(v):
        pi = {osc.id: {"val": vals[i]}, p.output.id: {}}
        a, _, _ = st.render(p, n, params=pi, engine="scan",
                            key=jax.random.PRNGKey(0))
        want += np.asarray(a)
    err = float(np.abs(got - want).max())
    print(f"[p{PID}] mixdown err={err:.2e}", flush=True)
    assert err < 1e-4, err

    # per-voice (non-mixdown) render: each process checks its local shards
    audio_v, _, _ = parallel.render_farm(p, n, params=params, mesh=mesh)
    for shard in audio_v.addressable_shards:
        i0 = shard.index[0].start or 0
        for j, row in enumerate(np.asarray(shard.data)):
            pi = {osc.id: {"val": vals[i0 + j]}, p.output.id: {}}
            a, _, _ = st.render(p, n, params=pi, engine="scan",
                                key=jax.random.PRNGKey(0))
            np.testing.assert_allclose(row, np.asarray(a), atol=1e-5)
    print(f"[p{PID}] OK", flush=True)


if __name__ == "__main__":
    main()
