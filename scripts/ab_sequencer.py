"""Marginal-cost attribution for the sequencer bench config (3.38 G vs
4.8 G target): interleaved A/B of stripped variants.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_sequencer.py
"""
import sys
import time

import jax
import jax.numpy as jnp

import srack_tpu as st
from srack_tpu.patch import Patch

log = lambda *a: print(*a, file=sys.stderr, flush=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/srack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V, N = 1024, 480000
ROUNDS = 4
CFG = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                     precision="fast")


def build(stage: str) -> Patch:
    """sequencer preset variants; mixer gains keep peaks below 1."""
    p = Patch(CFG)
    clk = p.add("Oscillator", val=-5.0)

    use_grid = stage not in ("nogrid", "clockonly")
    use_pat = stage not in ("nopat", "clockonly", "leadonly")
    n_perc = {"perc3": 3, "perc0": 0, "leadonly": 0,
              "clockonly": 0}.get(stage, 7)

    mix_ins = []
    if use_grid:
        seq = [(i * 3 % 24, i % 3 != 0) for i in range(16)]
        grid = p.add("Grid Sequencer", sequence=seq, n_steps=16)
        p.connect(clk, "Square", grid, "Step")
        lead_osc = p.add("Oscillator", val=-2.0)
        p.connect(grid, "CV", lead_osc, "CV")
        lead_env = p.add("ADSR", a_sec=0.005, d_sec=0.1, s_val=0.3,
                         r_sec=0.05)
        p.connect(grid, "Gate", lead_env, "Gate")
        lead_flt = p.add("Moog Filter", freq=0.4, res=0.5)
        p.connect(lead_osc, "Sawtooth", lead_flt, "Audio")
        lead_vca = p.add("VCA")
        p.connect(lead_flt, 0, lead_vca, "Audio")
        p.connect(lead_env, 0, lead_vca, "CV")
        mix_ins.append(lead_vca)
    if use_pat or n_perc:
        pattern = [[(True if (s % (r + 2) == 0) else None)
                    for s in range(16)] for r in range(8)]
        pat = p.add("Pattern Sequencer", pattern=pattern, n_steps=16)
        p.connect(clk, "Square", pat, "Step")
        for r in range(n_perc):
            osc = p.add("Oscillator", val=-1.0 - 0.3 * r)
            env = p.add("ADSR", a_sec=0.002, d_sec=0.05, s_val=0.0,
                        r_sec=0.02)
            p.connect(pat, str(r), env, "Gate")
            vca = p.add("VCA")
            p.connect(osc, "Sawtooth", vca, "Audio")
            p.connect(env, 0, vca, "CV")
            mix_ins.append(vca)
    if stage == "clockonly":
        p.connect(clk, "Square", p.output, 0)
        return p
    mixers = []
    for i in range(0, len(mix_ins), 4):
        m = p.add("Mono Mixer", gains=(0.22, 0.22, 0.22, 0.22))
        for j, src in enumerate(mix_ins[i:i + 4]):
            p.connect(src, 0, m, j)
        mixers.append(m)
    top = p.add("Mono Mixer", gains=(0.5, 0.5, 0.5, 0.0))
    for j, m in enumerate(mixers[:3]):
        p.connect(m, 0, top, j)
    p.connect(top, 0, p.output, 0)
    return p


def prepare(stage):
    patch = build(stage)
    compiled = st.compile_patch(patch)
    params = st.replicate_params(patch.params(), V)
    state = jax.tree.map(lambda a: jnp.broadcast_to(a, (V,) + a.shape),
                         compiled.init_state())
    keys = jax.random.split(jax.random.PRNGKey(0), V)
    fn = compiled._get_fn(N, True, "fused")
    meter = jax.jit(lambda p, s, k: jnp.abs(fn(p, s, k, {})[0]).max())
    n_mod = len(compiled.instances)
    return meter, (params, state, keys), n_mod


def main():
    stages = ["full", "nogrid", "leadonly", "perc3", "perc0", "clockonly"]
    meters = {}
    for s in stages:
        t0 = time.perf_counter()
        meters[s] = prepare(s)
        m, args, _ = meters[s]
        float(m(*args))
        log(f"built {s} ({time.perf_counter()-t0:.0f}s)")
    # transport null: a trivial dispatch+fetch measured in the SAME rounds,
    # so the per-stage device time is (best - null), not (best - assumed
    # 28 ms) -- the correction is part of the artifact (docs/
    # SEQUENCER_BOUND.md reconciles these cycles with count_ops.py)
    null = jax.jit(lambda x: (x * 2.0).sum())
    xnull = jnp.ones((8, 128))
    float(null(xnull))
    best = {s: 1e9 for s in stages}
    best_null = 1e9
    for _ in range(ROUNDS):
        for s in stages:
            m, args, _ = meters[s]
            t0 = time.perf_counter()
            float(m(*args))
            best[s] = min(best[s], time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(null(xnull))
        best_null = min(best_null, time.perf_counter() - t0)
    log(f"[transport null] {best_null*1e3:.1f}ms")
    for s in stages:
        _, _, n_mod = meters[s]
        dev = best[s] - best_null
        cyc = dev * 940e6 / N
        log(f"[{s}] modules={n_mod} t={best[s]*1e3:.1f}ms "
            f"device={dev*1e3:.1f}ms rate={V*N/best[s]/1e9:.2f}G/s "
            f"device-rate={V*N/dev/1e9:.2f}G/s dev-cyc/sample={cyc:.1f}")


if __name__ == "__main__":
    main()
