"""Traced op-count diagnostic for the bench patches (ROADMAP item 5).

Traces ONE per-sample step of each bench patch (exactly the body the
fused Pallas kernel unrolls) and counts jaxpr primitives.  These are
PRE-optimization counts: Mosaic then DCEs unconsumed waveform outputs,
folds constant select chains and dual-issues, so measured cycles/sample
(scripts/ab_sequencer.py: sequencer 237, subtractive 41, clock+output 20)
land well below the traced counts -- the ratio is a per-patch DCE/folding
factor, not a violation.  Use this to compare patch *weights* (sequencer
traces ~6x the subtractive ops and measures ~5.8x the cycles) and to spot
op-count regressions when editing module steps.  The load-bearing
issue-bound attribution is the measured marginal costs in
scripts/ab_sequencer.py: each perc voice's 23.4-cycle marginal ~= the
post-DCE op floor of square+polyBLEP (~9) + branchless ADSR (~10) +
gate transition (~2) + gated VCA multiply (~2).

Runs on CPU in seconds (pure tracing, no compile).

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=cpu \
       python scripts/count_ops.py
"""

import sys
from collections import Counter

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

import srack_tpu as st
from srack_tpu.presets import (feedback_patch, sequencer_patch, sine_patch,
                               subtractive_voice)

log = lambda *a: print(*a, file=sys.stderr, flush=True)

# primitives that cost no VPU issue slots (layout/metadata only, or folded
# by Mosaic into the consuming op)
FREE = {
    "broadcast_in_dim", "reshape", "squeeze", "convert_element_type",
    "stop_gradient", "transpose",
}


def count_one_step(patch) -> tuple[int, Counter]:
    compiled = st.compile_patch(patch)
    params = compiled.derived_params(patch.params())
    state = compiled.init_state()
    key = jax.random.PRNGKey(0)
    xs = compiled._make_xs(patch.params(), key, 1, drivers={})
    x_t = {m: a[0] for m, a in xs.items()}

    def step(params, st_, fb, x_t):
        ns, fb_o, audio, _ = compiled._sample_step(
            params, st_["states"], st_["fb"], x_t, nograd=True)
        return {"states": ns, "fb": fb_o}, audio

    jaxpr = jax.make_jaxpr(step)(params, state, state["fb"], x_t)

    counts = Counter()

    def walk(jx):
        for eqn in jx.eqns:
            counts[eqn.primitive.name] += 1
            for sub in eqn.params.values():
                if isinstance(sub, jax.extend.core.ClosedJaxpr):
                    walk(sub.jaxpr)
                elif hasattr(sub, "eqns"):
                    walk(sub)

    walk(jaxpr.jaxpr)
    issue = sum(n for p, n in counts.items() if p not in FREE)
    return issue, counts


def main() -> None:
    cfg = st.AudioConfig(sample_rate=48000, block_size=1024, channels=1,
                         precision="fast")
    measured = {"sequencer": 237.0, "subtractive": 41.0, "sine": 20.0,
                "feedback": 90.0}
    for name, make in (("sine", sine_patch),
                       ("subtractive", subtractive_voice),
                       ("feedback", feedback_patch),
                       ("sequencer", sequencer_patch)):
        issue, counts = count_one_step(make(cfg))
        top = ", ".join(f"{p}x{c}" for p, c in counts.most_common(8))
        m = measured.get(name)
        ratio = f" measured={m:.0f}cyc ({m / issue:.2f} cyc/op)" if m else ""
        log(f"[{name}] issue-ops/sample={issue}{ratio}\n    {top}")


if __name__ == "__main__":
    main()
