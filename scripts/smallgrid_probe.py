"""Small-grid (reference 960x540 workload) cost anatomy.

The r2 frame-for-frame row measured 3.08 ms/step vs an in-VMEM ceiling of
~0.17 ms (75 sweeps x 0.52 Mcell / 235 Gcell-sweeps/s) — an 18x gap, the
largest relative gap in the repo.  At this size the whole state fits in
VMEM several times over, so the suspects are per-launch fixed costs (the
"tiny pallas launches are NOT free" lesson) and XLA op-count overhead in
the scan body, not bytes.  This probe splits the step by backend and by
stage to decide whether a small-grid fused path is worth building.

Delta-timed jitted scans, host-transfer sync, best-of-3.
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from cudafluidsimulation_tpu import FluidConfig, Simulation  # noqa: E402
from cudafluidsimulation_tpu.utils.impulse import orbit_impulse  # noqa: E402

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 960
ny = int(sys.argv[2]) if len(sys.argv) > 2 else 540


def step_ms(backend, n_short=20, n_long=60):
    jax.clear_caches()
    cfg = FluidConfig.gpu_reference(nx=nx, ny=ny, backend=backend)
    sim = Simulation(cfg)
    st = sim.init()

    def make(k):
        imp = orbit_impulse(k, cfg.dt, center=(nx / 2, ny / 2), radius=ny / 8)

        @jax.jit
        def run(s, im):
            out = sim._jit_run(s, im)
            return out.u[0, 0]

        return lambda: float(run(st, imp))

    short, long_ = make(n_short), make(n_long)

    def t(g):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            g()
            best = min(best, time.perf_counter() - t0)
        return best

    short(); long_()  # compile
    ms = (t(long_) - t(short)) / (n_long - n_short) * 1e3
    return ms, sim


print(f"== small-grid probe {nx}x{ny} ==", flush=True)
for backend in ("auto", "pallas", "ref"):
    try:
        ms, sim = step_ms(backend)
        print(f"backend={backend:6s}: {ms:7.3f} ms/step", flush=True)
    except Exception as e:
        print(f"backend={backend:6s}: FAILED {type(e).__name__}: {e}",
              flush=True)

# stage split on the winning default
jax.clear_caches()
cfg = FluidConfig.gpu_reference(nx=nx, ny=ny, backend="auto")
sim = Simulation(cfg)
print(sim.stage_timings(iters=40).format(), flush=True)
