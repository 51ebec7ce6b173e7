"""Full-step A/B at 8192^2 (100 pressure iters): tiled END-BURST FUSION
(divergence folded into the first tiled pressure burst, projection into the
last — _pressure_project_tiled) vs the decomposed wide-grid path it replaced
(single-pass divergence/project kernels around the tiled solver).

Rules of the road: jax.clear_caches() between cases (module-level jitted ops
cache traces by (fun, avals) — a monkeypatched second case would silently
rerun the first case's program otherwise), fresh Simulation per case,
host-transfer sync, best-of-3.
"""
import json
import sys
import time

sys.path.insert(0, ".")
import jax  # noqa: E402

from cudafluidsimulation_tpu import FluidConfig, Simulation  # noqa: E402
from cudafluidsimulation_tpu.ops import jacobi_pallas as jp  # noqa: E402
from cudafluidsimulation_tpu.utils.impulse import orbit_impulse  # noqa: E402

n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
orig_plans = jp._fused_tiled_plans


def measure(tag):
    jax.clear_caches()
    cfg = FluidConfig.gpu_reference(nx=n, ny=n, pressure_iters=100,
                                    backend="auto")
    sim = Simulation(cfg)
    imp = orbit_impulse(steps, cfg.dt, center=(n / 2, n / 2), radius=n / 8)

    @jax.jit
    def run(st, im):
        out = sim._jit_run(st, im)
        return out, out.u[0, 0]

    st = sim.init()
    _, s = run(st, imp)
    float(s)  # compile + sync via host transfer
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _, s = run(st, imp)
        float(s)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({tag: round(best / steps * 1000, 2)}), flush=True)


try:
    measure("step_ms_FUSED_ENDS")
    jp._fused_tiled_plans = lambda *a: None
    measure("step_ms_DECOMPOSED")
finally:
    jp._fused_tiled_plans = orig_plans
    jax.clear_caches()
