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
n_short = int(sys.argv[2]) if len(sys.argv) > 2 else 4
n_long = int(sys.argv[3]) if len(sys.argv) > 3 else 12
orig_plans = jp._fused_tiled_plans


def measure(tag):
    jax.clear_caches()
    cfg = FluidConfig.gpu_reference(nx=n, ny=n, pressure_iters=100,
                                    backend="auto")
    sim = Simulation(cfg)
    st = sim.init()

    def make(k):
        imp = orbit_impulse(k, cfg.dt, center=(n / 2, n / 2), radius=n / 8)

        @jax.jit
        def run(s, im):
            out = sim._jit_run(s, im)
            return out.u[0, 0]

        return lambda: float(run(st, imp))  # host transfer = honest sync

    short, long_ = make(n_short), make(n_long)
    short(); long_()  # compile both lengths

    def t(g):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            g()
            best = min(best, time.perf_counter() - t0)
        return best

    # two-length delta cancels the constant tunnel dispatch overhead
    ms = (t(long_) - t(short)) / (n_long - n_short) * 1e3
    print(json.dumps({tag: round(ms, 2)}), flush=True)


try:
    measure("step_ms_FUSED_ENDS")
    jp._fused_tiled_plans = lambda *a: None
    measure("step_ms_DECOMPOSED")
finally:
    jp._fused_tiled_plans = orig_plans
    jax.clear_caches()
