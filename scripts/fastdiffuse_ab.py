"""Full-step A/B: opt-in separable diffusion (config.fast_diffuse) vs the
exact k-sweep Jacobi blur (VERDICT r4 #1 — diffusion is 100 of the 140
parity channel-sweeps/step, the last sweep-volume lever).

Arms per grid: exact baseline, fast-diffuse alone, and the full fast preset
(fast-diffuse + both bf16-packed advect modes).  Driven rows exercise the
dynamic advect windows (flow feedback caveat as in fastvel_ab.py: the
separable operator perturbs the velocity ~1e-4 per application, so arm
costs can also differ through realized-flow divergence); quiet rows isolate
the diffuse+force share (the reference's own workload is quiet between
drags — BASELINE.md small-grid attribution says its next 2x must come from
sweep volume, i.e. exactly this operator).

Rules of the road: jax.clear_caches() between cases, host-transfer sync,
delta-timed scans, best-of-3.

    python scripts/fastdiffuse_ab.py [NX NY [SHORT LONG [D]]]
    python scripts/fastdiffuse_ab.py 960 540 60 180 15   # reference workload
"""
import json
import sys
import time

sys.path.insert(0, ".")
import jax  # noqa: E402

from cudafluidsimulation_tpu import FluidConfig, Simulation  # noqa: E402
from cudafluidsimulation_tpu.utils.impulse import (  # noqa: E402
    no_impulse, orbit_impulse)


def step_ms(nx, ny, driven, d, n_short, n_long, **over):
    jax.clear_caches()
    cfg = FluidConfig.gpu_reference(nx=nx, ny=ny, backend="auto",
                                    max_displacement=d, **over)
    sim = Simulation(cfg)
    st = sim.init()

    def make(k):
        imp = (orbit_impulse(k, cfg.dt, center=(nx / 2, ny / 2),
                             radius=ny / 8)
               if driven else no_impulse(k, cfg.dt))

        @jax.jit
        def run(s, im):
            out = sim._jit_run(s, im)
            return out.u[0, 0]

        return lambda: float(run(st, imp))

    short, long_ = make(n_short), make(n_long)
    short(); long_()  # compile

    def t(g):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            g()
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(long_) - t(short)) / (n_long - n_short) * 1e3


grids = [(2048, 2048)]
steps = (20, 60)
d = 31
if len(sys.argv) > 2:
    grids = [(int(sys.argv[1]), int(sys.argv[2]))]
    if len(sys.argv) > 4:
        steps = (int(sys.argv[3]), int(sys.argv[4]))
    if len(sys.argv) > 5:
        d = int(sys.argv[5])

ARMS = {
    "exact": {},
    "fastdiff": {"fast_diffuse": True},
    "fastall": {"fast_diffuse": True, "fast_dye": True,
                "fast_velocity": True},
}

for nx, ny in grids:
    row = {"grid": f"{nx}x{ny}", "d": d}
    for name, over in ARMS.items():
        row[f"driven_{name}_ms"] = round(
            step_ms(nx, ny, True, d, *steps, **over), 3)
    for name, over in ARMS.items():
        row[f"quiet_{name}_ms"] = round(
            step_ms(nx, ny, False, d, *steps, **over), 3)
    print(json.dumps(row), flush=True)
