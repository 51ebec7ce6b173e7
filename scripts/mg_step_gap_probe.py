"""Where does the mg step's +2.2 ms over jacobi-40 go, if not the solver?

mg_anatomy_probe.py: the ISOLATED mg2 burst solve costs 0.81 ms at 2048² —
about the jacobi-40 pressure stage — yet the driven whole step pays
7.65 ms vs 5.47 (mg_floor_probe.py).  Hypothesis: advect feedback.  The mg
projection actually solves the Poisson problem, so the realized flow (and
with it the dynamic advect windows) differs from the jacobi-40 flow.  A
QUIET A/B (static ±1 advect fast path in both) isolates the solver cost
from the flow; realized vel stats confirm the window sizes.

    python scripts/mg_step_gap_probe.py
"""
import json
import sys
import time

sys.path.insert(0, ".")
import jax  # noqa: E402

from cudafluidsimulation_tpu import FluidConfig, Simulation  # noqa: E402
from cudafluidsimulation_tpu.utils.impulse import (  # noqa: E402
    no_impulse,
    orbit_impulse,
)


def step_ms(nx, ny, quiet, n_short=20, n_long=60, **over):
    jax.clear_caches()
    cfg = FluidConfig.gpu_reference(nx=nx, ny=ny, backend="auto",
                                    max_displacement=31, **over)
    sim = Simulation(cfg)
    st = sim.init()

    def make(k):
        imp = (no_impulse(k, cfg.dt) if quiet else
               orbit_impulse(k, cfg.dt, center=(nx / 2, ny / 2),
                             radius=ny / 8))

        @jax.jit
        def run(s, im):
            out = sim._jit_run(s, im)
            return out.u[0, 0]

        return lambda: float(run(st, imp))

    short, long_ = make(n_short), make(n_long)
    short(); long_()

    def t(g):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            g()
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(long_) - t(short)) / (n_long - n_short) * 1e3


def realized(nx, ny, steps=60, **over):
    jax.clear_caches()
    cfg = FluidConfig.gpu_reference(nx=nx, ny=ny, backend="auto",
                                    max_displacement=31, **over)
    sim = Simulation(cfg)
    imp = orbit_impulse(steps, cfg.dt, center=(nx / 2, ny / 2), radius=ny / 8)
    st = jax.block_until_ready(sim.run(sim.init(), imp))
    return [round(float(x) * cfg.dt, 3) for x in st.vel_stats]


def main():
    nx = ny = 2048
    out = {"grid": [nx, ny]}
    out["jacobi40_quiet_ms"] = step_ms(nx, ny, True)
    out["mg2_quiet_ms"] = step_ms(nx, ny, True, pressure_solver="multigrid",
                                  mg_cycles=2)
    print(json.dumps(out), flush=True)
    out["jacobi40_disp_xy"] = realized(nx, ny)
    out["mg2_disp_xy"] = realized(nx, ny, pressure_solver="multigrid",
                                  mg_cycles=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
