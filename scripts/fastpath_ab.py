"""Full-step A/B: the quiet static ±1-window advect fast path (lax.cond
dual dispatch, config.advect_fast_path) vs dynamic-window-only.

The anatomy probe (scripts/advect_anatomy_probe.py) measured the dynamic
core's reduction→scalar stalls at ~1.1 ms per advect at 960x540 on QUIET
flows where the static9 core runs at the copy floor (0.028 ms); driven
flows hide the stalls under deep loops.  This measures what the dual path
buys the whole step in both regimes (driven should be neutral: the
predicate is two XLA reductions).

Rules of the road: jax.clear_caches() between cases, fresh Simulation per
case, host-transfer sync, delta-timed scans, best-of-3.
"""
import json
import sys
import time

sys.path.insert(0, ".")
import jax  # noqa: E402

from cudafluidsimulation_tpu import FluidConfig, Simulation  # noqa: E402
from cudafluidsimulation_tpu.utils.impulse import (  # noqa: E402
    no_impulse, orbit_impulse)


def step_ms(nx, ny, fast, driven, n_short=20, n_long=60):
    jax.clear_caches()
    try:
        cfg = FluidConfig.gpu_reference(nx=nx, ny=ny, backend="auto",
                                        advect_fast_path=fast)
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
    finally:
        jax.clear_caches()


grids = [(960, 540), (2048, 2048)]
steps = (20, 60)
if len(sys.argv) > 2:  # fastpath_ab.py NX NY [SHORT LONG]
    grids = [(int(sys.argv[1]), int(sys.argv[2]))]
    if len(sys.argv) > 4:
        steps = (int(sys.argv[3]), int(sys.argv[4]))

for nx, ny in grids:
    row = {"grid": f"{nx}x{ny}"}
    for driven in (False, True):
        on = step_ms(nx, ny, True, driven, *steps)
        off = step_ms(nx, ny, False, driven, *steps)
        key = "driven" if driven else "quiet"
        row[f"{key}_fast_ms"] = round(on, 3)
        row[f"{key}_dyn_ms"] = round(off, 3)
    print(json.dumps(row), flush=True)
