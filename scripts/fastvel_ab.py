"""Full-step A/B: opt-in bf16-packed velocity advection (config.fast_velocity)
vs the exact f32 velocity kernel, driven flow (quiet steps take the exact
static fast path either way).  Arms: f32 baseline, fast-vel alone, and
fast-vel + fast-dye (the full opt-in fast mode — all 5 advected channels
packed, 5 -> 3 rolled planes).

NOTE this A/B is NOT bit-stationary: packing perturbs the velocity (~2^-9
relative), which feeds back into the realized dynamic windows, so arm costs
can also differ through flow divergence.  Same caveat class as the scanned
stage timings for energy-injecting stages — trust repeated whole-step
deltas.  Rules of the road: jax.clear_caches() between cases, host-transfer
sync, delta-timed scans, best-of-3.

    python scripts/fastvel_ab.py [NX NY [SHORT LONG [D]]]
"""
import json
import sys
import time

sys.path.insert(0, ".")
import jax  # noqa: E402

from cudafluidsimulation_tpu import FluidConfig, Simulation  # noqa: E402
from cudafluidsimulation_tpu.utils.impulse import orbit_impulse  # noqa: E402


def step_ms(nx, ny, fast_vel, fast_dye, d, n_short=20, n_long=60):
    jax.clear_caches()
    cfg = FluidConfig.gpu_reference(nx=nx, ny=ny, backend="auto",
                                    max_displacement=d,
                                    fast_velocity=fast_vel,
                                    fast_dye=fast_dye)
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

for nx, ny in grids:
    row = {"grid": f"{nx}x{ny}", "d": d}
    row["driven_f32_ms"] = round(step_ms(nx, ny, False, False, d, *steps), 3)
    row["driven_fastvel_ms"] = round(
        step_ms(nx, ny, True, False, d, *steps), 3)
    row["driven_fastboth_ms"] = round(
        step_ms(nx, ny, True, True, d, *steps), 3)
    print(json.dumps(row), flush=True)
