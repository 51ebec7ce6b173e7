"""Full-step A/B at small grids: DEEP single-burst Jacobi stages (one
launch per stage — jacobi_pallas.deep_burst) vs the shallow k<=8 schedule.

Structural change (CPU-verified by jaxpr): pallas launches/step 10 -> 5 at
512², 9 -> 4 at 960x540.  This measures whether launch/HBM-trip count is
what the small-grid step actually pays (the r2 frame-for-frame row ran
3.08 ms/step vs a ~0.17 ms in-VMEM floor).

Rules of the road: jax.clear_caches() between cases (module-level jits
cache traces by (fun, avals)), fresh Simulation per case, host-transfer
sync, delta-timed scans, best-of-3.
"""
import json
import sys
import time

sys.path.insert(0, ".")
import jax  # noqa: E402

from cudafluidsimulation_tpu import FluidConfig, Simulation  # noqa: E402
from cudafluidsimulation_tpu.ops import jacobi_pallas as jp  # noqa: E402
from cudafluidsimulation_tpu.utils.impulse import orbit_impulse  # noqa: E402

orig_db = jp.deep_burst


def step_ms(nx, ny, deep, n_short=20, n_long=60):
    jax.clear_caches()
    jp.deep_burst = orig_db if deep else (lambda h, w, it, br, bu: (bu, br))
    try:
        cfg = FluidConfig.gpu_reference(nx=nx, ny=ny, backend="auto")
        sim = Simulation(cfg)
        st = sim.init()

        def make(k):
            imp = orbit_impulse(k, cfg.dt, center=(nx / 2, ny / 2),
                                radius=ny / 8)

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
        jp.deep_burst = orig_db
        jax.clear_caches()


grids = [(960, 540), (512, 512)]
steps = (20, 60)
if len(sys.argv) > 2:  # smoke: deepburst_ab.py NX NY [SHORT LONG]
    grids = [(int(sys.argv[1]), int(sys.argv[2]))]
    if len(sys.argv) > 4:
        steps = (int(sys.argv[3]), int(sys.argv[4]))

for nx, ny in grids:
    deep = step_ms(nx, ny, True, *steps)
    shallow = step_ms(nx, ny, False, *steps)
    print(json.dumps({"grid": f"{nx}x{ny}",
                      "deep_ms": round(deep, 3),
                      "shallow_ms": round(shallow, 3)}), flush=True)
