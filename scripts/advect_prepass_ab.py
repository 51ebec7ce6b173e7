"""Full-step + standalone A/B: per-dy window PRE-PASS vs in-loop reductions
in the dynamic advect core (advect_pallas._WINDOW_PREPASS).

The r4 verdict's 2048² driven-advect gap hypothesis: the per-dy dxlo/dxhi
window reductions serialize a reduce->scalar-read stall into every dy
iteration of the dynamic core.  The pre-pass variant computes every
window into SMEM scratch before the dy loop (bit-identical output —
pinned by tests/test_advect_pallas.py::test_window_prepass_bit_equal), so
an A/B isolates the stall: if the gap is reduce->scalar latency
interleaved with the rolls, the pre-pass recovers it; if it is reduction
THROUGHPUT or something else, the A/B is neutral and the attribution
moves on.  Rules of the road: jax.clear_caches() between cases (module
flag is read at trace time), host-transfer sync, delta-timed scans,
best-of-3.

    python scripts/advect_prepass_ab.py [NX NY [SHORT LONG [D]]]
"""
import json
import sys
import time

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cudafluidsimulation_tpu import FluidConfig, Simulation  # noqa: E402
from cudafluidsimulation_tpu.ops import advect_pallas  # noqa: E402
from cudafluidsimulation_tpu.utils.impulse import orbit_impulse  # noqa: E402


def _timed(fn, n_short, n_long, per_iter_units):
    def t(g):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            g()
            best = min(best, time.perf_counter() - t0)
        return best

    short = fn(n_short)
    long_ = fn(n_long)
    short()
    long_()  # compile
    return (t(long_) - t(short)) / (n_long - n_short) * 1e3 / per_iter_units


def full_step_ms(nx, ny, prepass, d, n_short=20, n_long=60):
    jax.clear_caches()
    advect_pallas._WINDOW_PREPASS = prepass
    cfg = FluidConfig.gpu_reference(nx=nx, ny=ny, backend="auto",
                                    max_displacement=d)
    sim = Simulation(cfg)
    st = sim.init()

    def make(k):
        imp = orbit_impulse(k, cfg.dt, center=(nx / 2, ny / 2), radius=ny / 8)

        @jax.jit
        def run(s, im):
            out = sim._jit_run(s, im)
            return out.u[0, 0]

        return lambda: float(run(st, imp))

    return _timed(make, n_short, n_long, 1)


def standalone_dye_ms(nx, ny, prepass, d, n_short=50, n_long=150):
    """Scanned dye advection against the step-300 bench-orbit velocity (the
    same standalone row the r4 floor table reports at 1.82 ms)."""
    jax.clear_caches()
    advect_pallas._WINDOW_PREPASS = prepass
    cfg = FluidConfig.gpu_reference(nx=nx, ny=ny, backend="auto",
                                    max_displacement=d)
    sim = Simulation(cfg)
    imp = orbit_impulse(300, cfg.dt, center=(nx / 2, ny / 2), radius=ny / 8)
    st = sim.run(sim.init(), imp)
    u, v, dye = st.u, st.v, st.dye

    def make(k):
        @jax.jit
        def run(dy0):
            def body(dy, _):
                return advect_pallas.advect_dye(
                    dy, u, v, cfg.dt, 1.2, d, fast_path=False), None

            out, _ = jax.lax.scan(body, dy0, None, length=k)
            return out[0, 0, 0]

        return lambda: float(run(dye))

    return _timed(make, n_short, n_long, 1)


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
    row["dye_prepass_ms"] = round(standalone_dye_ms(nx, ny, True, d), 3)
    row["dye_inloop_ms"] = round(standalone_dye_ms(nx, ny, False, d), 3)
    row["step_prepass_ms"] = round(full_step_ms(nx, ny, True, d, *steps), 3)
    row["step_inloop_ms"] = round(full_step_ms(nx, ny, False, d, *steps), 3)
    advect_pallas._WINDOW_PREPASS = False
    print(json.dumps(row), flush=True)
