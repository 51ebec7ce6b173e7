"""Full-step A/B at 8192^2: burst<=16 wide-grid Jacobi schedule vs the
default burst<=8, same process back-to-back.

jax.clear_caches() between cases: the module-level jitted ops
(pressure_solve/diffuse) cache their traced jaxprs by (fun, avals), so
without clearing, case B would silently reuse case A's schedule — the
trap an earlier revision of this script fell into (its two numbers,
126.2/125.5 ms, were two runs of the same burst<=16 program; the honest
cross-process attribution put burst16 ~1.8 ms WORSE, consistent with
keeping k<=8 as the default — see docs/ROADMAP.md).
"""
import sys, time, json
sys.path.insert(0, ".")
import jax
from cudafluidsimulation_tpu import FluidConfig, Simulation
from cudafluidsimulation_tpu.utils.impulse import orbit_impulse
from cudafluidsimulation_tpu.ops import jacobi_pallas as jp

n = 8192; steps = 8
orig_sched = jp._burst_schedule


def sched16(iters, burst, h, w, requested):
    return orig_sched(iters, max(burst, 16) if w >= 4096 else burst,
                      h, w, requested)


def measure(tag):
    jax.clear_caches()
    cfg = FluidConfig.gpu_reference(nx=n, ny=n, pressure_iters=100,
                                    backend="auto")
    sim = Simulation(cfg)
    imp = orbit_impulse(steps, cfg.dt, center=(n/2, n/2), radius=n/8)
    st = sim.init()

    @jax.jit
    def run(s, im):
        out = sim._jit_run(s, im)
        return out, out.u[0, 0]

    _, sc = run(st, imp); float(sc)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _, sc = run(st, imp); float(sc)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({tag: round(best / steps * 1000, 2)}), flush=True)


jp._burst_schedule = sched16
try:
    measure("step_ms_burst16")
finally:
    jp._burst_schedule = orig_sched
measure("step_ms_burst8")
