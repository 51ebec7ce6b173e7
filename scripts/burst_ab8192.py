"""Full-step A/B at 8192^2: burst=16 wide-grid schedule vs burst=8, same
process back-to-back (each Simulation re-traces the inner jits, so the
monkeypatched schedule takes effect; host-transfer sync)."""
import sys, time, json
sys.path.insert(0, ".")
import jax
from cudafluidsimulation_tpu import FluidConfig, Simulation
from cudafluidsimulation_tpu.utils.impulse import orbit_impulse
from cudafluidsimulation_tpu.ops import jacobi_pallas as jp

n = 8192; steps = 8

def measure(tag):
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

measure("step_ms_burst16")
jp._wide_burst = lambda h, w, burst, requested: burst
measure("step_ms_burst8")
