"""8192^2 honest measurement: step scan (host-transfer sync) + stage rows."""
import sys, time, json
sys.path.insert(0, ".")
import jax
from cudafluidsimulation_tpu import FluidConfig, Simulation
from cudafluidsimulation_tpu.utils.impulse import orbit_impulse, no_impulse

n = 8192; steps = 8
cfg = FluidConfig.gpu_reference(nx=n, ny=n, pressure_iters=100, backend="auto")
sim = Simulation(cfg)
imp = orbit_impulse(steps, cfg.dt, center=(n/2, n/2), radius=n/8)

@jax.jit
def run(st, im):
    out = sim._jit_run(st, im)
    return out, out.u[0, 0]

st = sim.init()

def best3(im):
    _, s = run(st, im); float(s)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _, s = run(st, im); float(s)
        best = min(best, time.perf_counter() - t0)
    return best / steps * 1000

print(json.dumps({"step_ms_driven": round(best3(imp), 2)}), flush=True)
print(json.dumps({"step_ms_quiet": round(best3(no_impulse(steps, cfg.dt)), 2)}), flush=True)
print(sim.stage_timings(iters=8).format(), flush=True)
