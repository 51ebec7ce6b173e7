"""Full-step A/B at 8192^2: NEW wide-grid pressure path vs OLD flat-end-burst
path, same process, back-to-back (jit cache keyed per Simulation instance)."""
import sys, time, json
sys.path.insert(0, ".")
import jax
from cudafluidsimulation_tpu import FluidConfig, Simulation
from cudafluidsimulation_tpu.utils.impulse import orbit_impulse
from cudafluidsimulation_tpu.ops import jacobi_pallas as jp

n = 8192; steps = 8

def measure(tag):
    cfg = FluidConfig.gpu_reference(nx=n, ny=n, pressure_iters=100, backend="auto")
    sim = Simulation(cfg)
    imp = orbit_impulse(steps, cfg.dt, center=(n/2, n/2), radius=n/8)
    st = sim.init()
    r = sim._jit_run(st, imp); jax.tree.map(lambda a: a.block_until_ready(), r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = sim._jit_run(st, imp); jax.tree.map(lambda a: a.block_until_ready(), r)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({tag: round(best/steps*1000, 2)}), flush=True)

measure("step_ms_NEW")
jp.divergence_supported = lambda h, w: False
measure("step_ms_OLD")
