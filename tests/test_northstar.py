"""BASELINE.json north-star acceptance: the engine matches the reference
CPU path to <= 1e-4 field RMSE over 500 steps.

The oracle is the independent NumPy transliteration of cpuFluidSim.cpp
(tests/oracle.py); the config is the reference CPU parameter set exactly
(128², 5 Jacobi iters, vorticity 0.35, boundary strip, no-op color
diffusion)."""

import numpy as np
import jax

from cudafluidsimulation_tpu import FluidConfig, Simulation
from cudafluidsimulation_tpu.config import PALETTE
from cudafluidsimulation_tpu.utils.impulse import orbit_impulse, slice_step
import oracle


def test_500_step_rmse_vs_cpu_reference_oracle():
    cfg = FluidConfig.cpu_reference(nx=128, ny=128, backend="ref")
    sim = Simulation(cfg)
    steps = 500
    imp = orbit_impulse(steps, cfg.dt, center=(64.0, 64.0), radius=20.0, omega=3.0)
    imp_np = jax.tree.map(np.asarray, imp)

    state = sim.init()
    orc = oracle.OracleSim(cfg, PALETTE)
    for i in range(steps):
        state = sim.step(state, slice_step(imp, i))
        orc.step(imp_np.pos[i], imp_np.last_pos[i], bool(imp_np.pressed[i]),
                 float(imp_np.dt[i]))

    for name, got, exp in [("u", state.u, orc.u), ("v", state.v, orc.v),
                           ("dye", state.dye, orc.dye)]:
        rmse = float(np.sqrt(np.mean((np.asarray(got) - exp) ** 2)))
        assert rmse <= 1e-4, f"{name} rmse={rmse:.3e} (north-star bound 1e-4)"
