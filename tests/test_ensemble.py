"""Ensemble batching: vmapped rollouts and traced-viscosity sweeps."""

import numpy as np
import jax.numpy as jnp

from cudafluidsimulation_tpu import FluidConfig, Simulation
from cudafluidsimulation_tpu.models.ensemble import (
    batched_impulse,
    batched_state,
    make_diffusion_sweep_run,
    make_ensemble_run,
)
from cudafluidsimulation_tpu.utils.impulse import orbit_impulse


def cfg64():
    # mild dynamics: constant-folded vs traced coefficients round differently
    # in f32, and the default turbulent parameters amplify that chaotically
    return FluidConfig.gpu_reference(nx=64, ny=64, backend="ref",
                                     diffusion_iters=4, pressure_iters=6,
                                     vorticity=0.5, force_scale=500.0)


def test_ensemble_run_matches_single():
    cfg = cfg64()
    b, steps = 3, 8
    imp = orbit_impulse(steps, cfg.dt, center=(32.0, 32.0), radius=10.0)
    run = make_ensemble_run(cfg)
    out = run(batched_state(cfg, b), batched_impulse(imp, b))
    sim = Simulation(cfg)
    single = sim.run(sim.init(), imp)
    for i in range(b):
        np.testing.assert_allclose(np.asarray(out.u[i]), np.asarray(single.u),
                                   atol=1e-6)


def test_jittered_ensemble_differs():
    cfg = cfg64()
    b, steps = 4, 8
    imp = orbit_impulse(steps, cfg.dt, center=(32.0, 32.0), radius=10.0)
    jit_pos = np.linspace(-6, 6, b)[:, None] * np.ones((1, 2))
    run = make_ensemble_run(cfg)
    out = run(batched_state(cfg, b), batched_impulse(imp, b, jitter_pos=jit_pos))
    assert not np.allclose(np.asarray(out.dye[0]), np.asarray(out.dye[-1]))


def test_diffusion_sweep():
    cfg = cfg64()
    b, steps = 4, 8
    imp = orbit_impulse(steps, cfg.dt, center=(32.0, 32.0), radius=10.0)
    run = make_diffusion_sweep_run(cfg)
    diffs = jnp.asarray([0.2, 0.8, 1.2, 2.0])
    out = run(diffs, batched_state(cfg, b), batched_impulse(imp, b))
    # member with config's own coefficient must equal the plain rollout
    sim = Simulation(cfg)
    single = sim.run(sim.init(), imp)
    np.testing.assert_allclose(np.asarray(out.u[1]), np.asarray(single.u),
                               atol=1e-5)
    # different viscosities -> different flows
    assert not np.allclose(np.asarray(out.u[0]), np.asarray(out.u[3]))
