"""Health checks: blow-up detection between rollout segments."""

import numpy as np
import jax.numpy as jnp
import pytest

from cudafluidsimulation_tpu import FluidConfig, Simulation
from cudafluidsimulation_tpu.utils.health import (
    HealthError,
    check_health,
    run_checked,
)
from cudafluidsimulation_tpu.utils.impulse import constant_impulse


def test_healthy_run_passes():
    cfg = FluidConfig.gpu_reference(nx=64, ny=64, backend="ref",
                                    diffusion_iters=2, pressure_iters=2)
    sim = Simulation(cfg)
    imp = constant_impulse(25, cfg.dt, pos=(32.0, 32.0), last_pos=(30.0, 31.0))
    state = run_checked(sim, sim.init(), imp, segment=10)
    assert int(state.step) == 25
    h = check_health(state)
    assert h.ok and h.max_speed > 0


def test_nan_detected():
    cfg = FluidConfig.gpu_reference(nx=64, ny=64, backend="ref")
    sim = Simulation(cfg)
    bad = sim.init()._replace(u=jnp.full((64, 64), jnp.nan))
    with pytest.raises(HealthError, match="non-finite"):
        check_health(bad)


def test_speed_limit_detected():
    cfg = FluidConfig.gpu_reference(nx=64, ny=64, backend="ref",
                                    diffusion_iters=2, pressure_iters=2)
    sim = Simulation(cfg)
    imp = constant_impulse(30, cfg.dt, pos=(32.0, 32.0), last_pos=(20.0, 28.0))
    with pytest.raises(HealthError, match="blow-up"):
        run_checked(sim, sim.init(), imp, segment=10, max_speed=1.0)
