"""Viscosity parameter sweep: 16 simulations in one vmapped program.

    python examples/parameter_sweep.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from cudafluidsimulation_tpu import FluidConfig
from cudafluidsimulation_tpu.models.ensemble import (
    batched_impulse,
    batched_state,
    make_diffusion_sweep_run,
)
from cudafluidsimulation_tpu.utils.impulse import orbit_impulse


def main():
    cfg = FluidConfig.gpu_reference(nx=256, ny=256)
    b = 16
    run = make_diffusion_sweep_run(cfg)

    imp = orbit_impulse(200, cfg.dt, center=(128, 128), radius=32)
    viscosities = jnp.linspace(0.1, 2.0, b)
    out = run(viscosities, batched_state(cfg, b), batched_impulse(imp, b))

    ke = np.asarray(0.5 * jnp.mean(out.u**2 + out.v**2, axis=(1, 2)))
    for visc, k in zip(np.asarray(viscosities), ke):
        print(f"viscosity {visc:5.2f}: kinetic energy {k:10.2f}")


if __name__ == "__main__":
    main()
