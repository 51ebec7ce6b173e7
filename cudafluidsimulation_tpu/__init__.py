"""tpu-stable-fluids: a TPU-native 2D Eulerian stable-fluids engine in JAX.

A brand-new framework with the capabilities of the reference CUDA simulator
(Gianluca-Iacchini/CudaFluidSimulation): per step — semi-Lagrangian advection
of velocity and dye, vorticity confinement, Jacobi diffusion, Gaussian
force/dye splats, divergence -> Jacobi pressure solve -> gradient subtraction,
boundary conditions, device-side RGBA colormapping with optional bloom.

Design (TPU-first, not a port):
  - ``FluidState`` pytree + pure ``step`` functions; ``lax.scan`` under one jit.
  - Two interchangeable op backends behind one API (mirroring the reference's
    c_/g_ split, cpuFluidSim.h:8-11 / GPUFluidSIm.cuh:12-15): ``ref`` (pure
    jnp numerics oracle) and ``pallas`` (fused TPU stencil kernels).
  - Two parity *variants* of the physics pipeline: ``cpu`` replicates the
    reference CPU module's parameters/quirks (cpuFluidSim.cpp) and ``gpu``
    the CUDA module's (GPUFluidSim.cu).
  - Scripted impulse streams replace mouse callbacks; rendering is device-side
    RGBA (no OpenGL); ensembles via vmap; multi-chip via shard_map + halo
    exchange over a ``jax.sharding.Mesh``.
"""

import os as _os

if _os.environ.get("CUDAFLUIDSIM_PLATFORM") and not _os.environ.get(
        "TEST_ON_TPU"):
    # Honor the platform override for EVERY entry point (CLI, probe scripts,
    # bench) — env vars like JAX_PLATFORMS are latched pre-import by container
    # sitecustomize hooks, but a config update after import always works.
    # TEST_ON_TPU wins over a lingering exported override: that run's whole
    # point is the real chip (tests/conftest.py makes the same choice).
    import jax as _jax

    _jax.config.update("jax_platforms",
                       _os.environ["CUDAFLUIDSIM_PLATFORM"])

from cudafluidsimulation_tpu.config import FluidConfig, PALETTE
from cudafluidsimulation_tpu.state import FluidState, init_state
from cudafluidsimulation_tpu.models.pipelines import make_step
from cudafluidsimulation_tpu.models.simulation import Simulation, run_scan
from cudafluidsimulation_tpu.utils.impulse import (
    Impulse,
    no_impulse,
    constant_impulse,
    orbit_impulse,
    mouse_to_grid,
)

__all__ = [
    "FluidConfig",
    "PALETTE",
    "FluidState",
    "init_state",
    "make_step",
    "Simulation",
    "run_scan",
    "Impulse",
    "no_impulse",
    "constant_impulse",
    "orbit_impulse",
    "mouse_to_grid",
]

__version__ = "0.1.0"
