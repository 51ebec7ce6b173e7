"""Geometry robustness: odd grid sizes must run finite through both
backends and agree — guards the padding/strip/halo selection logic."""

import numpy as np
import jax.numpy as jnp
import pytest

from cudafluidsimulation_tpu import FluidConfig, Simulation
from cudafluidsimulation_tpu.ops import advect_pallas, jacobi_pallas
from cudafluidsimulation_tpu.utils.impulse import constant_impulse

SIZES = [(64, 64), (48, 128), (100, 200), (17, 64), (96, 192), (135, 240),
         (40, 72)]


@pytest.mark.parametrize("ny,nx", SIZES)
def test_odd_sizes_run_and_agree(ny, nx):
    imp = constant_impulse(3, 1 / 60, pos=(nx / 2, ny / 2),
                           last_pos=(nx / 2 - 2, ny / 2 - 1))
    results = {}
    for backend in ("ref", "pallas"):
        cfg = FluidConfig.gpu_reference(
            nx=nx, ny=ny, backend=backend, diffusion_iters=3,
            pressure_iters=4, vorticity=0.5, force_scale=500.0,
        )
        if backend == "pallas" and not (
            jacobi_pallas.supported(cfg) or advect_pallas.supported(ny, nx, 3, 15)
        ):
            pytest.skip("grid below pallas minimums (ref-only size)")
        sim = Simulation(cfg)
        st = sim.run(sim.init(), imp)
        assert np.isfinite(np.asarray(st.u)).all(), (backend, ny, nx)
        assert np.isfinite(np.asarray(st.dye)).all(), (backend, ny, nx)
        results[backend] = st
    if "pallas" in results:
        np.testing.assert_allclose(
            np.asarray(results["pallas"].u), np.asarray(results["ref"].u),
            atol=5e-3, err_msg=f"{ny}x{nx}",
        )
