"""Sharded multigrid: the shard_map step with pressure_solver='multigrid'
must match the single-device multigrid step."""

import numpy as np
import jax
import pytest

from cudafluidsimulation_tpu import FluidConfig, Simulation, init_state
from cudafluidsimulation_tpu.parallel.sharded import make_mesh, shard_state
from cudafluidsimulation_tpu.parallel.shardmap_step import make_shardmap_step
from cudafluidsimulation_tpu.utils.impulse import orbit_impulse, slice_step

requires_multidevice = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@requires_multidevice
def test_shardmap_multigrid_matches_single_device():
    cfg = FluidConfig.gpu_reference(
        nx=128, ny=128, backend="ref", diffusion_iters=5,
        pressure_solver="multigrid", mg_cycles=2,
        vorticity=0.5, force_scale=500.0,
    )
    mesh = make_mesh(8, ens=1)
    sim = Simulation(cfg)
    imp = orbit_impulse(4, cfg.dt, center=(64.0, 64.0), radius=16.0)

    st_single = sim.init()
    st_shard = shard_state(init_state(cfg), mesh)
    sstep = make_shardmap_step(cfg, mesh)
    for i in range(4):
        one = slice_step(imp, i)
        st_single = sim.step(st_single, one)
        st_shard = sstep(st_shard, one)

    for name in ("u", "v", "dye", "pressure"):
        np.testing.assert_allclose(
            np.asarray(getattr(st_shard, name)),
            np.asarray(getattr(st_single, name)),
            atol=5e-5, rtol=1e-4, err_msg=name,
        )
