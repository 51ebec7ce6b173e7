"""Sharded fast-mode plumbing: config.fast_* must actually reach the mesh.

The round-3 advisor found the fast flags silently no-oping on multi-chip
runs; round 4 threaded them through both sharded namespaces
(shardmap_step.py / shardmap2d.py) but shipped no test — so a regression
(e.g. dropping ``packed_vel=config.fast_velocity`` from _local_ops) would
reintroduce the silent no-op and stay green.  These tests close that hole
two ways:

  - jaxpr assertions: the bf16-packed advect cores are the only source of
    ``bitcast`` eqns in the step, so their presence/absence in the sharded
    jaxpr tracks each packed flag exactly;
  - output equivalence: the sharded fast step must match the SINGLE-CHIP
    fast step (same kernels, different partitioning), not the parity step.

fast_diffuse is pinned through its exchange schedule (the separable op
replaces the per-burst k-deep mirror exchanges with ONE rmax-deep one) and
the same output equivalence.
"""

import numpy as np
import jax
import pytest

from cudafluidsimulation_tpu import FluidConfig, Simulation, init_state
from cudafluidsimulation_tpu.parallel.sharded import make_mesh, shard_state
from cudafluidsimulation_tpu.parallel.shardmap2d import (
    make_mesh2d,
    make_shardmap2d_step,
    shard_state_2d,
)
from cudafluidsimulation_tpu.parallel.shardmap_step import make_shardmap_step
from cudafluidsimulation_tpu.utils.impulse import orbit_impulse, slice_step

requires_multidevice = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _cfg(**kw):
    base = dict(
        nx=128, ny=128, backend="pallas", diffusion_iters=4,
        pressure_iters=8, vorticity=0.5, force_scale=500.0,
        max_displacement=15,
    )
    base.update(kw)
    return FluidConfig.gpu_reference(**base)


def _walk(jaxpr, fn):
    for eqn in jaxpr.eqns:
        fn(eqn)
        for prm in eqn.params.values():
            for sub in prm if isinstance(prm, (list, tuple)) else [prm]:
                if hasattr(sub, "eqns"):
                    _walk(sub, fn)
                elif hasattr(sub, "jaxpr"):
                    _walk(sub.jaxpr, fn)


def _count_prim(jaxpr, name: str) -> int:
    n = [0]

    def fn(eqn):
        if eqn.primitive.name == name:
            n[0] += 1

    _walk(jaxpr, fn)
    return n[0]


def _step_jaxpr(cfg, mesh2d=False):
    if mesh2d:
        mesh = make_mesh2d(4, 2)
        step = make_shardmap2d_step(cfg, mesh)
        st = shard_state_2d(init_state(cfg), mesh)
    else:
        mesh = make_mesh(8, ens=1)
        step = make_shardmap_step(cfg, mesh)
        st = shard_state(init_state(cfg), mesh)
    imp = slice_step(orbit_impulse(1, cfg.dt, center=(64.0, 64.0),
                                   radius=16.0), 0)
    return jax.make_jaxpr(step)(st, imp)


# ---------------------------------------------------------------------------
# jaxpr plumbing assertions
# ---------------------------------------------------------------------------


@requires_multidevice
@pytest.mark.parametrize("mesh2d", [False, True], ids=["rows", "2d"])
@pytest.mark.parametrize("flag", ["fast_velocity", "fast_dye"])
def test_packed_core_reaches_sharded_jaxpr(flag, mesh2d):
    # the packed cores are the step's only bitcast source: present iff set
    on = _step_jaxpr(_cfg(**{flag: True}), mesh2d)
    off = _step_jaxpr(_cfg(), mesh2d)
    assert _count_prim(on.jaxpr, "bitcast") > 0, f"{flag} lost in lowering"
    assert _count_prim(off.jaxpr, "bitcast") == 0


@requires_multidevice
@pytest.mark.parametrize("mesh2d", [False, True], ids=["rows", "2d"])
def test_fast_diffuse_cuts_exchange_schedule(mesh2d):
    # parity: ceil(20/8)=3 k-deep mirror exchanges per diffuse stage; fast:
    # ONE rmax-deep exchange — the step's total ppermute count must drop
    on = _step_jaxpr(_cfg(diffusion_iters=20, fast_diffuse=True), mesh2d)
    off = _step_jaxpr(_cfg(diffusion_iters=20), mesh2d)
    n_on = _count_prim(on.jaxpr, "ppermute")
    n_off = _count_prim(off.jaxpr, "ppermute")
    assert n_on < n_off, (n_on, n_off)


# ---------------------------------------------------------------------------
# output equivalence: sharded fast == single-chip fast (not parity)
# ---------------------------------------------------------------------------


def _run_steps(cfg, mesh2d, steps=3):
    imp = orbit_impulse(steps, cfg.dt, center=(64.0, 64.0), radius=16.0)
    sim = Simulation(cfg)
    st_single = sim.init()
    if mesh2d:
        mesh = make_mesh2d(4, 2)
        sstep = make_shardmap2d_step(cfg, mesh)
        st_shard = shard_state_2d(init_state(cfg), mesh)
    else:
        mesh = make_mesh(8, ens=1)
        sstep = make_shardmap_step(cfg, mesh)
        st_shard = shard_state(init_state(cfg), mesh)
    for i in range(steps):
        one = slice_step(imp, i)
        st_single = sim.step(st_single, one)
        st_shard = sstep(st_shard, one)
    return st_single, st_shard


@requires_multidevice
@pytest.mark.parametrize(
    "flags",
    [dict(fast_velocity=True), dict(fast_dye=True),
     dict(fast_diffuse=True, diffusion_iters=20)],
    ids=["vel", "dye", "diffuse"],
)
def test_sharded_fast_output_matches_single_chip(flags):
    cfg = _cfg(**flags)
    st_single, st_shard = _run_steps(cfg, mesh2d=False)
    for name in ("u", "v", "dye", "pressure"):
        np.testing.assert_allclose(
            np.asarray(getattr(st_shard, name)),
            np.asarray(getattr(st_single, name)),
            atol=2e-5, rtol=1e-5, err_msg=name,
        )


@requires_multidevice
def test_sharded_fast_output_matches_single_chip_2d():
    cfg = _cfg(fast_velocity=True, fast_dye=True, fast_diffuse=True,
               diffusion_iters=20)
    st_single, st_shard = _run_steps(cfg, mesh2d=True)
    for name in ("u", "v", "dye", "pressure"):
        np.testing.assert_allclose(
            np.asarray(getattr(st_shard, name)),
            np.asarray(getattr(st_single, name)),
            atol=2e-5, rtol=1e-5, err_msg=name,
        )
