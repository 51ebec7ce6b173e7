"""Producer-emitted velocity stats (ops.ref.vel_max contract).

The pressure-projection and velocity-advection kernels emit a (2,)
[max|u|, max|v|] bound about their OUTPUT velocity from blocks already in
VMEM; the pipeline threads it through ``state.vel_stats`` so the advection
fast-path dispatch predicate and the clamp-observability warning never
re-read the fields from HBM.  These tests pin: emission correctness on
every producer path, predicate equivalence (stats vs full-array predicate),
the state threading invariant (vel_stats is a valid upper bound of the
state's velocity), legacy checkpoint loading, and the replicated stats on
both sharded meshes.  No reference counterpart (the reference has no
runtime stats); the contract is this repo's own.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cudafluidsimulation_tpu.config import FluidConfig
from cudafluidsimulation_tpu.models.pipelines import make_step
from cudafluidsimulation_tpu.ops import advect_pallas as ap
from cudafluidsimulation_tpu.ops import jacobi_pallas as jp
from cudafluidsimulation_tpu.ops import ref
from cudafluidsimulation_tpu.state import init_state
from cudafluidsimulation_tpu.utils.impulse import Impulse

DT = 0.25


def _true_stats(u, v):
    return np.asarray([np.max(np.abs(np.asarray(u))),
                       np.max(np.abs(np.asarray(v)))])


def _vel(rng, h, w, scale):
    u = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32)) * scale
    v = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32)) * scale
    return u, v


# -- emission correctness ------------------------------------------------------


@pytest.mark.parametrize("scale", [0.5 / DT, 30.0])  # fast path / dynamic
def test_advect_velocity_stats_flat(rng, scale):
    u, v = _vel(rng, 64, 128, scale)
    u2, v2, st = ap.advect_velocity(u, v, DT, 1.2, return_stats=True)
    np.testing.assert_allclose(np.asarray(st), _true_stats(u2, v2), rtol=0,
                               atol=0)
    # the no-stats call returns the identical fields
    u2b, v2b = ap.advect_velocity(u, v, DT, 1.2)
    np.testing.assert_array_equal(np.asarray(u2), np.asarray(u2b))


def test_advect_stats_tiled_is_upper_bound(rng):
    h, w = 64, 512
    u, v = _vel(rng, h, w, 3.0)
    uv = jnp.stack([u, v])
    out, st = ap._advect_tiled(uv, u, v, DT, 1.2, "field", 15, 0, h, 0, w,
                               (128, 128, 4, 32, 2), None, True)
    true = _true_stats(out[0], out[1])
    assert (np.asarray(st) >= true - 1e-6).all()


def test_advect_stats_padded_geometry_is_upper_bound(rng):
    # 100x200 pads rows and cols; pad outputs are convex blends so the
    # emitted bound must still dominate the returned (sliced) fields
    u, v = _vel(rng, 100, 200, 20.0)
    u2, v2, st = ap.advect_velocity(u, v, DT, 1.2, return_stats=True)
    true = _true_stats(u2, v2)
    assert (np.asarray(st) >= true - 1e-6).all()


@pytest.mark.parametrize("iters", [5, 30])  # single burst / first+last
def test_pressure_project_stats(rng, iters):
    u, v = _vel(rng, 128, 128, 10.0)
    u2, v2, p, st = jp.pressure_project(u, v, iters, False, return_stats=True)
    np.testing.assert_allclose(np.asarray(st), _true_stats(u2, v2), atol=0)
    u2b, v2b, pb = jp.pressure_project(u, v, iters, False)
    np.testing.assert_array_equal(np.asarray(u2), np.asarray(u2b))
    np.testing.assert_array_equal(np.asarray(p), np.asarray(pb))


def test_pressure_project_tiled_stats(rng):
    h, w = 128, 4096
    u, v = _vel(rng, h, w, 10.0)
    u2, v2, p, st = jp._pressure_project_tiled(u[None], v[None], [8, 8], h,
                                               w, False, 256, 8, True)
    np.testing.assert_allclose(np.asarray(st), _true_stats(u2, v2), atol=0)


def test_project_stats(rng):
    u, v = _vel(rng, 128, 128, 1.0)
    p = jnp.asarray(rng.standard_normal((128, 128)).astype(np.float32))
    u2, v2, st = jp.project(u, v, p, return_stats=True)
    np.testing.assert_allclose(np.asarray(st), _true_stats(u2, v2), atol=0)
    eu, ev, est = ref.project(u, v, p, return_stats=True)
    np.testing.assert_allclose(np.asarray(est), _true_stats(eu, ev), atol=0)


def test_ref_ops_stats(rng):
    u, v = _vel(rng, 64, 64, 5.0)
    u2, v2, st = ref.advect_velocity(u, v, DT, 1.2, return_stats=True)
    np.testing.assert_allclose(np.asarray(st), _true_stats(u2, v2), atol=0)
    u3, v3, p, st2 = ref.pressure_project(u, v, 10, False, return_stats=True)
    np.testing.assert_allclose(np.asarray(st2), _true_stats(u3, v3), atol=0)


# -- predicate equivalence -----------------------------------------------------


@pytest.mark.parametrize("scale", [0.5 / DT, 30.0])
def test_vel_stats_predicate_matches_full_reduction(rng, scale):
    """advect with a producer bound must produce bit-identical output to
    advect computing the predicate itself (same branch taken)."""
    u, v = _vel(rng, 64, 128, scale)
    dye = jnp.asarray(rng.random((3, 64, 128), dtype=np.float32))
    st = jnp.stack([jnp.max(jnp.abs(u)), jnp.max(jnp.abs(v))])
    with_st = ap.advect_dye(dye, u, v, DT, 1.2, vel_stats=st)
    without = ap.advect_dye(dye, u, v, DT, 1.2)
    np.testing.assert_array_equal(np.asarray(with_st), np.asarray(without))


def test_conservative_bound_denies_fast_path_correctly(rng):
    """An over-estimated bound may only deny the fast path — output must
    still be exact (dynamic core), never wrong."""
    u, v = _vel(rng, 64, 128, 0.5 / DT)  # truly quiet flow
    dye = jnp.asarray(rng.random((3, 64, 128), dtype=np.float32))
    loose = jnp.asarray([1e6, 1e6], jnp.float32)  # denies the fast path
    got = ap.advect_dye(dye, u, v, DT, 1.2, vel_stats=loose)
    exp = ref.advect_dye(dye, u, v, DT, 1.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=1e-4)


# -- state threading -----------------------------------------------------------


def _drive(cfg, steps=5):
    step = jax.jit(make_step(cfg))
    s = init_state(cfg)
    for _ in range(steps):
        imp = Impulse(pos=jnp.asarray([70.0, 70.0]),
                      last_pos=jnp.asarray([64.0, 64.0]),
                      pressed=jnp.asarray(True), dt=jnp.asarray(cfg.dt))
        s = step(s, imp)
    return s


@pytest.mark.parametrize("make_cfg", [
    lambda: FluidConfig(nx=128, ny=128, backend="ref"),
    lambda: FluidConfig(nx=128, ny=128, backend="pallas"),
    lambda: FluidConfig.cpu_reference(nx=128, ny=128),
    lambda: FluidConfig(nx=128, ny=128, backend="pallas",
                        pressure_solver="multigrid"),
])
def test_state_vel_stats_bounds_state_velocity(make_cfg):
    s = _drive(make_cfg())
    st = np.asarray(s.vel_stats)
    true = _true_stats(s.u, s.v)
    assert np.isfinite(st).all()
    assert (st >= true - 1e-5 * (1 + true)).all(), (st, true)
    # and reasonably tight: the bound comes from the same arrays (the cpu
    # variant's boundary strip may shrink the true max below the bound)
    if make_cfg().variant != "cpu":
        np.testing.assert_allclose(st, true, rtol=1e-5)


def test_checkpoint_roundtrip_and_legacy_load(tmp_path):
    from cudafluidsimulation_tpu.utils import checkpoint

    cfg = FluidConfig(nx=128, ny=128, backend="ref")
    s = _drive(cfg, steps=3)
    path = str(tmp_path / "c.npz")
    checkpoint.save_state(path, s)
    loaded = checkpoint.load_state(path)
    np.testing.assert_array_equal(np.asarray(loaded.vel_stats),
                                  np.asarray(s.vel_stats))

    # legacy checkpoint: strip vel_stats, loader must recompute the bound
    data = dict(np.load(path))
    del data["vel_stats"]
    legacy = str(tmp_path / "legacy.npz")
    np.savez_compressed(legacy, **data)
    loaded2 = checkpoint.load_state(legacy)
    np.testing.assert_allclose(np.asarray(loaded2.vel_stats),
                               _true_stats(s.u, s.v), rtol=1e-6)


# -- sharded meshes ------------------------------------------------------------

requires_multidevice = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


@requires_multidevice
def test_rows_mesh_vel_stats_replicated_and_valid():
    from cudafluidsimulation_tpu.parallel.sharded import make_mesh, shard_state
    from cudafluidsimulation_tpu.parallel.shardmap_step import make_shardmap_step

    cfg = FluidConfig(nx=128, ny=128, backend="ref")
    mesh = make_mesh(8, ens=1)
    sstep = make_shardmap_step(cfg, mesh)
    s = shard_state(init_state(cfg), mesh)
    for _ in range(3):
        imp = Impulse(pos=jnp.asarray([70.0, 70.0]),
                      last_pos=jnp.asarray([64.0, 64.0]),
                      pressed=jnp.asarray(True), dt=jnp.asarray(cfg.dt))
        s = sstep(s, imp)
    st = np.asarray(s.vel_stats)
    true = _true_stats(s.u, s.v)
    assert (st >= true - 1e-5 * (1 + true)).all(), (st, true)
    np.testing.assert_allclose(st, true, rtol=1e-5)


@requires_multidevice
def test_2d_mesh_vel_stats_replicated_and_valid():
    from jax.sharding import Mesh
    from cudafluidsimulation_tpu.parallel.shardmap2d import (
        make_shardmap2d_step, shard_state_2d)

    cfg = FluidConfig(nx=128, ny=128, backend="ref", max_displacement=15)
    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("rows", "cols"))
    sstep = make_shardmap2d_step(cfg, mesh)
    s = shard_state_2d(init_state(cfg), mesh)
    for _ in range(3):
        imp = Impulse(pos=jnp.asarray([70.0, 70.0]),
                      last_pos=jnp.asarray([64.0, 64.0]),
                      pressed=jnp.asarray(True), dt=jnp.asarray(cfg.dt))
        s = sstep(s, imp)
    st = np.asarray(s.vel_stats)
    true = _true_stats(s.u, s.v)
    assert (st >= true - 1e-5 * (1 + true)).all(), (st, true)
    np.testing.assert_allclose(st, true, rtol=1e-5)
