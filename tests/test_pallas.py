"""Pallas burst-Jacobi kernels vs the jnp ref ops (interpret mode off-TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cudafluidsimulation_tpu.config import FluidConfig
from cudafluidsimulation_tpu.ops import jacobi_pallas, ref
from cudafluidsimulation_tpu.ops.backend import get_ops


@pytest.mark.parametrize("shape", [(64, 128), (48, 128), (256, 256)])
@pytest.mark.parametrize("iters", [1, 5, 30, 40])
def test_pressure_matches_ref(rng, shape, iters):
    div = rng.standard_normal(shape).astype(np.float32)
    exp = ref.pressure_solve(jnp.asarray(div), iters)
    got = jacobi_pallas.pressure_solve(jnp.asarray(div), iters, block_rows=64, burst=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=5e-6)


@pytest.mark.parametrize("channels", [1, 2, 3])
@pytest.mark.parametrize("iters", [5, 20])
def test_diffuse_matches_ref(rng, channels, iters):
    f = rng.standard_normal((channels, 64, 128)).astype(np.float32)
    exp = ref.diffuse(jnp.asarray(f), 1 / 60, 0.8, iters)
    got = jacobi_pallas.diffuse(jnp.asarray(f), 1 / 60, 0.8, iters,
                                block_rows=64, burst=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=5e-6)


def test_diffuse_2d_input(rng):
    f = rng.standard_normal((64, 128)).astype(np.float32)
    exp = ref.diffuse(jnp.asarray(f), 1 / 60, 0.8, 5)
    got = jacobi_pallas.diffuse(jnp.asarray(f), 1 / 60, 0.8, 5)
    assert got.shape == (64, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=5e-6)


def test_zero_iters(rng):
    div = rng.standard_normal((64, 128)).astype(np.float32)
    assert float(jnp.max(jnp.abs(jacobi_pallas.pressure_solve(jnp.asarray(div), 0)))) == 0
    f = rng.standard_normal((2, 64, 128)).astype(np.float32)
    out = jacobi_pallas.diffuse(jnp.asarray(f), 1 / 60, 0.8, 0)
    np.testing.assert_array_equal(np.asarray(out), f)


def test_supported_predicate():
    assert jacobi_pallas.supported(FluidConfig.gpu_reference(nx=2048, ny=2048))
    assert jacobi_pallas.supported(FluidConfig.gpu_reference(nx=128, ny=48))
    # odd grids (incl. the reference GPU 960x540) go through mirror padding
    assert jacobi_pallas.supported(FluidConfig.gpu_reference(nx=960, ny=540))
    assert jacobi_pallas.supported(FluidConfig.gpu_reference(nx=100, ny=64))
    # too small for the lane-padding scheme
    assert not jacobi_pallas.supported(FluidConfig.gpu_reference(nx=32, ny=64))


@pytest.mark.parametrize("shape", [(540, 960), (100, 200)])
def test_pressure_odd_grids_via_mirror_padding(rng, shape):
    div = rng.standard_normal(shape).astype(np.float32)
    exp = ref.pressure_solve(jnp.asarray(div), 30)
    got = jacobi_pallas.pressure_solve(jnp.asarray(div), 30, block_rows=128, burst=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=5e-6)


def test_backend_override_wiring():
    cfg = FluidConfig.gpu_reference(nx=128, ny=64, backend="pallas")
    ops = get_ops(cfg)
    assert ops.pressure_solve is not ref.pressure_solve
    assert ops.diffuse is not ref.diffuse
    # too-small grid falls back to ref
    cfg2 = FluidConfig.gpu_reference(nx=32, ny=24, backend="pallas")
    ops2 = get_ops(cfg2)
    assert ops2.pressure_solve is ref.pressure_solve


def test_full_pipeline_pallas_vs_ref(rng):
    """One full step with the pallas backend matches the ref backend."""
    from cudafluidsimulation_tpu import Simulation
    from cudafluidsimulation_tpu.utils.impulse import constant_impulse, slice_step

    imp = constant_impulse(5, 1 / 60, pos=(64.0, 32.0), last_pos=(60.0, 30.0))
    # moderate force: a held constant-drag impulse at full reference force
    # pumps |u| past the pallas displacement bound within 5 steps, which
    # would test the documented bound, not pipeline wiring equivalence
    cfg_ref = FluidConfig.gpu_reference(nx=128, ny=64, backend="ref",
                                        force_scale=1000.0)
    cfg_pal = FluidConfig.gpu_reference(nx=128, ny=64, backend="pallas",
                                        force_scale=1000.0)
    s_ref = Simulation(cfg_ref)
    s_pal = Simulation(cfg_pal)
    st_r, st_p = s_ref.init(), s_pal.init()
    for i in range(5):
        st_r = s_ref.step(st_r, slice_step(imp, i))
        st_p = s_pal.step(st_p, slice_step(imp, i))
    for name in ("u", "v", "dye", "pressure"):
        # the kernels agree to ~1e-4 per step (advect masked-sum rounding);
        # the turbulent gpu-parameter dynamics amplify that over the 5 steps
        np.testing.assert_allclose(
            np.asarray(getattr(st_p, name)), np.asarray(getattr(st_r, name)),
            atol=2e-2, err_msg=name,
        )
