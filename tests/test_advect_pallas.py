"""Pallas bounded-displacement advection vs the exact ref op."""

import numpy as np
import jax.numpy as jnp
import pytest

from cudafluidsimulation_tpu.ops import advect_pallas, ref

H, W = 64, 128
DT = 1.0 / 60.0


def _vel(rng, scale):
    u = (rng.standard_normal((H, W)) * scale).astype(np.float32)
    v = (rng.standard_normal((H, W)) * scale).astype(np.float32)
    return jnp.asarray(u), jnp.asarray(v)


def test_zero_velocity_identity(rng):
    z = jnp.zeros((H, W), jnp.float32)
    dye = jnp.asarray(rng.random((3, H, W), dtype=np.float32))
    exp = ref.advect_dye(dye, z, z, DT, 1.2)
    got = advect_pallas.advect_dye(dye, z, z, DT, 1.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=1e-6)


@pytest.mark.parametrize("scale", [5.0, 60.0, 200.0])
def test_velocity_advection_within_bound(rng, scale):
    """scale*dt stays within the displacement bound -> must match exactly."""
    u, v = _vel(rng, scale)
    # clip velocities so displacements stay within D=7 cells
    cap = 6.9 / DT
    u = jnp.clip(u, -cap, cap)
    v = jnp.clip(v, -cap, cap)
    eu, ev = ref.advect_velocity(u, v, DT, 1.2)
    gu, gv = advect_pallas.advect_velocity(u, v, DT, 1.2)
    # masked-sum accumulation order differs from the ref's nested lerp; with
    # taps of magnitude ~scale cancelling, f32 rounding scales with the taps
    atol = max(1e-4, 3e-5 * scale)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(eu), atol=atol)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(ev), atol=atol)


def test_dye_advection_with_fade(rng):
    u, v = _vel(rng, 60.0)
    dye = jnp.asarray(rng.random((3, H, W), dtype=np.float32))
    exp = ref.advect_dye(dye, u, v, DT, 1.2)
    got = advect_pallas.advect_dye(dye, u, v, DT, 1.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=1e-4)


def test_edge_backtrace_clamping(rng):
    """Uniform large rightward flow: left edge cells backtrace beyond x=0 and
    clamp; results must match ref (clamp + extrapolation quirks)."""
    u = jnp.full((H, W), 120.0, jnp.float32)
    v = jnp.zeros((H, W), jnp.float32)
    dye = jnp.asarray(rng.random((3, H, W), dtype=np.float32))
    exp = ref.advect_dye(dye, u, v, DT, 1.2)
    got = advect_pallas.advect_dye(dye, u, v, DT, 1.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=1e-4)


def test_horizontal_beyond_d_is_exact(rng):
    """Horizontal taps are NOT bounded by d (the strip width is VMEM-
    resident): a 20-cell leftward backtrace with d=7 must still match the
    unbounded ref op exactly."""
    u = jnp.full((H, W), 1200.0, jnp.float32)  # 20 cells/step backtrace
    v = jnp.zeros((H, W), jnp.float32)
    dye = jnp.asarray(rng.random((3, H, W), dtype=np.float32))
    exp = ref.advect_dye(dye, u, v, DT, 1.2)
    got = advect_pallas.advect_dye(dye, u, v, DT, 1.2, d=7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=1e-5)


def test_vertical_beyond_bound_is_clamped_not_garbage(rng):
    """VERTICAL displacements beyond D clamp taps to +/-D rows (the y halo
    is only D deep): a uniform 20-cell downward backtrace with d=7 yields
    the dye sampled 7 rows down (clamped at the edge), faded."""
    u = jnp.zeros((H, W), jnp.float32)
    v = jnp.full((H, W), 1200.0, jnp.float32)  # 20 cells/step backtrace
    dye_np = rng.random((3, H, W), dtype=np.float32)
    got = advect_pallas.advect_dye(jnp.asarray(dye_np), u, v, DT, 1.2, d=7)
    assert np.isfinite(np.asarray(got)).all()
    rows = np.clip(np.arange(H) - 7, 0, H - 1)
    decay = np.float32(1.0) / (np.float32(1.0) + np.float32(1.2) * np.float32(DT))
    exp = np.fmin(np.float32(1.0),
                  np.power(dye_np[:, rows, :], np.float32(1.005)) * decay)
    np.testing.assert_allclose(np.asarray(got), exp, atol=1e-5)


def test_supported_predicate():
    assert advect_pallas.supported(64, 128, 3, 7)
    assert advect_pallas.supported(64, 100, 3, 7)  # zero-padded geometry
    assert advect_pallas.supported(540, 960, 3, 15)
    assert not advect_pallas.supported(64, 32, 3, 7)


def test_odd_grid_advection(rng):
    """Non-lane-aligned grid goes through zero padding and matches ref."""
    h, w = 100, 200
    u = jnp.asarray(np.clip(rng.standard_normal((h, w)) * 150, -800, 800).astype(np.float32))
    v = jnp.asarray(np.clip(rng.standard_normal((h, w)) * 150, -800, 800).astype(np.float32))
    dye = jnp.asarray(rng.random((3, h, w), dtype=np.float32))
    exp = ref.advect_dye(dye, u, v, DT, 1.2)
    got = advect_pallas.advect_dye(dye, u, v, DT, 1.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=1e-4)


def test_strip_seam_alignment_regression(rng):
    """Regression: grids whose padded height selects a strip height that is
    NOT a multiple of the halo depth used to corrupt advection at strip
    seams (e.g. 540 rows, hd=16 -> r=136).  _pick_rows must enforce hd | r."""
    from cudafluidsimulation_tpu.ops.advect_pallas import _halo, _pad_geometry

    for (h, w) in [(540, 512), (100, 960), (200, 512)]:
        hd = _halo(15)
        r = _pad_geometry(h, w, 3, hd)[2]
        assert r % hd == 0, (h, w, r, hd)

    h, w = 540, 512
    u = jnp.asarray(np.clip(rng.standard_normal((h, w)) * 150, -800, 800).astype(np.float32))
    v = jnp.asarray(np.clip(rng.standard_normal((h, w)) * 150, -800, 800).astype(np.float32))
    dye = jnp.asarray(rng.random((3, h, w), dtype=np.float32))
    exp = ref.advect_dye(dye, u, v, DT, 1.2)
    got = advect_pallas.advect_dye(dye, u, v, DT, 1.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=2e-4)
