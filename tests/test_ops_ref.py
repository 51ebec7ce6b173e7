"""Golden tests: every jnp ref op vs the independent NumPy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from cudafluidsimulation_tpu.config import PALETTE
from cudafluidsimulation_tpu.ops import ref
import oracle

H, W = 48, 64
DT = 1.0 / 60.0


def fields(rng, scale=1.0):
    u = (rng.standard_normal((H, W)) * scale).astype(np.float32)
    v = (rng.standard_normal((H, W)) * scale).astype(np.float32)
    dye = rng.random((3, H, W), dtype=np.float32)
    return u, v, dye


def assert_close(a, b, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=rtol)


def test_bilerp_matches_oracle(rng):
    u, v, dye = fields(rng)
    # positions including negatives (exercises the truncation-toward-zero
    # extrapolation quirk) and beyond-edge values
    px = (rng.random((H, W), dtype=np.float32) * (W + 10) - 5).astype(np.float32)
    py = (rng.random((H, W), dtype=np.float32) * (H + 10) - 5).astype(np.float32)
    assert_close(ref.bilerp(jnp.asarray(dye), jnp.asarray(px), jnp.asarray(py)),
                 oracle.bilerp(dye, px, py))
    assert_close(ref.bilerp(jnp.asarray(u), jnp.asarray(px), jnp.asarray(py)),
                 oracle.bilerp(u, px, py))


def test_advect_velocity(rng):
    u, v, _ = fields(rng, scale=30.0)  # large velocities -> long backtraces
    got_u, got_v = ref.advect_velocity(jnp.asarray(u), jnp.asarray(v), DT, 1.2)
    exp_u, exp_v = oracle.advect_velocity(u, v, DT, 1.2)
    assert_close(got_u, exp_u)
    assert_close(got_v, exp_v)


def test_advect_dye(rng):
    u, v, dye = fields(rng, scale=30.0)
    got = ref.advect_dye(jnp.asarray(dye), jnp.asarray(u), jnp.asarray(v), DT, 1.2)
    exp = oracle.advect_dye(dye, u, v, DT, 1.2)
    assert_close(got, exp)


def test_curl(rng):
    u, v, _ = fields(rng)
    assert_close(ref.curl(jnp.asarray(u), jnp.asarray(v)), oracle.curl(u, v))


@pytest.mark.parametrize("variant", ["cpu", "gpu"])
def test_vorticity_confinement(rng, variant):
    u, v, _ = fields(rng)
    if variant == "cpu":
        got = ref.vorticity_confinement_cpu(jnp.asarray(u), jnp.asarray(v), DT, 0.35)
        exp = oracle.vorticity_cpu(u, v, DT, 0.35)
    else:
        got = ref.vorticity_confinement_gpu(jnp.asarray(u), jnp.asarray(v), DT, 50.0)
        exp = oracle.vorticity_gpu(u, v, DT, 50.0)
    assert_close(got[0], exp[0], atol=1e-4)
    assert_close(got[1], exp[1], atol=1e-4)


@pytest.mark.parametrize("iters", [1, 5, 20])
def test_diffuse(rng, iters):
    u, v, dye = fields(rng)
    uv = np.stack([u, v])
    assert_close(
        ref.diffuse(jnp.asarray(uv), DT, 0.8, iters),
        oracle.diffuse(uv, DT, 0.8, iters),
        atol=1e-4,
    )
    assert_close(
        ref.diffuse(jnp.asarray(dye), DT, 0.8, iters),
        oracle.diffuse(dye, DT, 0.8, iters),
        atol=1e-4,
    )


@pytest.mark.parametrize("half", [False, True])
def test_divergence(rng, half):
    u, v, _ = fields(rng)
    assert_close(
        ref.divergence(jnp.asarray(u), jnp.asarray(v), half),
        oracle.divergence(u, v, half),
    )


@pytest.mark.parametrize("iters", [1, 5, 30])
def test_pressure_solve(rng, iters):
    u, v, _ = fields(rng)
    div = oracle.divergence(u, v, True)
    assert_close(
        ref.pressure_solve(jnp.asarray(div), iters),
        oracle.pressure_solve(div, iters),
        atol=1e-4,
    )


def test_project(rng):
    u, v, _ = fields(rng)
    p = rng.standard_normal((H, W)).astype(np.float32)
    got = ref.project(jnp.asarray(u), jnp.asarray(v), jnp.asarray(p))
    exp = oracle.project(u, v, p)
    assert_close(got[0], exp[0])
    assert_close(got[1], exp[1])


@pytest.mark.parametrize("variant", ["cpu", "gpu"])
def test_splat(rng, variant):
    u, v, dye = fields(rng)
    cur = np.asarray([20.0, 30.0], np.float32)
    last = np.asarray([25.0, 28.0], np.float32)
    color = np.asarray(PALETTE[0], np.float32)
    if variant == "cpu":
        got = ref.splat_cpu(jnp.asarray(u), jnp.asarray(v), jnp.asarray(dye),
                            jnp.asarray(cur), jnp.asarray(last), DT, 500.0, 10.0,
                            jnp.asarray(color))
        exp = oracle.splat_cpu(u, v, dye, cur, last, DT, 500.0, 10.0, color)
    else:
        got = ref.splat_gpu(jnp.asarray(u), jnp.asarray(v), jnp.asarray(dye),
                            jnp.asarray(cur), jnp.asarray(last), DT, 5000.0, 400.0,
                            jnp.asarray(color))
        exp = oracle.splat_gpu(u, v, dye, cur, last, DT, 5000.0, 400.0, color)
    for g, e in zip(got, exp):
        assert_close(g, e, atol=1e-4)


def test_cycle_color():
    pal = jnp.asarray(np.asarray(PALETTE, np.float32))
    for t in [0.0, 0.25, 1.5, 6.9, 7.0, 13.4]:
        got = ref.cycle_color(pal, jnp.float32(t))
        exp = oracle.cycle_color(PALETTE, np.float32(t))
        assert_close(got, exp, atol=1e-6)


def test_boundary_strip(rng):
    u, v, dye = fields(rng)
    got = ref.boundary_strip(jnp.asarray(u), jnp.asarray(v), jnp.asarray(dye), 11)
    exp = oracle.boundary_strip(u, v, dye, 11)
    for g, e in zip(got, exp):
        assert_close(g, e)
    assert np.all(np.asarray(got[0])[:11] == 0)
    assert np.all(np.asarray(got[0])[11:] == np.asarray(u)[11:])


def test_pack_rgba(rng):
    _, _, dye = fields(rng)
    dye = dye * 1.5 - 0.1  # exercise both clamps
    got = np.asarray(ref.pack_rgba(jnp.asarray(dye)))
    exp = oracle.pack_rgba(dye)
    # uint8 rounding at exact .5 boundaries can differ by 1 ulp of the cast
    assert np.max(np.abs(got.astype(int) - exp.astype(int))) <= 1
    assert np.all(got[3] == 255)


def test_apply_bloom(rng):
    _, _, dye = fields(rng)
    rgba = oracle.pack_rgba(dye)
    pos = np.asarray([30.0, 20.0], np.float32)
    got = np.asarray(ref.apply_bloom(jnp.asarray(rgba), jnp.asarray(pos), 0.1, 400.0))
    exp = oracle.apply_bloom(rgba, pos, 0.1, 400.0)
    assert np.max(np.abs(got.astype(int) - exp.astype(int))) <= 1


def test_render_frame_matches_composed(rng):
    """The fused one-pass render must be BIT-identical to the composed
    pack_rgba -> apply_bloom -> where chain it replaces, in both bloom
    states (the fused form quantizes in f32 via floor; see render_frame)."""
    _, _, dye = fields(rng)
    dye = dye * 1.5 - 0.1  # exercise both clamps
    dyej = jnp.asarray(dye)
    pos = jnp.asarray([30.0, 20.0], jnp.float32)
    packed = ref.pack_rgba(dyej)
    bloomed = ref.apply_bloom(packed, pos, 0.1, 400.0)
    for active, expect in ((True, bloomed), (False, packed)):
        got = ref.render_frame(dyej, pos, 0.1, 400.0, jnp.asarray(active))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))
