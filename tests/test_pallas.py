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


@pytest.mark.parametrize("iters", [1, 5, 8, 30, 40])
def test_fused_pressure_project_matches_ref(rng, iters):
    """Fused divergence->Jacobi->project == the unfused ref composition."""
    h, w = 64, 128
    u = rng.standard_normal((h, w)).astype(np.float32) * 50
    v = rng.standard_normal((h, w)).astype(np.float32) * 50
    for half in (True, False):
        eu, ev, ep = ref.pressure_project(jnp.asarray(u), jnp.asarray(v),
                                          iters, half)
        gu, gv, gp = jacobi_pallas.pressure_project(
            jnp.asarray(u), jnp.asarray(v), iters, half,
            block_rows=64, burst=8)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(ep), atol=5e-5)
        np.testing.assert_allclose(np.asarray(gu), np.asarray(eu), atol=5e-5)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(ev), atol=5e-5)


def test_fused_pressure_project_multi_strip(rng):
    """Strip seams + physical edges across several strips stay exact."""
    h, w = 256, 128
    u = rng.standard_normal((h, w)).astype(np.float32) * 50
    v = rng.standard_normal((h, w)).astype(np.float32) * 50
    eu, ev, ep = ref.pressure_project(jnp.asarray(u), jnp.asarray(v), 40, True)
    gu, gv, gp = jacobi_pallas.pressure_project(
        jnp.asarray(u), jnp.asarray(v), 40, True, block_rows=64, burst=8)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(ep), atol=5e-5)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(eu), atol=5e-5)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(ev), atol=5e-5)


def test_fusable_predicate():
    assert jacobi_pallas.fusable(2048, 2048, 40)
    assert jacobi_pallas.fusable(128, 128, 5)   # cpu-reference geometry
    assert jacobi_pallas.fusable(64, 128, 1)
    assert not jacobi_pallas.fusable(540, 960, 30)  # needs mirror padding
    assert not jacobi_pallas.fusable(64, 100, 30)   # w not lane-aligned
    assert not jacobi_pallas.fusable(64, 128, 0)


def test_pressure_project_override_wiring():
    cfg = FluidConfig.gpu_reference(nx=128, ny=64, backend="pallas")
    ops = get_ops(cfg)
    assert ops.pressure_project is not ref.pressure_project
    # unfusable geometry still gets a pallas-burst composition, not pure ref
    cfg2 = FluidConfig.gpu_reference(nx=960, ny=540, backend="pallas")
    ops2 = get_ops(cfg2)
    assert ops2.pressure_project is not ref.pressure_project


def test_full_pipeline_pallas_vs_ref_chaotic_params(rng):
    """Pipeline equivalence AT the reference's own chaotic parameter set
    (force 5000, vorticity 50, GPUFluidSim.cu:54,57) — the displacement
    bound is raised so every realized backtrace stays exact; divergence
    between backends is then pure kernel rounding."""
    from cudafluidsimulation_tpu import Simulation
    from cudafluidsimulation_tpu.utils.impulse import constant_impulse, slice_step

    imp = constant_impulse(3, 1 / 60, pos=(64.0, 32.0), last_pos=(56.0, 28.0))
    kw = dict(nx=128, ny=64, max_displacement=31)
    s_ref = Simulation(FluidConfig.gpu_reference(backend="ref", **kw))
    s_pal = Simulation(FluidConfig.gpu_reference(backend="pallas", **kw))
    st_r, st_p = s_ref.init(), s_pal.init()
    for i in range(3):
        st_r = s_ref.step(st_r, slice_step(imp, i))
        st_p = s_pal.step(st_p, slice_step(imp, i))
        speed = float(jnp.max(jnp.sqrt(st_r.u**2 + st_r.v**2))) / 60.0
        assert speed <= 31, "fixture must stay within the raised bound"
    for name in ("u", "v", "dye", "pressure"):
        np.testing.assert_allclose(
            np.asarray(getattr(st_p, name)), np.asarray(getattr(st_r, name)),
            atol=2e-2, err_msg=name,
        )


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


def test_fusable_rejects_unviable_last_burst():
    """Regression: fusable() must validate the LAST burst's geometry too —
    h=72, iters=30, burst=20 gives a last burst k=10 whose halo depth (16)
    divides nothing in 72; approving it crashed pressure_project with a
    zero strip height at trace time."""
    assert not jacobi_pallas.fusable(72, 128, 30, 256, 20)
    # and the approved ones still trace + run
    import jax.numpy as jnp
    import numpy as np

    u = jnp.asarray(np.ones((72, 128), np.float32))
    for iters, burst in [(30, 8), (5, 20)]:
        if jacobi_pallas.fusable(72, 128, iters, 256, burst):
            out = jacobi_pallas.pressure_project(u, u, iters, True,
                                                 block_rows=256, burst=burst)
            assert np.isfinite(np.asarray(out[2])).all()


@pytest.mark.parametrize("iters", [0, 5, 20])
def test_diffuse_multi_splat_matches_ref(rng, iters):
    """Fused diffusion+splat == the ref composition (incl. iters=0)."""
    f = rng.standard_normal((5, 64, 128)).astype(np.float32)
    coeffs = jnp.asarray([0.8, 0.8, 0.8, 0.8, 0.8], jnp.float32)
    amps = jnp.asarray([3.0, -2.0, 0.5, 0.25, 0.75], jnp.float32)
    last = jnp.asarray([40.0, 20.0], jnp.float32)
    exp = ref.diffuse_multi_splat(jnp.asarray(f), 1 / 60, coeffs, iters,
                                  amps, last, 400.0)
    got = jacobi_pallas.diffuse_multi_splat(jnp.asarray(f), 1 / 60, coeffs,
                                            iters, amps, last, 400.0,
                                            block_rows=64, burst=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=1e-5)


# -- column-tiled Jacobi bursts (wide-grid geometry rescue) ------------------


def test_pressure_burst_tiled_bit_exact(rng):
    """A tiled pressure burst must be BIT-identical to the flat burst: same
    sweeps, same clamped stencil, tile-seam corruption confined to the
    discarded wd halo and physical x edges supplied by the sweep-invariant
    mirror columns."""
    import jax.numpy as jnp

    from cudafluidsimulation_tpu.ops import jacobi_pallas as jp

    h, w, k, hd = 64, 512, 8, 8
    div = jnp.asarray(rng.standard_normal((1, h, w)).astype(np.float32))
    p0 = jnp.asarray(rng.standard_normal((1, h, w)).astype(np.float32))
    # flat burst via the plain kernel path
    flat = jp.pressure_solve(div[0], k, block_rows=32, burst=k, init=p0[0])
    tiled = jp._pressure_burst_tiled(p0, div, k, hd, h, w,
                                     plan=(128, 128, 4, 32))
    np.testing.assert_array_equal(np.asarray(tiled[0]), np.asarray(flat))


def test_diffuse_burst_tiled_bit_exact(rng):
    import jax.numpy as jnp

    from cudafluidsimulation_tpu.ops import jacobi_pallas as jp

    h, w, k, hd = 64, 512, 8, 8
    f = jnp.asarray(rng.standard_normal((5, h, w)).astype(np.float32))
    alpha = jnp.full((5, 1), 0.8 * 0.8 * 60.0, jnp.float32)
    amp = jnp.zeros((5, 1), jnp.float32)
    sp = jnp.ones((3, 1), jnp.float32)
    flat = jp.diffuse_multi(f, 1 / 60, [0.8] * 5, k, block_rows=32, burst=k)
    tiled = jp._diffuse_burst_tiled(f, alpha, amp, sp, k, hd,
                                    plan=(128, 128, 4, 32), splat=False)
    np.testing.assert_array_equal(np.asarray(tiled), np.asarray(flat))


def test_diffuse_burst_tiled_splat_tail(rng):
    """The tiled splat tail must use GLOBAL coords (strip row + tile col),
    matching the flat fused splat bit-for-bit."""
    import jax.numpy as jnp

    from cudafluidsimulation_tpu.ops import jacobi_pallas as jp

    h, w, k, hd = 64, 512, 4, 8
    f = jnp.asarray(rng.standard_normal((5, h, w)).astype(np.float32))
    amps = jnp.asarray([1.0, 2.0, 0.5, 0.3, 0.7], jnp.float32)
    last = jnp.asarray([300.0, 40.0], jnp.float32)
    flat = jp.diffuse_multi_splat(f, 1 / 60, [0.8] * 5, k, amps, last, 400.0,
                                  block_rows=32, burst=k)
    alpha = jnp.full((5, 1), 0.8 * 0.8 * 60.0, jnp.float32)
    sp = jnp.stack([last[0], last[1], jnp.float32(400.0)]).reshape(3, 1)
    tiled = jp._diffuse_burst_tiled(f, alpha, amps.reshape(5, 1), sp, k, hd,
                                    plan=(128, 128, 4, 32), splat=True)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(flat),
                               atol=1e-6)


def test_col_plan_rules():
    from cudafluidsimulation_tpu.ops import jacobi_pallas as jp

    # narrow grids never tile
    assert jp._col_plan(2048, 2048, 8, 256) is None
    # 8192-wide grids tile with full-width coverage and lane-aligned halos
    plan = jp._col_plan(8192, 8192, 8, 256)
    assert plan is not None
    wt, wd, t_cnt, r = plan
    assert wt * t_cnt == 8192 and wd == 128 and wt % wd == 0
    # the tiled strips must beat the flat r=32 geometry
    assert r > 32


def test_pressure_solve_wide_grid_uses_tiling(rng):
    """End-to-end pressure_solve on a wide (min-width) tiled geometry still
    matches the ref solver exactly."""
    import jax.numpy as jnp

    from cudafluidsimulation_tpu.ops import jacobi_pallas as jp
    from cudafluidsimulation_tpu.ops import ref

    h, w = 512, 8192
    assert jp._col_plan(h, w, 8, 256) is not None, \
        "fixture must exercise the tiled path"
    div = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    got = jp.pressure_solve(div, 8, block_rows=256, burst=8)
    exp = ref.pressure_solve(div, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=1e-5)


@pytest.mark.parametrize("variant", ["gpu", "cpu"])
def test_vorticity_kernel_matches_ref(rng, variant):
    """Fused curl+confinement vs the jnp composition, including the clamp
    ghosts at all four physical edges and strip seams."""
    import jax.numpy as jnp

    from cudafluidsimulation_tpu.ops import jacobi_pallas as jp
    from cudafluidsimulation_tpu.ops import ref

    h, w = 64, 128
    assert jp.vorticity_supported(h, w)
    u = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32)) * 50
    v = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32)) * 50
    fn = (ref.vorticity_confinement_gpu if variant == "gpu"
          else ref.vorticity_confinement_cpu)
    eu, ev = fn(u, v, 1 / 60, 30.0)
    gu, gv = jp.vorticity_confinement(u, v, 1 / 60, 30.0, variant=variant)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(eu), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(ev), atol=2e-5)


def test_vorticity_kernel_multi_strip_seams(rng):
    """Taller grid -> several strips; seam rows must use true neighbor curl
    (halo blocks), not ghosts."""
    import jax.numpy as jnp

    from cudafluidsimulation_tpu.ops import jacobi_pallas as jp
    from cudafluidsimulation_tpu.ops import ref

    h, w = 512, 128
    u = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32)) * 50
    v = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32)) * 50
    eu, ev = ref.vorticity_confinement_gpu(u, v, 1 / 60, 30.0)
    gu, gv = jp.vorticity_confinement(u, v, 1 / 60, 30.0, variant="gpu",
                                      block_rows=64)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(eu), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(ev), atol=2e-5)


def test_vorticity_supported_gate():
    from cudafluidsimulation_tpu.ops import jacobi_pallas as jp

    assert jp.vorticity_supported(2048, 2048)
    assert jp.vorticity_supported(8192, 8192)
    assert not jp.vorticity_supported(540, 960)  # padded odd grid -> jnp op
    assert not jp.vorticity_supported(64, 64)  # w < 128


def test_divergence_project_kernels_match_ref(rng):
    import jax.numpy as jnp

    from cudafluidsimulation_tpu.ops import jacobi_pallas as jp
    from cudafluidsimulation_tpu.ops import ref

    h, w = 64, 128
    assert jp.divergence_supported(h, w)
    u = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32)) * 50
    v = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32)) * 50
    p = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    for half in (True, False):
        np.testing.assert_allclose(
            np.asarray(jp.divergence(u, v, half)),
            np.asarray(ref.divergence(u, v, half)), atol=1e-5)
    eu, ev = ref.project(u, v, p)
    gu, gv = jp.project(u, v, p)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(eu), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(ev), atol=1e-5)


def test_divergence_project_multi_strip(rng):
    import jax.numpy as jnp

    from cudafluidsimulation_tpu.ops import jacobi_pallas as jp
    from cudafluidsimulation_tpu.ops import ref

    h, w = 512, 128
    u = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32)) * 50
    v = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32)) * 50
    p = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(jp.divergence(u, v, True, block_rows=64)),
        np.asarray(ref.divergence(u, v, True)), atol=1e-5)
    eu, ev = ref.project(u, v, p)
    gu, gv = jp.project(u, v, p, block_rows=64)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(eu), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(ev), atol=1e-5)


def test_pressure_project_wide_grid_composed_path(rng):
    """On tiled-geometry grids pressure_project routes through the
    div-kernel + all-tiled solver + project-kernel composition; result must
    still match ref exactly."""
    import jax.numpy as jnp

    from cudafluidsimulation_tpu.ops import jacobi_pallas as jp
    from cudafluidsimulation_tpu.ops import ref

    h, w = 512, 8192
    assert jp._col_plan(h, w, 8, 256) is not None
    u = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32)) * 10
    v = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32)) * 10
    eu, ev, ep = ref.pressure_project(u, v, 8, True)
    gu, gv, gp = jp.pressure_project(u, v, 8, True, block_rows=256, burst=8)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(ep), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(eu), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(ev), atol=1e-5)


def test_divergence_project_override_wiring_mg():
    """The multigrid pipeline's div/project are the pallas kernels on
    supported geometries."""
    from cudafluidsimulation_tpu.ops import ref

    cfg = FluidConfig.gpu_reference(nx=128, ny=64, backend="pallas",
                                    pressure_solver="multigrid")
    ops = get_ops(cfg)
    assert ops.divergence is not ref.divergence
    assert ops.project is not ref.project
    cfg2 = FluidConfig.gpu_reference(nx=960, ny=540, backend="pallas")
    assert get_ops(cfg2).divergence is ref.divergence


def test_fused_tiled_pressure_end_bursts(rng):
    """Wide-grid pressure_project with divergence fused into the first
    TILED burst and projection into the last must be BIT-identical to the
    decomposed tiled path (div kernel + tiled solve + project kernel),
    including the physical-edge gradient taps (a mirror ghost row drifts
    1 ulp from its core image under sweeps — the kernel taps the core row
    at physical edges instead).  jax.clear_caches() between the variants:
    the monkeypatched dispatch must not reuse the other variant's trace."""
    import jax

    from cudafluidsimulation_tpu.ops import jacobi_pallas as jp

    h, w = 64, 512
    u = jnp.asarray((rng.standard_normal((h, w)) * 10).astype(np.float32))
    v = jnp.asarray((rng.standard_normal((h, w)) * 10).astype(np.float32))
    orig_plan = jp._col_plan

    def patched(hh, ww, hd, req, planes=4):
        return ((256, 128, 2, 32) if ww == 512
                else orig_plan(hh, ww, hd, req, planes))

    jp._col_plan = patched
    orig_ftp = jp._fused_tiled_plans
    try:
        for iters, burst in [(20, 8), (10, 5)]:
            assert jp._fused_tiled_plans(
                h, w, [min(burst, iters - i * burst)
                       for i in range((iters + burst - 1) // burst)],
                256) is not None
            jax.clear_caches()
            fu, fv, fp = map(np.asarray, jp.pressure_project(
                u, v, iters, True, block_rows=256, burst=burst))
            jp._fused_tiled_plans = lambda *a, **k: None
            jax.clear_caches()
            du, dv, dp = map(np.asarray, jp.pressure_project(
                u, v, iters, True, block_rows=256, burst=burst))
            jp._fused_tiled_plans = orig_ftp
            np.testing.assert_array_equal(fp, dp)
            np.testing.assert_array_equal(fu, du)
            np.testing.assert_array_equal(fv, dv)
            # and the composition tracks the jnp ref within f32 rounding
            eu, ev, ep = ref.pressure_project(u, v, iters, True)
            np.testing.assert_allclose(fp, np.asarray(ep), atol=2e-5)
            np.testing.assert_allclose(fu, np.asarray(eu), atol=2e-5)
            np.testing.assert_allclose(fv, np.asarray(ev), atol=2e-5)
    finally:
        jp._fused_tiled_plans = orig_ftp
        jp._col_plan = orig_plan


def test_fused_tiled_plans_gates():
    """Padded geometries and single-burst schedules must NOT take the
    fused tiled path (no mirror-padding re-fill invariant there)."""
    from cudafluidsimulation_tpu.ops import jacobi_pallas as jp

    assert jp._fused_tiled_plans(64, 512, [8], 256) is None       # 1 burst
    # 100-iter schedule at the real 8192² geometry gets plans
    ks = [8] * 12 + [4]
    assert jp._fused_tiled_plans(8192, 8192, ks, 256) is not None
    # odd height pads -> refused
    assert jp._fused_tiled_plans(8200, 8192, ks, 256) is None


def test_deep_burst_gating():
    """Small grids run whole Jacobi stages as ONE deep burst; the flagship
    2048² and wide grids keep the shallow k<=8 schedule (halo overhead);
    geometries whose deep pad would exceed the field reject outright."""
    db = jacobi_pallas.deep_burst
    assert db(512, 512, 30, 256, 8) == (30, 1 << 30)
    assert db(540, 960, 20, 256, 8) == (20, 1 << 30)    # reference workload
    assert db(256, 256, 30, 256, 8) == (30, 1 << 30)
    assert db(2048, 2048, 30, 256, 8) == (8, 256)       # flagship untouched
    assert db(8192, 8192, 100, 256, 8) == (8, 256)
    assert db(48, 128, 40, 256, 8) == (8, 256)          # pad 72 > field 48
    assert db(128, 128, 5, 256, 8) == (8, 256)          # iters <= burst
    # the accepted geometries must actually schedule as one burst
    assert len(jacobi_pallas._burst_schedule(30, 30, 512, 512, 1 << 30)) == 1
    assert len(jacobi_pallas._burst_schedule(20, 20, 540, 960, 1 << 30)) == 1


@pytest.mark.parametrize("shape,iters", [((512, 512), 30), ((540, 960), 20),
                                         ((256, 256), 30)])
def test_deep_burst_pressure_matches_ref(rng, shape, iters):
    """The deep single-burst pressure solve (all sweeps, one launch) matches
    the jnp ref op — exactness survives the deep halo + deeper mirror pad
    (pad >= halo_depth(iters) >= iters keeps far-edge corruption out)."""
    div = rng.standard_normal(shape).astype(np.float32)
    burst, rows = jacobi_pallas.deep_burst(*shape, iters, 256, 8)
    assert burst == iters
    exp = ref.pressure_solve(jnp.asarray(div), iters)
    got = jacobi_pallas.pressure_solve(jnp.asarray(div), iters,
                                       block_rows=rows, burst=burst)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=5e-6)


def test_deep_burst_diffuse_and_project_match_ref(rng):
    """Deep-burst diffuse_multi (one launch) and the deep single fused
    pressure_project kernel match the ref ops at 512²."""
    h, w = 512, 512
    f = rng.standard_normal((5, h, w)).astype(np.float32)
    coeffs = jnp.asarray([1.0, 1.0, 0.5, 0.5, 0.5], jnp.float32)
    burst, rows = jacobi_pallas.deep_burst(h, w, 20, 256, 8)
    exp = ref.diffuse_multi(jnp.asarray(f), 1 / 60, coeffs, 20)
    got = jacobi_pallas.diffuse_multi(jnp.asarray(f), 1 / 60, coeffs, 20,
                                      block_rows=rows, burst=burst)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=5e-6)

    u = jnp.asarray((rng.standard_normal((h, w)) * 10).astype(np.float32))
    v = jnp.asarray((rng.standard_normal((h, w)) * 10).astype(np.float32))
    burst, rows = jacobi_pallas.deep_burst(h, w, 30, 256, 8)
    assert jacobi_pallas.fusable(h, w, 30, rows, burst)
    eu, ev, ep = ref.pressure_project(u, v, 30, True)
    gu, gv, gp = jacobi_pallas.pressure_project(u, v, 30, True,
                                                block_rows=rows, burst=burst)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(ep), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(eu), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(ev), atol=2e-5)


def test_deep_burst_diffuse_multi_splat_reference_workload(rng):
    """The default gpu pipeline's diffuse_multi_splat — splat fused into
    what is now the ONLY burst — stays exact on the deep single-burst path
    at the reference's own mirror-padded 960x540 workload (the splat tail's
    global coords must ignore the pad rows)."""
    h, w = 540, 960
    f = rng.standard_normal((5, h, w)).astype(np.float32)
    coeffs = jnp.asarray([1.0, 1.0, 0.5, 0.5, 0.5], jnp.float32)
    amps = jnp.asarray([3.0, -2.0, 0.6, 0.2, 0.1], jnp.float32)
    last = jnp.asarray([480.0, 270.0], jnp.float32)
    burst, rows = jacobi_pallas.deep_burst(h, w, 20, 256, 8)
    assert burst == 20
    exp = ref.diffuse_multi_splat(jnp.asarray(f), 1 / 60, coeffs, 20,
                                  amps, last, 220.0)
    got = jacobi_pallas.diffuse_multi_splat(jnp.asarray(f), 1 / 60, coeffs,
                                            20, amps, last, 220.0,
                                            block_rows=rows, burst=burst)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=5e-6)


# -- multigrid burst smoother (jacobi_pallas.smooth_damped) -------------------


def _scan_smooth(p, rhs, sweeps):
    """The vcycle's default damped-Jacobi scan (ops/multigrid.py
    default_smooth), restated here as the independent expectation."""
    import jax

    from cudafluidsimulation_tpu.ops.stencil import neighbors

    def sweep(pp, _):
        l, r, b, t = neighbors(pp)
        return pp + 0.8 * (0.25 * (l + r + b + t + rhs) - pp), None

    out, _ = jax.lax.scan(sweep, p, None, length=sweeps)
    return out


@pytest.mark.parametrize("shape", [(64, 128), (48, 128), (60, 200)])
@pytest.mark.parametrize("sweeps", [1, 2, 4, 10])
def test_smooth_damped_matches_scan(rng, shape, sweeps):
    """Trapezoid-burst damped Jacobi == the scan smoother: multi-strip
    seams, mirror-padded odd geometries, multi-burst schedules (sweeps=10
    splits 8+2)."""
    p = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    rhs = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    got = jacobi_pallas.smooth_damped(p, rhs, sweeps, block_rows=32, burst=8)
    exp = _scan_smooth(p, rhs, sweeps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=2e-6)


def test_smooth_damped_tiled_bit_exact(rng):
    """The column-tiled smoother burst must match the flat one bit-for-bit
    (same argument as test_pressure_burst_tiled_bit_exact)."""
    h, w, k, hd = 64, 512, 8, 8
    p = jnp.asarray(rng.standard_normal((1, h, w)).astype(np.float32))
    rhs = jnp.asarray(rng.standard_normal((1, h, w)).astype(np.float32))
    flat = jacobi_pallas.smooth_damped(p[0], rhs[0], k, block_rows=32,
                                       burst=k)
    tiled = jacobi_pallas._smooth_burst_tiled(p, rhs, k, hd, h, w, 0.8,
                                              plan=(128, 128, 4, 32))
    np.testing.assert_array_equal(np.asarray(tiled[0]), np.asarray(flat))


def test_mg_burst_smoother_override_wiring():
    """The pallas backend must route pressure_solve_mg through the burst
    smoother; the ref namespace keeps the pure-jnp scan."""
    from cudafluidsimulation_tpu.ops import multigrid

    cfg = FluidConfig.gpu_reference(nx=256, ny=256, backend="pallas",
                                    pressure_solver="multigrid")
    ops = get_ops(cfg)
    assert getattr(ops.pressure_solve_mg, "keywords", {}).get("smoother") \
        == "burst"
    ops_ref = get_ops(FluidConfig.gpu_reference(nx=256, ny=256,
                                                backend="ref"))
    assert ops_ref.pressure_solve_mg is ref.pressure_solve_mg

    # and the two solvers agree (fine 256 level bursts, coarser levels scan)
    rng = np.random.default_rng(7)
    div = rng.standard_normal((256, 256)).astype(np.float32)
    div = jnp.asarray(div - div.mean())
    p_b = multigrid.pressure_solve_mg(div, cycles=2, smoother="burst")
    p_s = multigrid.pressure_solve_mg(div, cycles=2)
    np.testing.assert_allclose(np.asarray(p_b), np.asarray(p_s),
                               atol=5e-6, rtol=1e-5)


# -- fused multigrid ends (smooth_res / first_smooth_res / last_smooth_project)


def test_smooth_res_matches_composition(rng):
    """Pre-smooth + residual in one launch == smooth_damped then the XLA
    residual, both start modes."""
    from cudafluidsimulation_tpu.ops import multigrid as mg

    h, w = 64, 256
    p = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    rhs = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    assert jacobi_pallas.mg_ends_fusable(h, w, 2, 32)
    got_p, got_r = jacobi_pallas.smooth_res(p, rhs, 2, 0.8, block_rows=32)
    exp_p = jacobi_pallas.smooth_damped(p, rhs, 2, 0.8, block_rows=32)
    exp_r = rhs - mg._apply_a(exp_p)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(exp_p),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(exp_r),
                               atol=1e-5)
    # zero start (coarse levels): p argument is ignored
    got_p0, got_r0 = jacobi_pallas.smooth_res(rhs, rhs, 2, 0.8,
                                              block_rows=32, from_zero=True)
    exp_p0 = jacobi_pallas.smooth_damped(jnp.zeros_like(rhs), rhs, 2, 0.8,
                                         block_rows=32)
    np.testing.assert_allclose(np.asarray(got_p0), np.asarray(exp_p0),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_r0),
                               np.asarray(rhs - mg._apply_a(exp_p0)),
                               atol=1e-5)


def test_smooth_res_tiled_matches_flat(rng):
    """Column-tiled fused smooth+residual (wide-grid mg path) is BIT-equal
    to the flat kernel on aligned geometry (mirror col ghosts stay exact
    images of the clamped taps under damped sweeps), and matches the
    scan-smoother + XLA-residual composition on mirror-PADDED geometry
    (pad >= halo(k+1), so the residual ring never sees pad corruption).
    jax.clear_caches() between variants: smooth_res is module-jitted and
    the monkeypatched _col_plan is consulted at trace time."""
    import jax

    from cudafluidsimulation_tpu.ops import jacobi_pallas as jp
    from cudafluidsimulation_tpu.ops import multigrid as mg

    h, w = 64, 512
    p = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    rhs = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    assert jp.mg_ends_fusable(h, w, 2, 32)
    assert not jp.smooth_res_tiled_ok(h, w, 2, 32)  # narrow: flat wins
    exp = [np.asarray(x)
           for x in jp.smooth_res(p, rhs, 2, 0.8, block_rows=32)]
    exp0 = [np.asarray(x) for x in jp.smooth_res(rhs, rhs, 2, 0.8,
                                                 block_rows=32,
                                                 from_zero=True)]
    orig_plan = jp._col_plan

    def patched(hh, ww, hd, req, planes=4):
        if ww == 512:
            return (256, 128, 2, jp._pick_block_rows(hh, hd, 512, req,
                                                     planes))
        return orig_plan(hh, ww, hd, req, planes)

    jp._col_plan = patched
    try:
        assert jp.smooth_res_tiled_ok(h, w, 2, 32)
        jax.clear_caches()
        got = [np.asarray(x)
               for x in jp.smooth_res(p, rhs, 2, 0.8, block_rows=32)]
        got0 = [np.asarray(x) for x in jp.smooth_res(rhs, rhs, 2, 0.8,
                                                     block_rows=32,
                                                     from_zero=True)]
        # padded geometry (h=60 pads to 72 mirror rows): vs composition
        hp_, pp_ = 60, p[:60]
        rp_ = rhs[:60]
        gp, gr = jp.smooth_res(pp_, rp_, 2, 0.8, block_rows=32)
    finally:
        jp._col_plan = orig_plan
        jax.clear_caches()
    np.testing.assert_array_equal(got[0], exp[0])
    np.testing.assert_array_equal(got[1], exp[1])
    np.testing.assert_array_equal(got0[0], exp0[0])
    np.testing.assert_array_equal(got0[1], exp0[1])
    ep = jp.smooth_damped(pp_, rp_, 2, 0.8, block_rows=32)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(ep), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gr),
                               np.asarray(rp_ - mg._apply_a(ep)), atol=1e-5)


def test_first_smooth_res_matches_composition(rng):
    from cudafluidsimulation_tpu.ops import multigrid as mg

    h, w = 64, 256
    u = jnp.asarray((rng.standard_normal((h, w)) * 10).astype(np.float32))
    v = jnp.asarray((rng.standard_normal((h, w)) * 10).astype(np.float32))
    got_p, got_rhs, got_res = jacobi_pallas.first_smooth_res(
        u, v, 2, True, 0.8, block_rows=32)
    exp_rhs = -ref.divergence(u, v, True)
    exp_p = jacobi_pallas.smooth_damped(jnp.zeros_like(exp_rhs), exp_rhs, 2,
                                        0.8, block_rows=32)
    np.testing.assert_allclose(np.asarray(got_rhs), np.asarray(exp_rhs),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(exp_p),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_res),
                               np.asarray(exp_rhs - mg._apply_a(exp_p)),
                               atol=1e-5)


def test_last_smooth_project_matches_composition(rng):
    h, w = 64, 256
    p = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    rhs = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    u = jnp.asarray((rng.standard_normal((h, w)) * 10).astype(np.float32))
    v = jnp.asarray((rng.standard_normal((h, w)) * 10).astype(np.float32))
    got_u, got_v, got_p, got_st = jacobi_pallas.last_smooth_project(
        p, rhs, u, v, 2, 0.8, block_rows=32, return_stats=True)
    exp_p = jacobi_pallas.smooth_damped(p, rhs, 2, 0.8, block_rows=32)
    exp_u, exp_v, exp_st = ref.project(u, v, exp_p, return_stats=True)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(exp_p),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(exp_u),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(exp_v),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_st), np.asarray(exp_st),
                               rtol=1e-6)


@pytest.mark.parametrize("kw", [dict(cycles=1), dict(cycles=2),
                                dict(cycles=2, tol=0.05),
                                dict(cycles=3, tol=1e-20, max_cycles=2)])
def test_pressure_project_mg_matches_composition(rng, kw):
    """The fully-fused mg projection == divergence -> pressure_solve_mg
    (burst smoother) -> project, fixed-cycle AND residual-targeted modes."""
    from cudafluidsimulation_tpu.ops import multigrid as mg

    h, w = 256, 256
    u = jnp.asarray((rng.standard_normal((h, w)) * 20).astype(np.float32))
    v = jnp.asarray((rng.standard_normal((h, w)) * 20).astype(np.float32))
    got_u, got_v, got_p, got_st = mg.pressure_project_mg(
        u, v, half=True, return_stats=True, **kw)
    div = ref.divergence(u, v, True)
    exp_p = mg.pressure_solve_mg(div, kw.get("cycles", 2),
                                 tol=kw.get("tol", 0.0),
                                 max_cycles=kw.get("max_cycles", 8),
                                 smoother="burst")
    exp_u, exp_v, exp_st = ref.project(u, v, exp_p, return_stats=True)
    # f32-association noise amplifies through V-cycles on ~500-magnitude
    # pressure (measured max |dp| 2e-3 with residuals equal to 7 digits);
    # 5e-3 atol is ~4e-6 relative here
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(exp_p),
                               atol=5e-3, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(exp_u),
                               atol=5e-3, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(exp_v),
                               atol=5e-3, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_st), np.asarray(exp_st),
                               rtol=1e-4)


def test_pressure_project_mg_unfusable_geometry(rng):
    """Mirror-padded geometries (960x540-style) fall back piecewise and
    still match the composition."""
    from cudafluidsimulation_tpu.ops import multigrid as mg

    h, w = 60, 192  # w % 128 != 0 -> ends not fusable at the fine level
    assert not jacobi_pallas.mg_ends_fusable(h, w, 2)
    u = jnp.asarray((rng.standard_normal((h, w)) * 20).astype(np.float32))
    v = jnp.asarray((rng.standard_normal((h, w)) * 20).astype(np.float32))
    got_u, got_v, got_p = mg.pressure_project_mg(u, v, cycles=2, half=True)
    div = ref.divergence(u, v, True)
    exp_p = mg.pressure_solve_mg(div, 2, smoother="burst")
    exp_u, exp_v = ref.project(u, v, exp_p)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(exp_p),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(exp_u),
                               atol=2e-5, rtol=1e-5)


def test_pressure_project_mg_pipeline_wiring():
    """The pallas backend exposes the fused hook; the ref namespace does
    not (pipeline composes there); pipelines produce matching physics."""
    from cudafluidsimulation_tpu import Simulation
    from cudafluidsimulation_tpu.utils.impulse import constant_impulse

    cfg_p = FluidConfig.gpu_reference(nx=256, ny=256, backend="pallas",
                                      pressure_solver="multigrid",
                                      mg_cycles=2, vorticity=0.5,
                                      force_scale=500.0)
    cfg_r = FluidConfig.gpu_reference(nx=256, ny=256, backend="ref",
                                      pressure_solver="multigrid",
                                      mg_cycles=2, vorticity=0.5,
                                      force_scale=500.0)
    assert hasattr(get_ops(cfg_p), "pressure_project_mg")
    assert not hasattr(get_ops(cfg_r), "pressure_project_mg")
    imp = constant_impulse(8, 1 / 60, pos=(128.0, 128.0),
                           last_pos=(124.0, 126.0))
    st_p = Simulation(cfg_p).run(Simulation(cfg_p).init(), imp)
    st_r = Simulation(cfg_r).run(Simulation(cfg_r).init(), imp)
    np.testing.assert_allclose(np.asarray(st_p.u), np.asarray(st_r.u),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(st_p.dye), np.asarray(st_r.dye),
                               atol=5e-4)
