"""Multigrid pressure solver: convergence and pipeline integration."""

import numpy as np
import jax.numpy as jnp
import pytest

from cudafluidsimulation_tpu import FluidConfig, Simulation
from cudafluidsimulation_tpu.ops import ref
from cudafluidsimulation_tpu.ops.multigrid import pressure_solve_mg, residual_norm
from cudafluidsimulation_tpu.utils.impulse import constant_impulse


def test_mg_beats_40_jacobi_sweeps(rng):
    div = rng.standard_normal((256, 256)).astype(np.float32)
    div = div - div.mean()  # compatible RHS for the Neumann system
    div = jnp.asarray(div)
    p_jac = ref.pressure_solve(div, 40)
    p_mg = pressure_solve_mg(div, cycles=2)
    r_jac = float(residual_norm(p_jac, div))
    r_mg = float(residual_norm(p_mg, div))
    # 2 V-cycles (~ 11 sweep-equivalents) must beat 40 plain sweeps
    assert r_mg < 0.5 * r_jac, (r_mg, r_jac)


def test_single_cycle_beats_40_jacobi_sweeps(rng):
    """With bilinear (9-3-3-1) prolongation even ONE V-cycle out-converges
    40 plain sweeps — nearest-neighbor prolongation could not (it is below
    the order requirement for the 5-point Laplacian and injects blocky
    error; see ops/multigrid.py docstring for the measured 2048² numbers)."""
    div = rng.standard_normal((256, 256)).astype(np.float32)
    div = jnp.asarray(div - div.mean())
    r_jac = float(residual_norm(ref.pressure_solve(div, 40), div))
    r_mg1 = float(residual_norm(pressure_solve_mg(div, cycles=1), div))
    assert r_mg1 < r_jac, (r_mg1, r_jac)


def test_mg_converges_with_cycles(rng):
    div = rng.standard_normal((128, 128)).astype(np.float32)
    div = jnp.asarray(div - div.mean())
    r = [float(residual_norm(pressure_solve_mg(div, cycles=c), div))
         for c in (1, 2, 4)]
    assert r[1] < 0.5 * r[0]
    assert r[2] < 0.5 * r[1]


def test_mg_odd_grid_levels(rng):
    # 96 = 2^5 * 3: should coarsen a few levels and still work
    div = jnp.asarray(rng.standard_normal((96, 192)).astype(np.float32))
    p = pressure_solve_mg(div, cycles=2)
    assert np.isfinite(np.asarray(p)).all()


def test_pipeline_with_multigrid_reduces_divergence():
    base = dict(nx=128, ny=128, backend="ref", vorticity=0.5, force_scale=500.0)
    cfg_j = FluidConfig.gpu_reference(pressure_iters=10, **base)
    cfg_m = FluidConfig.gpu_reference(pressure_solver="multigrid", mg_cycles=2,
                                      **base)
    imp = constant_impulse(15, 1 / 60, pos=(64.0, 64.0), last_pos=(60.0, 62.0))
    st_j = Simulation(cfg_j).run(Simulation(cfg_j).init(), imp)
    st_m = Simulation(cfg_m).run(Simulation(cfg_m).init(), imp)
    dj = float(jnp.sqrt(jnp.mean(ref.divergence(st_j.u, st_j.v, True) ** 2)))
    dm = float(jnp.sqrt(jnp.mean(ref.divergence(st_m.u, st_m.v, True) ** 2)))
    assert np.isfinite(dm)
    # the multigrid-projected flow should carry less residual divergence
    assert dm < dj


def test_mg_tol_reaches_target(rng):
    """Residual-targeted stopping: the returned iterate meets tol (verified
    at the pre-smooth probe — ops.multigrid.probed_tol_loop, which may
    legitimately return a pre-smooth-verified iterate mid-cycle), a looser
    tol stops EARLIER (higher residual than a tighter one, and well above
    what one more full cycle would reach), and a tighter tol converges
    further."""
    div = rng.standard_normal((128, 128)).astype(np.float32)
    div = jnp.asarray(div - div.mean())
    r1 = float(residual_norm(pressure_solve_mg(div, cycles=1), div))
    r2 = float(residual_norm(pressure_solve_mg(div, cycles=2), div))
    r3 = float(residual_norm(pressure_solve_mg(div, cycles=3), div))
    assert r3 < r2 < r1
    tol = 0.5 * (r1 + r2)
    p_tol = pressure_solve_mg(div, tol=float(tol), max_cycles=8)
    res_loose = float(residual_norm(p_tol, div))
    assert res_loose < tol  # the contract
    # early stopping actually happened: nowhere near the 3-cycle residual
    assert res_loose > r3
    tight = 0.9 * r2
    p_tight = pressure_solve_mg(div, tol=float(tight), max_cycles=8)
    res_tight = float(residual_norm(p_tight, div))
    assert res_tight < tight
    assert res_tight <= res_loose


def test_mg_tol_respects_max_cycles(rng):
    """An unreachable tol stops at max_cycles (bitwise the fixed-count
    solution) instead of looping."""
    div = rng.standard_normal((64, 64)).astype(np.float32)
    div = jnp.asarray(div - div.mean())
    p_cap = pressure_solve_mg(div, tol=1e-20, max_cycles=3)
    np.testing.assert_allclose(np.asarray(p_cap),
                               np.asarray(pressure_solve_mg(div, cycles=3)),
                               rtol=1e-5, atol=1e-5)


def test_mg_tol_in_pipeline():
    cfg = FluidConfig.gpu_reference(nx=128, ny=128, backend="ref",
                                    pressure_solver="multigrid", mg_tol=0.05,
                                    vorticity=0.5, force_scale=500.0)
    sim = Simulation(cfg)
    imp = constant_impulse(10, 1 / 60, pos=(64.0, 64.0), last_pos=(60.0, 62.0))
    st = sim.run(sim.init(), imp)
    assert np.isfinite(np.asarray(st.u)).all()
    r = float(residual_norm(st.pressure,
                            ref.divergence(st.u, st.v, True)))
    # the state's pressure solved the PRE-projection divergence to tol; the
    # post-state residual just needs to be finite and small-ish
    assert np.isfinite(r)


def test_quality_preset_config():
    cfg = FluidConfig.quality(nx=256, ny=256)
    assert cfg.pressure_solver == "multigrid"
    assert cfg.mg_tol == 0.05
    assert cfg.max_displacement == 31
    # overrides win
    cfg2 = FluidConfig.quality(nx=256, ny=256, max_displacement=15)
    assert cfg2.max_displacement == 15


def test_invalid_mg_tol_rejected():
    with pytest.raises(ValueError, match="mg_tol"):
        FluidConfig.gpu_reference(pressure_solver="multigrid", mg_tol=-1.0)
    with pytest.raises(ValueError, match="mg_max_cycles"):
        FluidConfig.gpu_reference(pressure_solver="multigrid", mg_max_cycles=0)


def test_invalid_solver_rejected():
    with pytest.raises(ValueError):
        FluidConfig.gpu_reference(pressure_solver="conjugate-gradient")


def test_invalid_mg_cycles_rejected():
    """0 cycles would silently skip the pressure solve (zero pressure, no
    projection) — must be a config error, not a quietly wrong run."""
    for bad in (0, -1):
        with pytest.raises(ValueError, match="mg_cycles"):
            FluidConfig.gpu_reference(pressure_solver="multigrid",
                                      mg_cycles=bad)
    with pytest.raises(ValueError, match="max_displacement"):
        FluidConfig.gpu_reference(max_displacement=0)
