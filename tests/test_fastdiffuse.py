"""Separable fast diffusion (config.fast_diffuse) vs the exact sweep blur.

The fast mode evaluates the parity k-sweep diffusion operator M^k
(cpuFluidSim.cpp:182-233 — a fixed linear blur, not a converging solve)
through its rank-2 separable kernel approximation (ops/fastdiffuse.py).
These tests pin the design invariants (rank/radius selection, exact DC
preservation) and the ~1e-4 operator-error envelope against ops.ref,
including clamped edges, mirror-padded odd geometries, the column-tiled
wide-grid path, the fused splat tail, and the full pipeline step.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cudafluidsimulation_tpu.config import FluidConfig
from cudafluidsimulation_tpu.ops import fastdiffuse, ref
from cudafluidsimulation_tpu.ops.backend import get_ops

ALPHA = 0.8 * 0.8 * 60.0  # the reference coefficient set's Jacobi alpha
DT = 1.0 / 60.0


def _cfg(**kw):
    kw.setdefault("backend", "pallas")
    kw.setdefault("fast_diffuse", True)
    return FluidConfig.gpu_reference(**kw)


def _err(exact, fast):
    return np.abs(np.asarray(exact) - np.asarray(fast))


# ---------------------------------------------------------------------------
# tap design invariants
# ---------------------------------------------------------------------------


def test_design_dc_exact():
    xs, ys = fastdiffuse.design_taps(ALPHA, 20)
    dc = sum(float(x.sum()) * float(y.sum()) for x, y in zip(xs, ys))
    assert abs(dc - 1.0) < 1e-6  # M preserves constants; so must the taps


def test_design_kernel_error_budget():
    K = fastdiffuse._kernel2d(ALPHA, 20)
    xs, ys = fastdiffuse.design_taps(ALPHA, 20, rtol=2e-4)
    Kr = np.zeros_like(K)
    c = 20
    for x, y in zip(xs, ys):
        r = (len(x) - 1) // 2
        fx = np.zeros(2 * c + 1)
        fy = np.zeros(2 * c + 1)
        fx[c - r : c + r + 1] = x
        fy[c - r : c + r + 1] = y
        Kr += np.outer(fy, fx)
    # DC renorm may cost a little over the raw eigen budget
    assert np.linalg.norm(K - Kr) / np.linalg.norm(K) < 4e-4


def test_worthwhile_gate():
    # k=20 at the reference alpha: 40 FMA/cell vs ~100 — worth it
    assert fastdiffuse.worthwhile([ALPHA], 20)
    # k=5 (cpu-reference iteration count): tap volume ~28 vs 20 — not
    assert not fastdiffuse.worthwhile([ALPHA], 5)
    assert not fastdiffuse.worthwhile([ALPHA], 0)


def test_make_ops_respects_gate():
    assert fastdiffuse.make_ops(_cfg(nx=128, ny=128)) != {}
    assert fastdiffuse.make_ops(
        _cfg(nx=128, ny=128, diffusion_iters=5)) == {}


# ---------------------------------------------------------------------------
# operator accuracy (interpret mode off-TPU)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(192, 256), (540, 960)])
def test_diffuse_multi_matches_ref(rng, shape):
    h, w = shape
    cfg = _cfg(nx=w, ny=h)
    ops = fastdiffuse.make_ops(cfg)
    f = jnp.asarray(rng.standard_normal((5, h, w)), jnp.float32)
    coeffs = jnp.asarray([0.8] * 5, jnp.float32)
    exact = ref.diffuse_multi(f, DT, coeffs, 20)
    fast = ops["diffuse_multi"](f, DT, coeffs, 20)
    err = _err(exact, fast)
    assert err.max() < 5e-4
    # clamped-edge semantics are exact by construction: edge error stays
    # in the same truncation envelope as the interior
    edge = max(err[:, 0].max(), err[:, -1].max(),
               err[:, :, 0].max(), err[:, :, -1].max())
    assert edge < 5e-4


def test_diffuse_velocity_matches_ref(rng):
    cfg = _cfg(nx=128, ny=64)
    ops = fastdiffuse.make_ops(cfg)
    f = jnp.asarray(rng.standard_normal((2, 64, 128)), jnp.float32)
    exact = ref.diffuse(f, DT, 0.8, 20)
    fast = ops["diffuse"](f, DT, 0.8, 20)
    assert _err(exact, fast).max() < 5e-4


def test_tiled_path_matches_ref(rng):
    # w=8192 engages the column-tiled kernel (jacobi_pallas._col_plan)
    cfg = _cfg(nx=8192, ny=256)
    ops = fastdiffuse.make_ops(cfg)
    f = jnp.asarray(rng.standard_normal((2, 256, 8192)), jnp.float32)
    coeffs = jnp.asarray([0.8] * 2, jnp.float32)
    exact = ref.diffuse_multi(f, DT, coeffs, 20)
    fast = ops["diffuse_multi"](f, DT, coeffs, 20)
    err = _err(exact, fast)
    assert err.max() < 5e-4
    edge = max(err[:, 0].max(), err[:, -1].max(),
               err[:, :, 0].max(), err[:, :, -1].max())
    assert edge < 5e-4


def test_splat_tail_fused(rng):
    cfg = _cfg(nx=256, ny=192)
    ops = fastdiffuse.make_ops(cfg)
    f = jnp.asarray(rng.standard_normal((5, 192, 256)), jnp.float32)
    coeffs = jnp.asarray([0.8] * 5, jnp.float32)
    amps = jnp.asarray([1.0, -2.0, 0.3, 0.5, 0.2], jnp.float32)
    last = (jnp.float32(100.3), jnp.float32(50.7))
    exact = ref.diffuse_multi_splat(f, DT, coeffs, 20, amps, last, 400.0)
    fast = ops["diffuse_multi_splat"](f, DT, coeffs, 20, amps, last, 400.0)
    assert _err(exact, fast).max() < 5e-4


def test_dc_preserved(rng):
    cfg = _cfg(nx=256, ny=192)
    ops = fastdiffuse.make_ops(cfg)
    f = jnp.full((5, 192, 256), 3.25, jnp.float32)
    coeffs = jnp.asarray([0.8] * 5, jnp.float32)
    out = ops["diffuse_multi"](f, DT, coeffs, 20)
    assert float(jnp.abs(out - 3.25).max()) < 1e-5


# ---------------------------------------------------------------------------
# pipeline integration
# ---------------------------------------------------------------------------


def test_full_step_close_to_exact(rng):
    from cudafluidsimulation_tpu.models.simulation import Simulation

    exact_sim = Simulation(_cfg(nx=256, ny=192, fast_diffuse=False))
    fast_sim = Simulation(_cfg(nx=256, ny=192, fast_diffuse=True))
    state = exact_sim.init()
    u = rng.standard_normal((192, 256)).astype(np.float32) * 2
    state = state._replace(
        u=jnp.asarray(u),
        v=jnp.asarray(rng.standard_normal((192, 256)).astype(np.float32) * 2),
        dye=jnp.asarray(
            rng.random((3, 192, 256)).astype(np.float32)),
        vel_stats=jnp.asarray([8.0, 8.0], jnp.float32),
    )
    from cudafluidsimulation_tpu.utils.impulse import single

    imp = single((128.0, 96.0), (120.0, 90.0), True, DT)
    s_exact = exact_sim.step(state, imp)
    s_fast = fast_sim.step(state, imp)
    # one step's deviation = the diffusion operator error (~1e-4 on O(1)
    # fields) propagated through vorticity/pressure — same order
    assert _err(s_exact.u, s_fast.u).max() < 5e-3
    assert _err(s_exact.dye, s_fast.dye).max() < 5e-3


def test_backend_wires_fast_diffuse():
    ops_on = get_ops(_cfg(nx=256, ny=256, fast_diffuse=True))
    ops_off = get_ops(_cfg(nx=256, ny=256, fast_diffuse=False))
    assert ops_on.diffuse_multi is not ops_off.diffuse_multi
