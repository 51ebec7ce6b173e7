"""Separable fast diffusion — the opt-in ``fast_diffuse`` mode.

The parity diffusion is NOT a converging solve: each "Jacobi" sweep's center
term is the CURRENT iterate with a per-sweep buffer swap
(cpuFluidSim.cpp:198-201; GPUFluidSim.cu:316-429 hardcodes 20 sweeps), so
``iters`` sweeps apply a FIXED linear blur M^k with

    M = (S + alpha I) / (4 + alpha),   alpha = diffusion^2 / dt,

S = 4-neighbor sum with clamped edges.  M^k's 2-D interior kernel is
numerically low-rank separable: for the reference's alpha = 38.4 / k = 20
its eigendecomposition is rank-2 to 7e-5 relative Frobenius (the kernel is
a ~1-cell-sigma near-Gaussian), so TWO pairs of short 1-D tap passes
(~36 FMA/cell) evaluate what the parity path spends ~5*k VPU passes on
(~100 FMA-equivalents/cell at k=20).  See scripts/fastdiffuse_ab.py for the
measured step deltas and scripts/fastmode_rollout.py for rollout accuracy.

Boundary semantics are exact by construction, not approximated: the clamped
-neighbor sweep on a finite grid equals the infinite convolution applied to
the HALF-SAMPLE SYMMETRIC extension of the field (a symmetric stencil maps
HS-symmetric extensions to HS-symmetric extensions; f[-1] := f[0] is
symmetry about -1/2), so evaluating the truncated kernel with symmetric-
reflect taps reproduces the reference's clamped edges up to the SAME rank
truncation error as the interior — no separate edge correction needed.
The pallas kernels get this for free from the existing Neumann ghost
machinery (jacobi_pallas._edge_fill / _col_edge_fill build exactly that
even reflection).

Caveat (documented contract): the taps depend on alpha = diffusion^2/dt and
are precomputed in numpy at the CONFIG's nominal dt, so under a variable
real-time dt the fast mode diffuses at the nominal rate (the parity path's
alpha tracks the traced dt).  Headless/bench runs use a fixed dt, where the
two agree.  ``fast_diffuse`` is off by default — parity requires the exact
sweep operator.

Reference anchors: cpuFluidSim.cpp:182-233 (operator + swap),
GPUFluidSim.cu:316-429 (k=20), GPUFluidSim.cu:52,55 (coefficients).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cudafluidsimulation_tpu.ops.jacobi_pallas import (
    _assemble_ext,
    _col_plan,
    _edge_fill,
    _flip_cols,
    _halo_depth,
    _interpret,
    _mirror_pad,
    _pad_geometry,
    _strip_specs,
    _tiled_specs,
)

# ---------------------------------------------------------------------------
# Tap design (numpy, cached per (alpha, iters))
# ---------------------------------------------------------------------------


def _kernel2d(alpha: float, k: int) -> np.ndarray:
    """Exact interior kernel of M^k as a (2k+1)^2 array (float64)."""
    n = 2 * k + 1
    K = np.zeros((n, n))
    K[k, k] = 1.0
    w_c = alpha / (4.0 + alpha)
    w_n = 1.0 / (4.0 + alpha)
    for _ in range(k):
        Kn = w_c * K
        Kn[1:, :] += w_n * K[:-1, :]
        Kn[:-1, :] += w_n * K[1:, :]
        Kn[:, 1:] += w_n * K[:, :-1]
        Kn[:, :-1] += w_n * K[:, 1:]
        K = Kn
    return K


def _trunc(u: np.ndarray, c: int, r: int) -> np.ndarray:
    ut = np.zeros_like(u)
    ut[c - r : c + r + 1] = u[c - r : c + r + 1]
    return ut


@functools.lru_cache(maxsize=64)
def design_taps(alpha: float, iters: int, rtol: float = 2e-4,
                max_rank: int = 3) -> Tuple[Tuple[np.ndarray, ...], ...]:
    """Rank-R separable approximation of the k-sweep blur M^k.

    Returns ``(x_taps, y_taps)``: per-rank 1-D tap vectors (np.float32,
    lengths 2*r_i+1, possibly differing per rank) such that

        M^k  ~=  sum_i  conv_y(y_taps[i]) . conv_x(x_taps[i])

    with relative Frobenius error <= ``rtol`` on the interior kernel.  The
    eigenvalue (and its sign) folds into the y taps; the leading term is
    rescaled so the approximate kernel sums to EXACTLY 1 (M preserves
    constants — without the DC fix a uniform field would decay/grow by
    ~rtol per step).
    """
    K = _kernel2d(alpha, iters)
    nrm = np.linalg.norm(K)
    evals, evecs = np.linalg.eigh(K)
    order = np.argsort(-np.abs(evals))
    evals, evecs = evals[order], evecs[:, order]
    c = iters

    def rebuild(radii):
        Kr = np.zeros_like(K)
        for i, r in enumerate(radii):
            ut = _trunc(evecs[:, i], c, r)
            Kr += evals[i] * np.outer(ut, ut)
        return Kr

    # rank: smallest R whose untruncated error clears half the budget
    rank = max_rank
    for R in range(1, max_rank + 1):
        Kr = sum(
            evals[i] * np.outer(evecs[:, i], evecs[:, i]) for i in range(R)
        )
        if np.linalg.norm(K - Kr) / nrm <= 0.5 * rtol:
            rank = R
            break

    # common radius: smallest r meeting the budget, then shrink each rank's
    # radius individually while the budget still holds
    radii = None
    for r in range(1, iters + 1):
        if np.linalg.norm(K - rebuild([r] * rank)) / nrm <= rtol:
            radii = [r] * rank
            break
    if radii is None:
        radii = [iters] * rank
    for i in range(rank - 1, -1, -1):
        while radii[i] > 1:
            trial = list(radii)
            trial[i] -= 1
            if np.linalg.norm(K - rebuild(trial)) / nrm <= rtol:
                radii = trial
            else:
                break

    # fold eigenvalues into y taps; DC-normalize via the leading term
    xs, ys = [], []
    for i, r in enumerate(radii):
        u = evecs[c - r : c + r + 1, i].copy()
        xs.append(u)
        ys.append(evals[i] * u)
    dc_tail = sum(x.sum() * y.sum() for x, y in zip(xs[1:], ys[1:]))
    lead_dc = xs[0].sum() * ys[0].sum()
    scale = (1.0 - dc_tail) / lead_dc
    # split the correction across both passes to keep x/y symmetric
    s = np.sqrt(abs(scale))
    xs[0] = xs[0] * s
    ys[0] = ys[0] * (scale / s)
    return (
        tuple(x.astype(np.float32) for x in xs),
        tuple(y.astype(np.float32) for y in ys),
    )


def tap_cost(alpha: float, iters: int, rtol: float = 2e-4) -> int:
    """FMA/cell of the separable evaluation (both passes, all ranks)."""
    xs, _ = design_taps(alpha, iters, rtol)
    return int(sum(2 * len(x) for x in xs))


def worthwhile(alphas: Sequence[float], iters: int,
               rtol: float = 2e-4) -> bool:
    """Fast mode only pays when the tap volume undercuts the exact burst's
    ~5 VPU passes/sweep (BASELINE.md per-sweep pass accounting)."""
    if iters == 0:
        return False
    try:
        cost = max(tap_cost(float(a), iters, rtol) for a in set(alphas))
    except np.linalg.LinAlgError:  # pragma: no cover - eigh failure
        return False
    return cost < 4 * iters


def _taps_array(alphas: Sequence[float], iters: int, rtol: float):
    """Stack per-channel taps into one SMEM array.

    All channels must share the same per-rank radii (true whenever they
    share coefficients — the reference uses 0.8 for velocity AND dye; mixed
    -coefficient configs fall back if the designed radii differ).
    Returns (taps (C, L) np.float32, radii tuple) or None.
    """
    per_chan = [design_taps(float(a), iters, rtol) for a in alphas]
    radii = tuple((len(x) - 1) // 2 for x in per_chan[0][0])
    for xs, ys in per_chan:
        if tuple((len(x) - 1) // 2 for x in xs) != radii:
            return None
    rows = []
    for xs, ys in per_chan:
        flat = [w for x, y in zip(xs, ys) for w in (*x, *y)]
        rows.append(np.asarray(flat, np.float32))
    return np.stack(rows), radii


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _shift_x_sym(a: jnp.ndarray, j: int) -> jnp.ndarray:
    """out[:, x] = a[:, x+j] with half-sample symmetric reflection at the
    array's x edges (exact clamped-sweep boundary semantics — module doc).
    |j| is a tap radius (<= hd), so the flips are a few single-lane copies."""
    if j == 0:
        return a
    if j > 0:
        return jnp.concatenate([a[:, j:], _flip_cols(a[:, -j:])], axis=1)
    m = -j
    return jnp.concatenate([_flip_cols(a[:, :m]), a[:, :-m]], axis=1)


def _sep_core(tap_ref, fe: jnp.ndarray, radii, hd: int, r_rows: int):
    """Shared rank-sum: x tap pass over the full ext (symmetric-reflect
    shifts), y tap pass onto the core rows."""
    ci = pl.program_id(0)
    off = 0
    acc = None
    for rx in radii:
        T = 2 * rx + 1
        tx = None
        for j in range(-rx, rx + 1):
            w = tap_ref[ci, off + j + rx]
            s = _shift_x_sym(fe, j)
            tx = w * s if tx is None else tx + w * s
        for j in range(-rx, rx + 1):
            w = tap_ref[ci, off + T + j + rx]
            sl = tx[hd + j : hd + j + r_rows, :]
            acc = w * sl if acc is None else acc + w * sl
        off += 2 * T
    return acc


def _splat_tail(core, amp_ref, sp_ref, row0, col0):
    """Fused gpu-variant splat add (ref.splat_tail semantics) on the core
    block at global offset (row0, col0) — mirrors _diffuse_kernel's tail."""
    r_rows, w = core.shape
    amp = amp_ref[pl.program_id(0), 0]
    lx = sp_ref[0, 0]
    ly = sp_ref[1, 0]
    rad = sp_ref[2, 0]
    ys = (jax.lax.broadcasted_iota(jnp.int32, (r_rows, w), 0)
          + row0).astype(jnp.float32)
    xs = (jax.lax.broadcasted_iota(jnp.int32, (r_rows, w), 1)
          + col0).astype(jnp.float32)
    d2 = (xs - lx) ** 2 + (ys - ly) ** 2
    return core + amp * jnp.exp(-d2 / rad)


def _sep_kernel(tap_ref, amp_ref, sp_ref, f_mid, f_lo, f_hi, out, *,
                radii, hd, n_strips, splat):
    i = pl.program_id(1)
    fe = jnp.concatenate([f_lo[0], f_mid[0], f_hi[0]], axis=0)
    fe = _edge_fill(fe, i, n_strips, hd)  # HS-symmetric ghosts (exact)
    r_rows = f_mid.shape[1]
    core = _sep_core(tap_ref, fe, radii, hd, r_rows)
    if splat:
        core = _splat_tail(core, amp_ref, sp_ref, i * r_rows, 0)
    out[0] = core


def _sep_kernel_tiled(tap_ref, amp_ref, sp_ref, f_mm, f_ml, f_mr, f_tm,
                      f_tl, f_tr, f_bm, f_bl, f_br, out, *, radii, hd,
                      n_strips, t_cnt, wd, wt, splat):
    i = pl.program_id(1)
    ti = pl.program_id(2)
    fe = _assemble_ext(f_mm, f_ml, f_mr, f_tm, f_tl, f_tr, f_bm, f_bl, f_br,
                       ti, t_cnt, hd)
    fe = _edge_fill(fe, i, n_strips, hd)
    r_rows = f_mm.shape[1]
    # x taps are plain slices here: the tile halo supplies rmax <= hd real
    # columns (physical edges already ghost-filled by _assemble_ext), so
    # each tap slices its core x window instead of reflecting
    ci = pl.program_id(0)
    off = 0
    acc = None
    for rx in radii:
        T = 2 * rx + 1
        tx = None
        for j in range(-rx, rx + 1):
            w = tap_ref[ci, off + j + rx]
            s = fe[:, wd + j : wd + j + wt]
            tx = w * s if tx is None else tx + w * s
        for j in range(-rx, rx + 1):
            w = tap_ref[ci, off + T + j + rx]
            sl = tx[hd + j : hd + j + r_rows, :]
            acc = w * sl if acc is None else acc + w * sl
        off += 2 * T
    core = acc
    if splat:
        core = _splat_tail(core, amp_ref, sp_ref, i * r_rows, ti * wt)
    out[0] = core


# ---------------------------------------------------------------------------
# Entry points
# ---------------------------------------------------------------------------


def _sep_apply(fields: jnp.ndarray, taps: np.ndarray, radii, splat,
               block_rows: int) -> jnp.ndarray:
    c, h, w = fields.shape
    rmax = max(radii)
    hd = _halo_depth(rmax)
    h_pad, w_pad, r = _pad_geometry(h, w, hd, block_rows)
    fi = _mirror_pad(fields, h, w, h_pad, w_pad)
    taps_j = jnp.asarray(taps)
    if splat is not None:
        amps, last, radius = splat
        amp_arr = jnp.asarray(amps, jnp.float32).reshape(c, 1)
        sp_arr = jnp.stack([
            jnp.asarray(last[0], jnp.float32),
            jnp.asarray(last[1], jnp.float32),
            jnp.asarray(radius, jnp.float32),
        ]).reshape(3, 1)
    else:
        amp_arr = jnp.zeros((c, 1), jnp.float32)
        sp_arr = jnp.ones((3, 1), jnp.float32)
    with_splat = splat is not None
    plan = _col_plan(h_pad, w_pad, hd, block_rows)
    if plan is not None:
        wt, wd, t_cnt, r = plan
        unpad, halo, out = _tiled_specs(h_pad, w_pad, r, hd, wt, wd)
        kern = functools.partial(
            _sep_kernel_tiled, radii=radii, hd=hd, n_strips=h_pad // r,
            t_cnt=t_cnt, wd=wd, wt=wt, splat=with_splat)
        smem_t = pl.BlockSpec(taps.shape, lambda ci, i, t: (0, 0),
                              memory_space=pltpu.SMEM)
        smem_c = pl.BlockSpec((c, 1), lambda ci, i, t: (0, 0),
                              memory_space=pltpu.SMEM)
        smem_3 = pl.BlockSpec((3, 1), lambda ci, i, t: (0, 0),
                              memory_space=pltpu.SMEM)
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((c, h_pad, w_pad), jnp.float32),
            grid=(c, h_pad // r, t_cnt),
            in_specs=[smem_t, smem_c, smem_3, unpad["mm"], halo["ml"],
                      halo["mr"], unpad["tm"], halo["tl"], halo["tr"],
                      unpad["bm"], halo["bl"], halo["br"]],
            out_specs=out,
            interpret=_interpret(),
        )(taps_j, amp_arr, sp_arr, fi, fi, fi, fi, fi, fi, fi, fi, fi)
        return f[:, :h, :w]
    mid, lo, hi, n_strips = _strip_specs(h_pad, w_pad, r, hd)
    kern = functools.partial(_sep_kernel, radii=radii, hd=hd,
                             n_strips=n_strips, splat=with_splat)
    smem_t = pl.BlockSpec(taps.shape, lambda ci, i: (0, 0),
                          memory_space=pltpu.SMEM)
    smem_c = pl.BlockSpec((c, 1), lambda ci, i: (0, 0),
                          memory_space=pltpu.SMEM)
    smem_3 = pl.BlockSpec((3, 1), lambda ci, i: (0, 0),
                          memory_space=pltpu.SMEM)
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((c, h_pad, w_pad), jnp.float32),
        grid=(c, n_strips),
        in_specs=[smem_t, smem_c, smem_3, mid, lo, hi],
        out_specs=pl.BlockSpec((1, r, w_pad), lambda ci, i: (ci, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(taps_j, amp_arr, sp_arr, fi, fi, fi)
    return f[:, :h, :w]


def sharded_sep(config):
    """(ops dict, halo radius) for the sharded namespaces, or None.

    The separable op is one-shot, so a sharded shard runs it on a local
    array padded with ONE rmax-deep mirror halo exchange (mirror = the
    half-sample symmetric ghost the op's boundary semantics demand at true
    domain edges; at interior seams the halo rows are real neighbor data
    and the kernel's own edge reflection only corrupts the discarded halo
    output rows).  rmax <= 8 vs the parity path's k-deep burst exchanges.
    """
    ops = make_ops(config)
    if not ops:
        return None
    iters = config.diffusion_iters
    rmax = 0
    for coeff in (config.velocity_diffusion, config.color_diffusion):
        xs, _ = design_taps(coeff ** 2 / config.dt, iters, rtol=2e-4)
        rmax = max(rmax, max((len(x) - 1) // 2 for x in xs))
    return ops, rmax


def make_ops(config) -> dict:
    """Namespace overrides for ``config.fast_diffuse`` (consumed by
    ops.pallas_kernels.overrides).  Returns {} when the separable taps
    would not undercut the exact burst (worthwhile() gate) so parity
    kernels keep running.

    Contract: the returned ops IGNORE the traced ``dt``/``coeffs``
    arguments and use the config's static ``dt`` / diffusion coefficients
    for the taps (models/pipelines.py builds its call-site coeffs from the
    same config; the splat tail's amps/position stay traced).
    """
    iters = config.diffusion_iters
    a_v = config.velocity_diffusion ** 2 / config.dt
    a_c = config.color_diffusion ** 2 / config.dt
    if not worthwhile((a_v, a_c), iters):
        return {}
    built = _taps_array([a_v] * 2 + [a_c] * 3, iters, rtol=2e-4)
    built_v = _taps_array([a_v] * 2, iters, rtol=2e-4)
    if built is None or built_v is None:
        return {}
    taps5, radii5 = built
    taps2, radii2 = built_v
    block_rows = config.block_rows

    def diffuse(fields, dt, diffusion, iters_):
        squeeze = fields.ndim == 2
        if squeeze:
            fields = fields[None]
        # velocity taps broadcast to however many channels arrive (the
        # pipelines call site only ever passes the stacked velocity pair)
        t = np.broadcast_to(taps2[:1], (fields.shape[0], taps2.shape[1]))
        out = _sep_apply(fields, np.ascontiguousarray(t), radii2, None,
                         block_rows)
        return out[0] if squeeze else out

    def diffuse_multi(fields, dt, coeffs, iters_):
        return _sep_apply(fields, taps5[: fields.shape[0]], radii5, None,
                          block_rows)

    def diffuse_multi_splat(fields, dt, coeffs, iters_, amps, last, radius):
        return _sep_apply(fields, taps5[: fields.shape[0]], radii5,
                          (amps, last, radius), block_rows)

    return {
        "diffuse": diffuse,
        "diffuse_multi": diffuse_multi,
        "diffuse_multi_splat": diffuse_multi_splat,
    }
