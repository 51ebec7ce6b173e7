"""Burst Jacobi sweeps in VMEM — the hot kernels of the engine.

The CUDA reference amortizes HBM traffic for its iterative stages by loading a
(16+2)² shared-memory tile once and running 20-30 Jacobi iterations on it with
*stale* halos (GPUFluidSim.cu:316-429 diffuse, :445-495 pressure) — an
approximation that decouples tiles.  The TPU design here keeps the exactness:

  - The grid is split into row strips of ``block_rows`` x W kept in VMEM with
    a halo of depth ``hd`` (a multiple of 8, the f32 sublane tile) on both
    sides.
  - Each kernel invocation runs ``k <= hd`` exact Jacobi sweeps; the valid
    region shrinks by one row per sweep (the classic trapezoid blocking
    argument), so after ``k`` sweeps the strip interior equals bit-exact
    *global* Jacobi.
  - Between bursts the strips re-fetch fresh halos from HBM, so ``iters``
    total sweeps cost ~``iters/k`` field round-trips instead of ``iters``.

Boundary conditions: the clamped stencil (CLAMP macro, cpuFluidSim.cpp:8) is
the Neumann condition p(-1)=p(0), whose exact ghost extension is the even
reflection p(-1-j)=p(j).  Physical-edge strips therefore fill their halo with
*mirrored* interior rows; a mirrored halo evolves, by symmetry, exactly like
its interior image under every sweep.  (Edge replication is exact only for
k <= 2 — verified numerically.)

Neighbor shifts use slice-concat (clamped borders; measured slightly faster
than rotate+select), so a sweep is pure VPU work on VMEM-resident data.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cudafluidsimulation_tpu.config import FluidConfig

_SUBLANE = 8  # f32 sublane tile; block row counts must be multiples of this


def _interpret() -> bool:
    # Run kernels through the interpreter off-TPU so tests exercise this path.
    return jax.default_backend() != "tpu"


def _clamped_neighbors(a: jnp.ndarray):
    """(left, right, below, above) neighbors of the VMEM-resident strip via
    slice-concat shifts (measured slightly faster than rotate+select here).

    X-borders are clamped (edge-replicated): a[y, 0] is its own left
    neighbor.  Y edge handling is immaterial: the halo is mirror-filled
    (physical edges) or garbage-tolerated (strip seams, trapezoid argument),
    so whatever the edge rows see never reaches the emitted interior —
    clamped slices serve.
    """
    left = jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)
    right = jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
    below = jnp.concatenate([a[:1, :], a[:-1, :]], axis=0)
    above = jnp.concatenate([a[1:, :], a[-1:, :]], axis=0)
    return left, right, below, above


def _flip_rows(x: jnp.ndarray) -> jnp.ndarray:
    """Row reversal via static slices (Mosaic has no `rev` lowering; the
    halo is only 8-16 rows so this is a handful of sublane copies)."""
    n = x.shape[0]
    return jnp.concatenate([x[j : j + 1] for j in reversed(range(n))], axis=0)


def _edge_fill(ext: jnp.ndarray, strip_idx, n_strips: int, hd: int) -> jnp.ndarray:
    """Mirror-fill the ``hd`` halo rows of physical-boundary strips (even
    reflection — see module docstring)."""
    first = strip_idx == 0
    last = strip_idx == n_strips - 1
    low = jnp.concatenate([_flip_rows(ext[hd : 2 * hd]), ext[hd:]], axis=0)
    ext = jnp.where(first, low, ext)
    high = jnp.concatenate([ext[:-hd], _flip_rows(ext[-2 * hd : -hd])], axis=0)
    ext = jnp.where(last, high, ext)
    return ext


def _pressure_kernel(p_mid, p_lo, p_hi, d_mid, d_lo, d_hi, out, *, k, hd, n_strips):
    i = pl.program_id(1)
    pe = jnp.concatenate([p_lo[0], p_mid[0], p_hi[0]], axis=0)
    de = jnp.concatenate([d_lo[0], d_mid[0], d_hi[0]], axis=0)
    pe = _edge_fill(pe, i, n_strips, hd)
    de = _edge_fill(de, i, n_strips, hd)
    for _ in range(k):
        l, r, b, t = _clamped_neighbors(pe)
        pe = (l + r + b + t - de) * 0.25
    out[0] = pe[hd:-hd, :]


# ---------------------------------------------------------------------------
# Column tiling (wide grids).  At w=8192 the flat strip geometry falls to
# r=32 rows (he=48 -> 1.5x compute overhead vs the 2048² strips' 1.125x).
# Splitting the width into tiles restores tall strips; each program sees its
# tile through a 3x3 halo-block assembly read from the ONE unpadded array:
# interior tile halos are plain field columns (wd-col BlockSpecs with
# clamped indices), and the physical x edges get their Neumann ghosts
# synthesized IN-KERNEL on the small halo blocks (_col_edge_fill — the even
# reflection of the core's edge columns, the same sweep-invariant ghost
# _edge_fill builds for rows).  Earlier rounds materialized the ghosts
# outside the kernel (a full mirror-padded twin, then a compact halo-col
# array); the compact build still measured 6.2 ms/burst at 8192² — the
# XLA flip/concat passes over 5 channels dominated the whole burst's fixed
# cost — so round 3 moved the ghosts into the kernel, where they touch only
# (r, hd)-sized slices of already-resident blocks.
# ---------------------------------------------------------------------------

_COL_TILE_MIN_W = 4096


def _col_plan(h_pad: int, w_pad: int, hd: int, requested: int,
              planes: int = 4):
    """(wt, wd, t_cnt, r) column-tiling plan for wide grids, or None.
    Engages only when the modeled compute overhead beats the flat strips'
    by >8% (validated on-chip — scripts/diffuse_probe.py)."""
    if w_pad < _COL_TILE_MIN_W:
        return None
    wd = 128  # >= any burst depth (k <= 32) and lane-aligned
    r_f = _pick_block_rows(h_pad, hd, w_pad, requested, planes)
    flat_cost = (r_f + 2.0 * hd) / r_f if r_f else float("inf")
    best = None
    lanes = w_pad // 128
    for t_cnt in range(2, lanes + 1):
        if lanes % t_cnt:
            continue
        wt = w_pad // t_cnt
        if wt % wd or wt < 2 * wd:
            continue
        r = _pick_block_rows(h_pad, hd, wt + 2 * wd, requested, planes)
        if r == 0:
            continue
        cost = ((wt + 2.0 * wd) / wt) * ((r + 2.0 * hd) / r)
        if best is None or cost < best[0]:
            best = (cost, wt, wd, t_cnt, r)
    if best is not None and best[0] < 0.92 * flat_cost:
        return best[1:]
    return None


def _tiled_specs(h: int, w: int, r: int, hd: int, wt: int, wd: int):
    """Block specs for the 3x3 assembly of one (C, H, W) field, ALL read
    from the one unpadded array (halo blocks in wd-col units with clamped
    indices; clamped reads at physical edges are junk whose inner hd cols
    _col_edge_fill replaces in-kernel).  Grid is (c, strips, tiles)."""
    hblk = h // hd
    tw = wt // wd
    wblk = w // wd

    def rlo(i):
        return jnp.maximum(i * (r // hd) - 1, 0)

    def rhi(i):
        return jnp.minimum((i + 1) * (r // hd), hblk - 1)

    def clo(t):
        return jnp.maximum(t * tw - 1, 0)

    def chi(t):
        return jnp.minimum((t + 1) * tw, wblk - 1)

    vm = pltpu.VMEM

    def bs(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=vm)

    unpadded = dict(
        mm=bs((1, r, wt), lambda c, i, t: (c, i, t)),
        tm=bs((1, hd, wt), lambda c, i, t: (c, rlo(i), t)),
        bm=bs((1, hd, wt), lambda c, i, t: (c, rhi(i), t)),
    )
    halo = dict(
        ml=bs((1, r, wd), lambda c, i, t: (c, i, clo(t))),
        mr=bs((1, r, wd), lambda c, i, t: (c, i, chi(t))),
        tl=bs((1, hd, wd), lambda c, i, t: (c, rlo(i), clo(t))),
        tr=bs((1, hd, wd), lambda c, i, t: (c, rlo(i), chi(t))),
        bl=bs((1, hd, wd), lambda c, i, t: (c, rhi(i), clo(t))),
        br=bs((1, hd, wd), lambda c, i, t: (c, rhi(i), chi(t))),
    )
    out = bs((1, r, wt), lambda c, i, t: (c, i, t))
    return unpadded, halo, out


def _flip_cols(x: jnp.ndarray) -> jnp.ndarray:
    """Column reversal via static slices (no Mosaic `rev`); used only on
    hd-wide slices, so it is a handful of single-lane copies."""
    n = x.shape[-1]
    return jnp.concatenate([x[..., j : j + 1] for j in reversed(range(n))],
                           axis=-1)


def _col_edge_fill(left, right, mid, t, t_cnt: int, hd: int):
    """Physical-x-edge ghosts for one row band of the 3x3 assembly: on the
    first/last tile, overwrite the halo block's inner ``hd`` columns with
    the even reflection of the core's first/last ``hd`` columns — the exact
    Neumann ghost for the clamped stencil (see module docstring).  The halo
    block's remaining wd-hd columns keep their clamped-read junk, whose
    influence travels 1 col/sweep and cannot reach the emitted core within
    k <= hd sweeps."""
    wd = left.shape[-1]
    lg = jnp.concatenate([left[:, : wd - hd], _flip_cols(mid[:, :hd])],
                         axis=1)
    left = jnp.where(t == 0, lg, left)
    rg = jnp.concatenate([_flip_cols(mid[:, -hd:]), right[:, hd:]], axis=1)
    right = jnp.where(t == t_cnt - 1, rg, right)
    return left, right


def _assemble_ext(mm, ml, mr, tm, tl, tr, bm, bl, br, t, t_cnt: int,
                  hd: int):
    """(he, wext) ext from the 9 blocks of one channel, with in-kernel
    physical-x-edge ghost fill (cols first, so the caller's row _edge_fill
    mirrors already-ghosted columns and the corners come out exact)."""
    ml, mr = _col_edge_fill(ml[0], mr[0], mm[0], t, t_cnt, hd)
    tl, tr = _col_edge_fill(tl[0], tr[0], tm[0], t, t_cnt, hd)
    bl, br = _col_edge_fill(bl[0], br[0], bm[0], t, t_cnt, hd)
    top = jnp.concatenate([tl, tm[0], tr], axis=1)
    mid = jnp.concatenate([ml, mm[0], mr], axis=1)
    bot = jnp.concatenate([bl, bm[0], br], axis=1)
    return jnp.concatenate([top, mid, bot], axis=0)


def _pressure_kernel_tiled(p_mm, p_ml, p_mr, p_tm, p_tl, p_tr, p_bm, p_bl,
                           p_br, d_mm, d_ml, d_mr, d_tm, d_tl, d_tr, d_bm,
                           d_bl, d_br, out, *, k, hd, n_strips, t_cnt, wd):
    i = pl.program_id(1)
    ti = pl.program_id(2)
    pe = _assemble_ext(p_mm, p_ml, p_mr, p_tm, p_tl, p_tr, p_bm, p_bl, p_br,
                       ti, t_cnt, hd)
    de = _assemble_ext(d_mm, d_ml, d_mr, d_tm, d_tl, d_tr, d_bm, d_bl, d_br,
                       ti, t_cnt, hd)
    pe = _edge_fill(pe, i, n_strips, hd)
    de = _edge_fill(de, i, n_strips, hd)
    for _ in range(k):
        l, r, b, t = _clamped_neighbors(pe)
        pe = (l + r + b + t - de) * 0.25
    out[0] = pe[hd:-hd, wd:-wd]


def _col_mirror_ext(ext, t, t_cnt: int, hd: int, wd: int):
    """_col_edge_fill applied to an ALREADY-COMPUTED (he, wext) ext (the
    in-kernel divergence): mirror the core's edge columns onto the halo
    region's inner hd cols at physical x edges."""
    left, right = _col_edge_fill(ext[:, :wd], ext[:, -wd:], ext[:, wd:-wd],
                                 t, t_cnt, hd)
    return jnp.concatenate([left, ext[:, wd:-wd], right], axis=1)


def _first_pressure_kernel_tiled(u_mm, u_ml, u_mr, u_tm, u_tl, u_tr, u_bm,
                                 u_bl, u_br, v_mm, v_ml, v_mr, v_tm, v_tl,
                                 v_tr, v_bm, v_bl, v_br, p_out, d_out,
                                 *, k, hd, n_strips, t_cnt, wd, half):
    """Tiled burst 1 fused with divergence (the wide-grid sibling of
    _first_pressure_kernel): read velocity through the 3x3 assembly, build
    div in VMEM, run k sweeps from p=0, emit p AND div.  Mirror ghosts at
    distance 1 equal the clamp ghost the divergence taps need (p(-1)=p(0)
    even reflection), and the div ext is then itself mirror-ghosted (the
    sweep-invariant form); k <= hd-1 keeps the emitted core bit-exact
    global Jacobi — same argument as the flat kernel."""
    i = pl.program_id(1)
    ti = pl.program_id(2)
    ue = _assemble_ext(u_mm, u_ml, u_mr, u_tm, u_tl, u_tr, u_bm, u_bl, u_br,
                       ti, t_cnt, hd)
    ve = _assemble_ext(v_mm, v_ml, v_mr, v_tm, v_tl, v_tr, v_bm, v_bl, v_br,
                       ti, t_cnt, hd)
    ue = _edge_fill(ue, i, n_strips, hd)
    ve = _edge_fill(ve, i, n_strips, hd)
    de = _divergence_ext(ue, ve, half)
    de = _col_mirror_ext(de, ti, t_cnt, hd, wd)
    de = _edge_fill(de, i, n_strips, hd)
    pe = de * -0.25  # sweep 1 from p=0: all neighbor taps are zero
    for _ in range(k - 1):
        l, r, b, t = _clamped_neighbors(pe)
        pe = (l + r + b + t - de) * 0.25
    p_out[0] = pe[hd:-hd, wd:-wd]
    d_out[0] = de[hd:-hd, wd:-wd]


def _last_pressure_kernel_tiled(p_mm, p_ml, p_mr, p_tm, p_tl, p_tr, p_bm,
                                p_bl, p_br, d_mm, d_ml, d_mr, d_tm, d_tl,
                                d_tr, d_bm, d_bl, d_br, u_mid, v_mid,
                                p_out, u_out, v_out, *maybe_st,
                                k, hd, n_strips, t_cnt, wd):
    """Tiled final burst fused with projection: k sweeps, then subtract the
    pressure gradient from the core-resident velocity.  The gradient's
    clamped x taps come straight from the ext (mirror == clamp at distance
    1); k <= hd-1 keeps the core+-1 region exact for the taps."""
    i = pl.program_id(1)
    ti = pl.program_id(2)
    pe = _assemble_ext(p_mm, p_ml, p_mr, p_tm, p_tl, p_tr, p_bm, p_bl, p_br,
                       ti, t_cnt, hd)
    de = _assemble_ext(d_mm, d_ml, d_mr, d_tm, d_tl, d_tr, d_bm, d_bl, d_br,
                       ti, t_cnt, hd)
    pe = _edge_fill(pe, i, n_strips, hd)
    de = _edge_fill(de, i, n_strips, hd)
    for _ in range(k):
        l, r, b, t = _clamped_neighbors(pe)
        pe = (l + r + b + t - de) * 0.25
    rr = pe.shape[0] - 2 * hd
    ps = pe[hd:-hd, wd:-wd]
    pl_ = pe[hd:-hd, wd - 1 : -wd - 1]
    pr_ = pe[hd:-hd, wd + 1 : pe.shape[1] - wd + 1]
    # y taps: the mirror ghost row can drift 1 ulp from its core image
    # under the sweeps (l+r+b+t commutes its x operands but associates the
    # y ones differently), so physical edges tap the core row itself —
    # bit-identical to the unfused _project_kernel's edge-replicate
    pb_h = jnp.where(i == 0, ps[:1], pe[hd - 1 : hd, wd:-wd])
    pt_h = jnp.where(i == n_strips - 1, ps[-1:],
                     pe[hd + rr : hd + rr + 1, wd:-wd])
    pb_ = jnp.concatenate([pb_h, ps[:-1]], axis=0)
    pt_ = jnp.concatenate([ps[1:], pt_h], axis=0)
    u2 = u_mid[0] - 0.5 * (pr_ - pl_)
    v2 = v_mid[0] - 0.5 * (pt_ - pb_)
    p_out[0] = ps
    u_out[0] = u2
    v_out[0] = v2
    if maybe_st:
        _emit_vel_stats(maybe_st[0], u2, v2, i, ti)


def _pressure_project_tiled(u3, v3, ks, h: int, w: int, half: bool,
                            block_rows: int, burst: int,
                            return_stats: bool = False):
    """Wide-grid pressure_project with divergence fused into the first
    TILED burst and projection into the last (exact unpadded geometries,
    len(ks) >= 2; caller checked _fused_tiled_plans).  Replaces the
    decomposed divergence/solve/project path's two single-pass kernels
    AND the zeros-p materialization the first plain burst reads."""
    plan1, planL = _fused_tiled_plans(h, w, ks, block_rows)
    k1, kl = ks[0], ks[-1]
    hd1 = _halo_depth(k1 + 1)
    hdl = _halo_depth(kl + 1)

    wt, wd, t_cnt, r = plan1
    unpad, halo, out = _tiled_specs(h, w, r, hd1, wt, wd)
    specs = [unpad["mm"], halo["ml"], halo["mr"], unpad["tm"], halo["tl"],
             halo["tr"], unpad["bm"], halo["bl"], halo["br"]]
    kern = functools.partial(_first_pressure_kernel_tiled, k=k1, hd=hd1,
                             n_strips=h // r, t_cnt=t_cnt, wd=wd, half=half)
    p, d = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((1, h, w), jnp.float32)] * 2,
        grid=(1, h // r, t_cnt),
        in_specs=specs + specs,
        out_specs=[out, out],
        interpret=_interpret(),
    )(*([u3] * 9), *([v3] * 9))

    mid_iters = sum(ks[1:-1])
    if mid_iters:
        p = pressure_solve(d[0], mid_iters, block_rows=block_rows,
                           burst=burst, init=p[0])[None]

    wt, wd, t_cnt, r = planL
    unpad, halo, out = _tiled_specs(h, w, r, hdl, wt, wd)
    specs = [unpad["mm"], halo["ml"], halo["mr"], unpad["tm"], halo["tl"],
             halo["tr"], unpad["bm"], halo["bl"], halo["br"]]
    kern = functools.partial(_last_pressure_kernel_tiled, k=kl, hd=hdl,
                             n_strips=h // r, t_cnt=t_cnt, wd=wd)
    shapes = [jax.ShapeDtypeStruct((1, h, w), jnp.float32)] * 3
    out_specs = [out, out, out]
    if return_stats:
        shapes.append(
            jax.ShapeDtypeStruct((2, h // r, t_cnt), jnp.float32))
        out_specs.append(
            pl.BlockSpec((2, h // r, t_cnt), lambda c, i, t: (0, 0, 0),
                         memory_space=pltpu.SMEM))
    res = pl.pallas_call(
        kern,
        out_shape=shapes,
        grid=(1, h // r, t_cnt),
        in_specs=specs + specs + [unpad["mm"], unpad["mm"]],
        out_specs=out_specs,
        interpret=_interpret(),
    )(*([p] * 9), *([d] * 9), u3, v3)
    if return_stats:
        return res[1][0], res[2][0], res[0][0], _vel_stats_reduce(res[3])
    return res[1][0], res[2][0], res[0][0]


def _fused_tiled_plans(h: int, w: int, ks, block_rows: int):
    """(plan_first, plan_last) for the fused tiled end bursts, or None.
    Requires exact (unpadded) geometry at every burst's halo depth — the
    div/project fusions have no mirror-padding re-fill invariant — and a
    viable tiled plan at the deeper hd = k+1 halos (planes=8: the fused
    kernels hold ~twice the live planes of a plain burst)."""
    if len(ks) < 2:
        return None
    plans = []
    try:
        for k in (ks[0], ks[-1]):
            hd = _halo_depth(k + 1)
            if _pad_geometry(h, w, hd, block_rows)[:2] != (h, w):
                return None
            plan = _col_plan(h, w, hd, block_rows, planes=8)
            if plan is None:
                return None
            plans.append(plan)
        # middle bursts run the plain tiled solver; their geometry must
        # also be exact (no re-mirrored padding between fused ends)
        if sum(ks[1:-1]):
            hd_mid = _halo_depth(ks[1])
            if _pad_geometry(h, w, hd_mid, block_rows)[:2] != (h, w):
                return None
            if _col_plan(h, w, hd_mid, block_rows) is None:
                return None
    except ValueError:
        return None
    return tuple(plans)


def _diffuse_kernel_tiled(alpha_ref, amp_ref, sp_ref, f_mm, f_ml, f_mr,
                          f_tm, f_tl, f_tr, f_bm, f_bl, f_br, out,
                          *, k, hd, n_strips, t_cnt, wd, wt, splat):
    i = pl.program_id(1)
    alpha = alpha_ref[pl.program_id(0), 0]
    inv_beta = 1.0 / (4.0 + alpha)
    fe = _assemble_ext(f_mm, f_ml, f_mr, f_tm, f_tl, f_tr, f_bm, f_bl, f_br,
                       pl.program_id(2), t_cnt, hd)
    fe = _edge_fill(fe, i, n_strips, hd)
    for _ in range(k):
        l, r, b, t = _clamped_neighbors(fe)
        fe = (l + r + b + t + fe * alpha) * inv_beta
    core = fe[hd:-hd, wd:-wd]
    if splat:
        # fused splat tail, tiled edition: global coords from (strip, tile)
        r_rows = core.shape[0]
        amp = amp_ref[pl.program_id(0), 0]
        lx = sp_ref[0, 0]
        ly = sp_ref[1, 0]
        rad = sp_ref[2, 0]
        t_id = pl.program_id(2)
        ys = (jax.lax.broadcasted_iota(jnp.int32, (r_rows, wt), 0)
              + i * r_rows).astype(jnp.float32)
        xs = (jax.lax.broadcasted_iota(jnp.int32, (r_rows, wt), 1)
              + t_id * wt).astype(jnp.float32)
        d2 = (xs - lx) ** 2 + (ys - ly) ** 2
        core = core + amp * jnp.exp(-d2 / rad)
    out[0] = core


def _pressure_burst_tiled(p, d, k: int, hd: int, h: int, w: int, plan):
    """One tiled pressure burst: (1, h, w) p, d -> (1, h, w) p'."""
    wt, wd, t_cnt, r = plan
    unpad, halo, out = _tiled_specs(h, w, r, hd, wt, wd)
    kern = functools.partial(_pressure_kernel_tiled, k=k, hd=hd,
                             n_strips=h // r, t_cnt=t_cnt, wd=wd)
    specs = [unpad["mm"], halo["ml"], halo["mr"], unpad["tm"],
             halo["tl"], halo["tr"], unpad["bm"], halo["bl"],
             halo["br"]]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, h, w), jnp.float32),
        grid=(1, h // r, t_cnt),
        in_specs=specs + specs,
        out_specs=out,
        interpret=_interpret(),
    )(p, p, p, p, p, p, p, p, p,
      d, d, d, d, d, d, d, d, d)


def _diffuse_burst_tiled(f, alpha, amp_arr, sp_arr, k: int, hd: int, plan,
                         splat: bool):
    """One tiled diffusion burst on (C, H, W) fields (optionally with the
    fused gpu-variant splat tail — see _diffuse_kernel)."""
    c, h, w = f.shape
    wt, wd, t_cnt, r = plan
    unpad, halo, out = _tiled_specs(h, w, r, hd, wt, wd)
    kern = functools.partial(_diffuse_kernel_tiled, k=k, hd=hd,
                             n_strips=h // r, t_cnt=t_cnt, wd=wd, wt=wt,
                             splat=splat)
    smem_c = pl.BlockSpec((c, 1), lambda ci, i, t: (0, 0),
                          memory_space=pltpu.SMEM)
    smem_3 = pl.BlockSpec((3, 1), lambda ci, i, t: (0, 0),
                          memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        grid=(c, h // r, t_cnt),
        in_specs=[smem_c, smem_c, smem_3, unpad["mm"], halo["ml"],
                  halo["mr"], unpad["tm"], halo["tl"], halo["tr"],
                  unpad["bm"], halo["bl"], halo["br"]],
        out_specs=out,
        interpret=_interpret(),
    )(alpha, amp_arr, sp_arr, f, f, f, f, f, f, f, f, f)


def _diffuse_kernel(alpha_ref, amp_ref, sp_ref, f_mid, f_lo, f_hi, out,
                    *, k, hd, n_strips, splat):
    i = pl.program_id(1)
    alpha = alpha_ref[pl.program_id(0), 0]  # per-channel coefficient
    inv_beta = 1.0 / (4.0 + alpha)
    fe = jnp.concatenate([f_lo[0], f_mid[0], f_hi[0]], axis=0)
    fe = _edge_fill(fe, i, n_strips, hd)
    for _ in range(k):
        l, r, b, t = _clamped_neighbors(fe)
        fe = (l + r + b + t + fe * alpha) * inv_beta
    core = fe[hd:-hd, :]
    if splat:
        # fused gpu-variant splat tail (ref.splat_tail semantics): one
        # Gaussian add per channel, amplitude from SMEM — saves the separate
        # read-all/write-all splat pass after diffusion
        r_rows, w = core.shape
        amp = amp_ref[pl.program_id(0), 0]
        lx = sp_ref[0, 0]
        ly = sp_ref[1, 0]
        rad = sp_ref[2, 0]
        # Mosaic's iota is integer-only; match ref.coord_grids' f32 values
        ys = (jax.lax.broadcasted_iota(jnp.int32, (r_rows, w), 0)
              + i * r_rows).astype(jnp.float32)
        xs = jax.lax.broadcasted_iota(
            jnp.int32, (r_rows, w), 1).astype(jnp.float32)
        d2 = (xs - lx) ** 2 + (ys - ly) ** 2
        core = core + amp * jnp.exp(-d2 / rad)
    out[0] = core


def _strip_specs(h: int, w: int, r: int, hd: int):
    """BlockSpecs for (strip, low-halo, high-halo) of a (C, H, W) array.

    Halo blocks are (hd, W) slices addressed in hd-row units; physical-edge
    strips clamp the halo index onto valid data (whose contents are then
    replaced by _edge_fill), keeping every index in bounds.
    """
    n_strips = h // r
    hblk = h // hd

    def mid(c, i):
        return (c, i, 0)

    def lo(c, i):
        # rows [i*r - hd, i*r): block index i*(r//hd) - 1, clamped at 0
        return (c, jnp.maximum(i * (r // hd) - 1, 0), 0)

    def hi(c, i):
        # rows [(i+1)*r, (i+1)*r + hd): clamped at the last hd-row block
        return (c, jnp.minimum((i + 1) * (r // hd), hblk - 1), 0)

    vm = pltpu.VMEM
    return (
        pl.BlockSpec((1, r, w), mid, memory_space=vm),
        pl.BlockSpec((1, hd, w), lo, memory_space=vm),
        pl.BlockSpec((1, hd, w), hi, memory_space=vm),
        n_strips,
    )


def _halo_depth(k: int) -> int:
    return max(_SUBLANE, -(-k // _SUBLANE) * _SUBLANE)


def _pick_block_rows(h: int, hd: int, w: int, requested: int,
                     planes: int = 4) -> int:
    """Largest strip height <= requested that divides H, is a multiple of the
    halo depth, and keeps the working set comfortably inside VMEM.
    ``planes`` = number of live f32 strip-sized planes the kernel holds
    (4 for the plain sweep kernels; 8 for the fused div/project kernels)."""
    budget_rows = max(hd, int((6 * 1024 * 1024) / (planes * w * 4)))
    r = min(requested, budget_rows)
    r = max(hd, (r // hd) * hd)
    while r >= hd:
        if h % r == 0 and r % hd == 0:
            return r
        r -= hd
    return 0


def _pad_geometry(h: int, w: int, hd: int, requested: int):
    """(h_pad, w_pad, r): the smallest mirror-padded geometry with a viable
    strip layout.  Odd grids (e.g. the reference's 960x540) are extended with
    >= hd mirrored rows/columns; the even reflection is the exact Neumann
    ghost for the clamped stencil, and the padding is re-mirrored between
    bursts, so sweeps on the padded domain restricted to the physical region
    equal sweeps on the physical domain (same argument as _edge_fill)."""
    w_pad = w if (w % 128 == 0 and w >= 128) else -(-(w + hd) // 128) * 128
    h_try = h
    while True:
        r = _pick_block_rows(h_try, hd, w_pad, requested)
        if r >= hd and (h_try == h or h_try - h >= hd):
            return h_try, w_pad, r
        h_try = -(-(h_try + 1) // hd) * hd  # next multiple of hd
        if h_try > 4 * h + 4 * hd:  # unreachable in practice
            raise ValueError(f"no viable pallas Jacobi geometry for {h}x{w}")


def _mirror_pad(x: jnp.ndarray, h: int, w: int, h_pad: int, w_pad: int):
    if h_pad > h:
        x = jnp.concatenate([x, jnp.flip(x[..., h - (h_pad - h):, :], axis=-2)],
                            axis=-2)
    if w_pad > w:
        x = jnp.concatenate([x, jnp.flip(x[..., :, w - (w_pad - w):], axis=-1)],
                            axis=-1)
    return x


def supported(config: FluidConfig) -> bool:
    # mirror padding must not exceed the field itself: w pads to a multiple
    # of 128 (lanes), h to a multiple of the halo depth
    h, w = config.shape
    return h >= 2 * _SUBLANE and w >= 64


def _burst_schedule(iters: int, burst: int, h: int, w: int, requested: int):
    """Split ``iters`` sweeps into bursts of at most ``burst``, each with a
    viable (possibly mirror-padded) geometry.
    Returns [(k, r, hd, h_pad, w_pad), ...].

    Burst depth stays at the caller's k<=8 even on wide grids: single-burst
    deltas at 8192² read k=16 ~15% cheaper per sweep (scripts/
    burst8192_probe.py), but full-step measurements put burst16
    neutral-to-worse (~+1.8 ms by cross-process attribution; see
    scripts/burst_ab8192.py's docstring for the in-process A/B and its
    trace-cache caveat) — chained bursts already overlap the per-burst IO
    the isolated probe pays.

    SMALL grids can instead run ALL sweeps as ONE deep burst — see
    :func:`deep_burst`, which callers (ops.pallas_kernels) consult to pick
    ``burst``/``requested``; the schedule itself stays caller-driven so
    compositions that pin bit-equality across paths chunk identically."""
    out = []
    left = iters
    while left > 0:
        k = min(burst, left)
        hd = _halo_depth(k)
        h_pad, w_pad, r = _pad_geometry(h, w, hd, requested)
        out.append((k, r, hd, h_pad, w_pad))
        left -= k
    return out


def deep_burst(h: int, w: int, iters: int, block_rows: int, burst: int):
    """(burst', block_rows') that runs ALL ``iters`` sweeps as ONE deep
    burst when that geometry is viable and not materially more compute than
    the k<=burst schedule — iters/burst fewer HBM round trips AND launches
    (small grids: 512² pressure-30 goes 4 launches -> 1; the reference
    workload's 960x540 diffuse-20 goes 3 -> 1).  Returns the inputs
    unchanged when the deep burst loses:

      - the flagship 2048² and wide grids reject on halo overhead (deep
        halos shrink the strip: (r+2*halo(iters))/r blows past the shallow
        schedule's — the measured burst-depth lesson, scripts/
        diffuse_probe.py: burst=20 at 2048² is WORSE);
      - geometries whose deep halo demands mirror padding deeper than the
        field itself (e.g. 48 rows at iters=40 need a 72-row pad, and
        _mirror_pad can reflect at most the field) reject on that.

    Exactness is the standard argument: k <= hd = halo_depth(iters) by
    construction, the mirror pad is >= hd >= k deep, so far-edge clamp
    corruption never re-enters the physical region within one burst."""
    if iters <= burst:
        return burst, block_rows
    hd_d = _halo_depth(iters)
    hd_s = _halo_depth(burst)
    try:
        hp_d, wp_d, r_d = _pad_geometry(h, w, hd_d, 1 << 30)
        hp_s, wp_s, r_s = _pad_geometry(h, w, hd_s, block_rows)
    except ValueError:
        return burst, block_rows
    if hp_d - h > h or wp_d - w > w:
        return burst, block_rows
    # Small grids (≤ the reference's padded 960x540): one sweep is a few µs
    # of VPU time, so the saved launches/HBM trips dominate ANY halo-compute
    # overhead; above that — or whenever the geometry is wide enough for the
    # column-tiled solver, whose deep-halo economics this flat-strip model
    # only bounds from below — only take the deep burst when its extra
    # compute (deep halos shrink strips and may force deeper padding) stays
    # within ~15% of the shallow schedule's.
    if h * w > 576 * 1024 or wp_d >= _COL_TILE_MIN_W:
        deep = ((r_d + 2.0 * hd_d) / r_d) * (hp_d * wp_d) / (hp_s * wp_s)
        shallow = (r_s + 2.0 * hd_s) / r_s
        if deep > 1.15 * shallow:
            return burst, block_rows
    return iters, 1 << 30


@functools.partial(jax.jit, static_argnames=("iters", "block_rows", "burst"))
def pressure_solve(div: jnp.ndarray, iters: int, *, block_rows: int = 256,
                   burst: int = 8, init: jnp.ndarray | None = None):
    """Exact ``iters``-sweep Jacobi pressure solve from p=0
    (ref semantics: cpuFluidSim.cpp:236-258 / GPUFluidSim.cu:445-495).
    ``init`` continues from an existing iterate instead (used by the
    shard_map path to chain bursts across halo exchanges)."""
    h, w = div.shape
    if iters == 0:
        return jnp.zeros_like(div) if init is None else init
    p = (jnp.zeros((1, h, w), jnp.float32) if init is None else init[None])
    d = div[None]
    for k, r, hd, hp, wp in _burst_schedule(iters, burst, h, w, block_rows):
        pi = _mirror_pad(p, h, w, hp, wp)
        di = _mirror_pad(d, h, w, hp, wp)
        plan = _col_plan(hp, wp, hd, block_rows)
        if plan is not None:
            p = _pressure_burst_tiled(pi, di, k, hd, hp, wp, plan)[:, :h, :w]
            continue
        mid, lo, hi, n_strips = _strip_specs(hp, wp, r, hd)
        kern = functools.partial(_pressure_kernel, k=k, hd=hd, n_strips=n_strips)
        p = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, hp, wp), jnp.float32),
            grid=(1, n_strips),
            in_specs=[mid, lo, hi, mid, lo, hi],
            out_specs=pl.BlockSpec((1, r, wp), lambda c, i: (c, i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=_interpret(),
        )(pi, pi, pi, di, di, di)[:, :h, :w]
    return p[0]


# ---------------------------------------------------------------------------
# Damped-Jacobi burst smoother — the multigrid fine-level workhorse
# (ops/multigrid.default_smooth as trapezoid burst kernels).  The scan form
# pays ~5 HBM-bound XLA passes per sweep; a k-sweep burst reads p and rhs
# once and writes p once.  Same exactness machinery as the pressure solver:
# k <= hd halo, mirror Neumann ghosts, strip interior bit-exact global
# damped Jacobi (the damped update is symmetric, so the even-reflection
# invariance argument in the module docstring carries over unchanged).
# ---------------------------------------------------------------------------


def _smooth_kernel(p_mid, p_lo, p_hi, r_mid, r_lo, r_hi, out, *, k, hd,
                   n_strips, omega):
    i = pl.program_id(1)
    pe = jnp.concatenate([p_lo[0], p_mid[0], p_hi[0]], axis=0)
    re = jnp.concatenate([r_lo[0], r_mid[0], r_hi[0]], axis=0)
    pe = _edge_fill(pe, i, n_strips, hd)
    re = _edge_fill(re, i, n_strips, hd)
    for _ in range(k):
        l, r, b, t = _clamped_neighbors(pe)
        pe = pe + omega * ((l + r + b + t + re) * 0.25 - pe)
    out[0] = pe[hd:-hd, :]


def _smooth_kernel_tiled(p_mm, p_ml, p_mr, p_tm, p_tl, p_tr, p_bm, p_bl,
                         p_br, r_mm, r_ml, r_mr, r_tm, r_tl, r_tr, r_bm,
                         r_bl, r_br, out, *, k, hd, n_strips, t_cnt, wd,
                         omega):
    i = pl.program_id(1)
    ti = pl.program_id(2)
    pe = _assemble_ext(p_mm, p_ml, p_mr, p_tm, p_tl, p_tr, p_bm, p_bl, p_br,
                       ti, t_cnt, hd)
    re = _assemble_ext(r_mm, r_ml, r_mr, r_tm, r_tl, r_tr, r_bm, r_bl, r_br,
                       ti, t_cnt, hd)
    pe = _edge_fill(pe, i, n_strips, hd)
    re = _edge_fill(re, i, n_strips, hd)
    for _ in range(k):
        l, r, b, t = _clamped_neighbors(pe)
        pe = pe + omega * ((l + r + b + t + re) * 0.25 - pe)
    out[0] = pe[hd:-hd, wd:-wd]


def _smooth_burst_tiled(p, rhs, k: int, hd: int, h: int, w: int,
                        omega: float, plan):
    wt, wd, t_cnt, r = plan
    unpad, halo, out = _tiled_specs(h, w, r, hd, wt, wd)
    kern = functools.partial(_smooth_kernel_tiled, k=k, hd=hd,
                             n_strips=h // r, t_cnt=t_cnt, wd=wd,
                             omega=omega)
    specs = [unpad["mm"], halo["ml"], halo["mr"], unpad["tm"],
             halo["tl"], halo["tr"], unpad["bm"], halo["bl"],
             halo["br"]]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, h, w), jnp.float32),
        grid=(1, h // r, t_cnt),
        in_specs=specs + specs,
        out_specs=out,
        interpret=_interpret(),
    )(p, p, p, p, p, p, p, p, p,
      rhs, rhs, rhs, rhs, rhs, rhs, rhs, rhs, rhs)


@functools.partial(jax.jit, static_argnames=("sweeps", "omega", "block_rows",
                                             "burst"))
def smooth_damped(p: jnp.ndarray, rhs: jnp.ndarray, sweeps: int,
                  omega: float = 0.8, *, block_rows: int = 256,
                  burst: int = 8) -> jnp.ndarray:
    """``sweeps`` exact damped-Jacobi sweeps
    ``p += omega * ((l + r + b + t + rhs) / 4 - p)`` on the clamped/Neumann
    5-point system — matches ops/multigrid.make_vcycle's default_smooth
    term-for-term (same association), so results agree to f32 edge-row
    association (<= 1 ulp)."""
    h, w = p.shape
    if sweeps == 0:
        return p
    pp = p[None]
    rr = rhs[None]
    for k, r, hd, hp, wp in _burst_schedule(sweeps, burst, h, w, block_rows):
        pi = _mirror_pad(pp, h, w, hp, wp)
        ri = _mirror_pad(rr, h, w, hp, wp)
        plan = _col_plan(hp, wp, hd, block_rows)
        if plan is not None:
            pp = _smooth_burst_tiled(pi, ri, k, hd, hp, wp, omega,
                                     plan)[:, :h, :w]
            continue
        mid, lo, hi, n_strips = _strip_specs(hp, wp, r, hd)
        kern = functools.partial(_smooth_kernel, k=k, hd=hd,
                                 n_strips=n_strips, omega=omega)
        pp = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, hp, wp), jnp.float32),
            grid=(1, n_strips),
            in_specs=[mid, lo, hi, mid, lo, hi],
            out_specs=pl.BlockSpec((1, r, wp), lambda c, i: (c, i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=_interpret(),
        )(pi, pi, pi, ri, ri, ri)[:, :h, :w]
    return pp[0]


# ---------------------------------------------------------------------------
# Fused multigrid fine-level ends (the mg analog of the fused pressure
# chain below): every non-bottom V-cycle level runs
#     pre-smooth -> residual -> restrict ... prolong -> correct -> post-smooth
# and the r4 anatomy probe (scripts/mg_anatomy_probe.py) measured the
# residual/divergence/project passes around the (now cheap) burst smoother
# as the remaining solver-side cost.  These kernels fold them in:
#
#   _smooth_res_kernel        pre-smooth + residual       (p, rhs -> p, res)
#   _smooth_res0_kernel       zero-start variant           (rhs -> p, res)
#                             (coarse levels start from e=0; skips reading p)
#   _first_smooth_res_kernel  divergence + pre-smooth + residual
#                             (u, v -> p, rhs, res; cycle 1's fine level —
#                             the mg twin of _first_pressure_kernel)
#   _last_smooth_project_kernel post-smooth + gradient subtraction
#                             (p, rhs, u, v -> p, u', v'[, vel_stats];
#                             the twin of _last_pressure_kernel)
#
# Restriction/prolongation stay XLA: Mosaic cannot lower strided slices
# (vector.extract_strided_slice sublane/lane stride 2 rejects; gather rule
# shape-mismatches), and the XLA strided adds measured ~0.14 ms at 2048²
# anyway.  Residuals of the evenly-extended Neumann system are themselves
# even, so the mirror _edge_fill ghosts stay exact (module docstring).
# Halo budgets: smooth+res needs hd >= k+1 (res taps +-1 beyond the k-sweep
# trapezoid); div+smooth+res needs hd >= k+2 (div is valid to +-(hd-1)).
# ---------------------------------------------------------------------------


def _damped_sweeps(pe, re, k: int, omega: float, from_zero: bool):
    if from_zero:
        pe = omega * (re * 0.25)  # sweep 1 from p=0: neighbor taps are zero
        k -= 1
    for _ in range(k):
        l, r, b, t = _clamped_neighbors(pe)
        pe = pe + omega * ((l + r + b + t + re) * 0.25 - pe)
    return pe


def _residual_rows(pe, re, hd: int):
    """rhs - A p on the strip rows of extended (p, rhs) planes — the same
    expression order as ops.multigrid's `rhs - apply_a(p)` (bit-equal)."""
    l, r, b, t = _clamped_neighbors(pe)
    res = re - (4.0 * pe - (l + r + b + t))
    return res[hd:-hd, :]


def _smooth_res_kernel(p_mid, p_lo, p_hi, r_mid, r_lo, r_hi, p_out, res_out,
                       *, k, hd, n_strips, omega, from_zero):
    i = pl.program_id(1)
    re = jnp.concatenate([r_lo[0], r_mid[0], r_hi[0]], axis=0)
    re = _edge_fill(re, i, n_strips, hd)
    if from_zero:
        pe = _damped_sweeps(None, re, k, omega, True)
    else:
        pe = jnp.concatenate([p_lo[0], p_mid[0], p_hi[0]], axis=0)
        pe = _edge_fill(pe, i, n_strips, hd)
        pe = _damped_sweeps(pe, re, k, omega, False)
    p_out[0] = pe[hd:-hd, :]
    res_out[0] = _residual_rows(pe, re, hd)


def _smooth_res_kernel_tiled(p_mm, p_ml, p_mr, p_tm, p_tl, p_tr, p_bm, p_bl,
                             p_br, r_mm, r_ml, r_mr, r_tm, r_tl, r_tr, r_bm,
                             r_bl, r_br, p_out, res_out, *, k, hd, n_strips,
                             t_cnt, wd, omega, from_zero):
    """Column-tiled pre-smooth + residual (the wide-grid sibling of
    _smooth_res_kernel): the residual taps one ring past the k-sweep
    trapezoid, so the caller plans at hd >= k+1 — the in-kernel Neumann
    ghosts (_assemble_ext cols, _edge_fill rows) cover exactly that ring.
    ``from_zero`` skips the p assembly (callers pass rhs in the p slots)."""
    i = pl.program_id(1)
    ti = pl.program_id(2)
    re = _assemble_ext(r_mm, r_ml, r_mr, r_tm, r_tl, r_tr, r_bm, r_bl, r_br,
                       ti, t_cnt, hd)
    re = _edge_fill(re, i, n_strips, hd)
    if from_zero:
        pe = _damped_sweeps(None, re, k, omega, True)
    else:
        pe = _assemble_ext(p_mm, p_ml, p_mr, p_tm, p_tl, p_tr, p_bm, p_bl,
                           p_br, ti, t_cnt, hd)
        pe = _edge_fill(pe, i, n_strips, hd)
        pe = _damped_sweeps(pe, re, k, omega, False)
    l, r, b, t = _clamped_neighbors(pe)
    res = re - (4.0 * pe - (l + r + b + t))
    p_out[0] = pe[hd:-hd, wd:-wd]
    res_out[0] = res[hd:-hd, wd:-wd]


def _smooth_res_tiled_plan(h: int, w: int, sweeps: int, block_rows: int):
    """(h_pad, w_pad, hd, plan) when the column-tiled fused smooth+residual
    applies (wide grids where mg_ends_fusable says no), else None.  Planned
    at hd = halo(sweeps+1): the residual taps one ring past the trapezoid.
    planes=8 matches the flat smooth_res VMEM budget (2 in + 2 out)."""
    hd = _halo_depth(sweeps + 1)
    try:
        hp, wp, _ = _pad_geometry(h, w, hd, block_rows)
    except ValueError:
        return None
    plan = _col_plan(hp, wp, hd, block_rows, planes=8)
    if plan is None:
        return None
    return hp, wp, hd, plan


def smooth_res_tiled_ok(h: int, w: int, sweeps: int,
                        block_rows: int = 256) -> bool:
    """True when :func:`smooth_res` has a column-tiled fused path for this
    geometry (the wide-grid complement of :func:`mg_ends_fusable`)."""
    return _smooth_res_tiled_plan(h, w, sweeps, block_rows) is not None


def _smooth_res_burst_tiled(p, rhs, k: int, hd: int, h: int, w: int,
                            omega: float, from_zero: bool, plan):
    """One tiled fused smooth+residual burst on (1, h, w) planes."""
    wt, wd, t_cnt, r = plan
    unpad, halo, out = _tiled_specs(h, w, r, hd, wt, wd)
    kern = functools.partial(_smooth_res_kernel_tiled, k=k, hd=hd,
                             n_strips=h // r, t_cnt=t_cnt, wd=wd,
                             omega=omega, from_zero=from_zero)
    specs = [unpad["mm"], halo["ml"], halo["mr"], unpad["tm"],
             halo["tl"], halo["tr"], unpad["bm"], halo["bl"],
             halo["br"]]
    return pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((1, h, w), jnp.float32)] * 2,
        grid=(1, h // r, t_cnt),
        in_specs=specs + specs,
        out_specs=[out, out],
        interpret=_interpret(),
    )(p, p, p, p, p, p, p, p, p,
      rhs, rhs, rhs, rhs, rhs, rhs, rhs, rhs, rhs)


def _first_smooth_res_kernel(u_mid, u_lo, u_hi, v_mid, v_lo, v_hi,
                             p_out, rhs_out, res_out, *, k, hd, n_strips,
                             omega, half):
    i = pl.program_id(1)
    ue = jnp.concatenate([u_lo[0], u_mid[0], u_hi[0]], axis=0)
    ve = jnp.concatenate([v_lo[0], v_mid[0], v_hi[0]], axis=0)
    ue = _edge_fill(ue, i, n_strips, hd)
    ve = _edge_fill(ve, i, n_strips, hd)
    de = _divergence_ext(ue, ve, half)
    de = _edge_fill(de, i, n_strips, hd)
    re = -de  # the mg system is A p = -div (ops.multigrid rhs convention)
    pe = _damped_sweeps(None, re, k, omega, True)
    p_out[0] = pe[hd:-hd, :]
    rhs_out[0] = re[hd:-hd, :]
    res_out[0] = _residual_rows(pe, re, hd)


def _last_smooth_project_kernel(p_mid, p_lo, p_hi, r_mid, r_lo, r_hi,
                                u_mid, v_mid, p_out, u_out, v_out,
                                *maybe_st, k, hd, n_strips, omega):
    i = pl.program_id(1)
    pe = jnp.concatenate([p_lo[0], p_mid[0], p_hi[0]], axis=0)
    re = jnp.concatenate([r_lo[0], r_mid[0], r_hi[0]], axis=0)
    pe = _edge_fill(pe, i, n_strips, hd)
    re = _edge_fill(re, i, n_strips, hd)
    pe = _damped_sweeps(pe, re, k, omega, False)
    ps, u2, v2 = _project_rows(pe, u_mid[0], v_mid[0], hd)
    p_out[0] = ps
    u_out[0] = u2
    v_out[0] = v2
    if maybe_st:
        _emit_vel_stats(maybe_st[0], u2, v2, i)


def mg_ends_fusable(h: int, w: int, nu: int, block_rows: int = 256) -> bool:
    """True when the fused mg end kernels support this level geometry as-is
    (single nu-sweep burst, no mirror padding, viable 8-plane strips at the
    deepest halo any of them needs: hd(k+2)).  Wide grids where the
    column-tiled plan engages say no — these kernels are flat-strip only,
    and at w=8192 flat fused end bursts (r=16) measured worse than the
    tiled solver with cheap passes around it (BASELINE.md r3); the mg
    driver then runs tiled smooth_damped + XLA residual instead."""
    if nu <= 0 or w % 128 != 0 or w < 128 or h < 2 * _SUBLANE:
        return False
    hd = _halo_depth(nu + 2)
    if _col_plan(h, w, hd, block_rows) is not None:
        return False
    return h % hd == 0 and _pick_block_rows(h, hd, w, block_rows,
                                            planes=8) > 0


@functools.partial(jax.jit, static_argnames=("sweeps", "omega", "block_rows",
                                             "from_zero"))
def smooth_res(p, rhs: jnp.ndarray, sweeps: int, omega: float = 0.8, *,
               block_rows: int = 256, from_zero: bool = False):
    """``sweeps`` damped-Jacobi sweeps + the residual, one launch:
    returns (p', rhs - A p').  ``from_zero`` starts from p=0 and ignores
    ``p`` (pass rhs; coarse mg levels — skips the p read entirely).
    Caller must check :func:`mg_ends_fusable` OR :func:`smooth_res_tiled_ok`
    (wide grids run the column-tiled twin; same arithmetic, in-kernel
    Neumann ghosts, residuals of the even extension are even so the
    mirror-pad slice-off stays exact)."""
    h, w = rhs.shape
    tiled = _smooth_res_tiled_plan(h, w, sweeps, block_rows)
    if tiled is not None:
        hp, wp, hdt, plan = tiled
        rr = _mirror_pad(rhs[None], h, w, hp, wp)
        pp = rr if from_zero else _mirror_pad(p[None], h, w, hp, wp)
        p2, res = _smooth_res_burst_tiled(pp, rr, sweeps, hdt, hp, wp,
                                          omega, from_zero, plan)
        return p2[0, :h, :w], res[0, :h, :w]
    hd = _halo_depth(sweeps + 1)
    r = _pick_block_rows(h, hd, w, block_rows, planes=8)
    mid, lo, hi, n_strips = _strip_specs(h, w, r, hd)
    out = pl.BlockSpec((1, r, w), lambda c, i: (c, i, 0),
                       memory_space=pltpu.VMEM)
    kern = functools.partial(_smooth_res_kernel, k=sweeps, hd=hd,
                             n_strips=n_strips, omega=omega,
                             from_zero=from_zero)
    rr = rhs[None]
    pp = rr if from_zero else p[None]  # zero-start kernels never read it
    p2, res = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((1, h, w), jnp.float32)] * 2,
        grid=(1, n_strips),
        in_specs=[mid, lo, hi, mid, lo, hi],
        out_specs=[out, out],
        interpret=_interpret(),
    )(pp, pp, pp, rr, rr, rr)
    return p2[0], res[0]


@functools.partial(jax.jit, static_argnames=("sweeps", "omega", "half",
                                             "block_rows"))
def first_smooth_res(u, v, sweeps: int, half: bool, omega: float = 0.8, *,
                     block_rows: int = 256):
    """Divergence + ``sweeps`` damped sweeps from p=0 + residual, one
    launch: returns (p, rhs, res) with rhs = -divergence(u, v, half) — the
    mg twin of the fused first pressure burst.  Caller must check
    :func:`mg_ends_fusable`."""
    h, w = u.shape
    hd = _halo_depth(sweeps + 2)
    r = _pick_block_rows(h, hd, w, block_rows, planes=8)
    mid, lo, hi, n_strips = _strip_specs(h, w, r, hd)
    out = pl.BlockSpec((1, r, w), lambda c, i: (c, i, 0),
                       memory_space=pltpu.VMEM)
    kern = functools.partial(_first_smooth_res_kernel, k=sweeps, hd=hd,
                             n_strips=n_strips, omega=omega, half=half)
    uu, vv = u[None], v[None]
    p2, rr, res = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((1, h, w), jnp.float32)] * 3,
        grid=(1, n_strips),
        in_specs=[mid, lo, hi, mid, lo, hi],
        out_specs=[out, out, out],
        interpret=_interpret(),
    )(uu, uu, uu, vv, vv, vv)
    return p2[0], rr[0], res[0]


@functools.partial(jax.jit, static_argnames=("sweeps", "omega", "block_rows",
                                             "return_stats"))
def last_smooth_project(p, rhs, u, v, sweeps: int, omega: float = 0.8, *,
                        block_rows: int = 256, return_stats: bool = False):
    """``sweeps`` damped sweeps + pressure-gradient subtraction, one
    launch: returns (u', v', p'[, vel_stats]) — the mg twin of the fused
    last pressure burst.  Caller must check :func:`mg_ends_fusable`."""
    h, w = u.shape
    hd = _halo_depth(sweeps + 1)
    r = _pick_block_rows(h, hd, w, block_rows, planes=8)
    mid, lo, hi, n_strips = _strip_specs(h, w, r, hd)
    out = pl.BlockSpec((1, r, w), lambda c, i: (c, i, 0),
                       memory_space=pltpu.VMEM)
    kern = functools.partial(_last_smooth_project_kernel, k=sweeps, hd=hd,
                             n_strips=n_strips, omega=omega)
    shapes = [jax.ShapeDtypeStruct((1, h, w), jnp.float32)] * 3
    out_specs = [out, out, out]
    if return_stats:
        st_shape, st_spec = _vel_stats_spec(n_strips)
        shapes.append(st_shape)
        out_specs.append(st_spec)
    pp, rr, uu, vv = p[None], rhs[None], u[None], v[None]
    res = pl.pallas_call(
        kern,
        out_shape=shapes,
        grid=(1, n_strips),
        in_specs=[mid, lo, hi, mid, lo, hi, mid, mid],
        out_specs=out_specs,
        interpret=_interpret(),
    )(pp, pp, pp, rr, rr, rr, uu, vv)
    if return_stats:
        return res[1][0], res[2][0], res[0][0], _vel_stats_reduce(res[3])
    return res[1][0], res[2][0], res[0][0]


# ---------------------------------------------------------------------------
# Fused divergence -> Jacobi -> project (saves the separate XLA divergence and
# project passes: the first burst computes divergence from velocity strips in
# VMEM, the last burst applies the pressure-gradient subtraction before
# writing back.  Reference launches all three separately,
# GPUFluidSim.cu:676-685.)
# ---------------------------------------------------------------------------


def _divergence_ext(ue, ve, half: bool):
    """Central-difference divergence of mirror/real-halo extended velocity
    strips (clamped x edges, ref: GPUFluidSim.cu:297-310)."""
    ul, ur, _, _ = _clamped_neighbors(ue)
    _, _, vb, vt = _clamped_neighbors(ve)
    de = (ur - ul) + (vt - vb)
    return de * 0.5 if half else de


def _first_pressure_kernel(u_mid, u_lo, u_hi, v_mid, v_lo, v_hi, p_out, d_out,
                           *, k, hd, n_strips, half):
    """Burst 1 fused with divergence: read velocity (+halos), build div in
    VMEM, run k sweeps from p=0, emit p AND div (for the later bursts).

    Validity: div is exact on ext rows [1-hd, r+hd-1); mirror-filling u,v
    first makes the row adjacent to a physical edge see the clamped
    (edge-replicated) neighbor exactly, then the div halo itself is
    mirror-filled (the Neumann ghost needs d(-1-j)=d(j), NOT the odd-mirrored
    true divergence).  k sweeps from p=0 touch d only within k-1 rows, so
    k <= hd-1 keeps the emitted interior bit-exact global Jacobi."""
    i = pl.program_id(1)
    ue = jnp.concatenate([u_lo[0], u_mid[0], u_hi[0]], axis=0)
    ve = jnp.concatenate([v_lo[0], v_mid[0], v_hi[0]], axis=0)
    ue = _edge_fill(ue, i, n_strips, hd)
    ve = _edge_fill(ve, i, n_strips, hd)
    de = _divergence_ext(ue, ve, half)
    de = _edge_fill(de, i, n_strips, hd)
    pe = de * -0.25  # sweep 1 from p=0: all neighbor taps are zero
    for _ in range(k - 1):
        l, r, b, t = _clamped_neighbors(pe)
        pe = (l + r + b + t - de) * 0.25
    p_out[0] = pe[hd:-hd, :]
    d_out[0] = de[hd:-hd, :]


def _emit_vel_stats(st, u2, v2, *idx):
    """[max|u2|, max|v2|] of this program's output blocks -> slots (*, idx)
    of the WHOLE-ARRAY SMEM stats ref (the ops.ref.vel_max contract; Mosaic
    requires SMEM output blocks to equal the array shape, so the buffer is
    shared across the sequential grid with a constant index map and each
    program writes its own column).  The blocks are already resident in
    VMEM, so this costs one VPU reduction pass and two scalar stores — no
    HBM traffic; the caller max-reduces the tiny per-program array.
    Consumers use it as the advection fast-path predicate and for always-on
    clamp observability."""
    st[(0,) + idx] = jnp.max(jnp.abs(u2))
    st[(1,) + idx] = jnp.max(jnp.abs(v2))


def _project_rows(pe, u_mid, v_mid, hd: int):
    """u -= 0.5*(pR-pL), v -= 0.5*(pT-pB) on the strip rows of an extended
    pressure plane (ref: GPUFluidSim.cu:498-516; y-clamp at physical edges is
    supplied by the mirror halo, pe[hd-1] == pe[hd])."""
    ps = pe[hd:-hd, :]
    pl_, pr_, _, _ = _clamped_neighbors(ps)
    r = ps.shape[0]
    u2 = u_mid - 0.5 * (pr_ - pl_)
    v2 = v_mid - 0.5 * (pe[hd + 1 : hd + 1 + r, :] - pe[hd - 1 : hd - 1 + r, :])
    return ps, u2, v2


def _last_pressure_kernel(p_mid, p_lo, p_hi, d_mid, d_lo, d_hi, u_mid, v_mid,
                          p_out, u_out, v_out, *maybe_st, k, hd, n_strips):
    """Final burst fused with projection: k sweeps, then subtract the
    pressure gradient from the (strip-rows-only) velocity.  Project reads p
    at +/-1 row, so k <= hd-1 keeps it exact."""
    i = pl.program_id(1)
    pe = jnp.concatenate([p_lo[0], p_mid[0], p_hi[0]], axis=0)
    de = jnp.concatenate([d_lo[0], d_mid[0], d_hi[0]], axis=0)
    pe = _edge_fill(pe, i, n_strips, hd)
    de = _edge_fill(de, i, n_strips, hd)
    for _ in range(k):
        l, r, b, t = _clamped_neighbors(pe)
        pe = (l + r + b + t - de) * 0.25
    ps, u2, v2 = _project_rows(pe, u_mid[0], v_mid[0], hd)
    p_out[0] = ps
    u_out[0] = u2
    v_out[0] = v2
    if maybe_st:
        _emit_vel_stats(maybe_st[0], u2, v2, i)


def _single_pressure_kernel(u_mid, u_lo, u_hi, v_mid, v_lo, v_hi,
                            p_out, u_out, v_out, *maybe_st,
                            k, hd, n_strips, half):
    """iters <= burst: divergence + all sweeps + project in ONE kernel."""
    i = pl.program_id(1)
    ue = jnp.concatenate([u_lo[0], u_mid[0], u_hi[0]], axis=0)
    ve = jnp.concatenate([v_lo[0], v_mid[0], v_hi[0]], axis=0)
    ue = _edge_fill(ue, i, n_strips, hd)
    ve = _edge_fill(ve, i, n_strips, hd)
    de = _divergence_ext(ue, ve, half)
    de = _edge_fill(de, i, n_strips, hd)
    pe = de * -0.25
    for _ in range(k - 1):
        l, r, b, t = _clamped_neighbors(pe)
        pe = (l + r + b + t - de) * 0.25
    ps, u2, v2 = _project_rows(pe, ue[hd:-hd, :], ve[hd:-hd, :], hd)
    p_out[0] = ps
    u_out[0] = u2
    v_out[0] = v2
    if maybe_st:
        _emit_vel_stats(maybe_st[0], u2, v2, i)


def _fused_geometry(h: int, w: int, k: int, requested: int):
    """(r, hd) for a fused burst, or (0, hd) if not viable.  Fused kernels
    need hd >= k+1 (div validity / project taps) and ~8 live planes."""
    hd = _halo_depth(k + 1)
    return _pick_block_rows(h, hd, w, requested, planes=8), hd


def fusable(h: int, w: int, iters: int, block_rows: int = 256,
            burst: int = 8) -> bool:
    """True when pressure_project's fused kernels support this geometry
    as-is (no mirror padding: the div/project fusions have no padding
    re-mirror invariant).  Checks EVERY burst's geometry — the last burst's
    halo depth (_halo_depth(k_last+1)) can differ from both the first
    burst's and the middle bursts', and an unviable one would divide by a
    zero strip height at trace time."""
    if iters <= 0 or w % 128 != 0 or w < 128 or h < 2 * _SUBLANE:
        return False
    k_first = min(burst, iters)
    k_last = (iters % burst) or k_first
    for k in {k_first, k_last}:
        if _fused_geometry(h, w, k, block_rows)[0] == 0:
            return False
    if iters > burst:  # middle bursts must also fit unpadded
        if _pick_block_rows(h, _halo_depth(burst), w, block_rows) == 0:
            return False
    return True


@functools.partial(jax.jit, static_argnames=("iters", "half", "block_rows",
                                             "burst", "return_stats"))
def pressure_project(u: jnp.ndarray, v: jnp.ndarray, iters: int, half: bool,
                     *, block_rows: int = 256, burst: int = 8,
                     return_stats: bool = False):
    """Fused divergence -> ``iters``-sweep Jacobi from p=0 -> gradient
    subtraction.  Returns (u', v', p); bit-identical to the unfused
    divergence/pressure_solve/project composition (ref semantics:
    cpuFluidSim.cpp:236-258,374-377 / GPUFluidSim.cu:676-685).
    Caller must check :func:`fusable` first.

    ``return_stats``: additionally return ops.ref.vel_max of the projected
    velocity, emitted from the final kernel's VMEM-resident blocks — the
    free producer side of the advection fast-path predicate."""
    h, w = u.shape
    if iters == 0:
        p0 = jnp.zeros_like(u)
        if return_stats:
            return u, v, p0, jnp.stack([jnp.max(jnp.abs(u)),
                                        jnp.max(jnp.abs(v))])
        return u, v, p0

    # Wide grids run the bursts through the column-tiled solver.  When the
    # geometry is exact, divergence folds into the first TILED burst and
    # projection into the last (_pressure_project_tiled — also erases the
    # zeros-p array the plain first burst reads); otherwise fall back to
    # two cheap single-pass kernels around the tiled solver (still better
    # than the flat r=16 fused end bursts at w=8192 — BASELINE.md r3).
    if _col_plan(h, w, _halo_depth(min(burst, iters)),
                 block_rows) is not None:
        ks = []
        left = iters
        while left > 0:
            ks.append(min(burst, left))
            left -= ks[-1]
        if _fused_tiled_plans(h, w, ks, block_rows) is not None:
            return _pressure_project_tiled(u[None], v[None], ks, h, w,
                                           half, block_rows, burst,
                                           return_stats)
        if divergence_supported(h, w):
            d = divergence(u, v, half, block_rows=block_rows)
            p = pressure_solve(d, iters, block_rows=block_rows, burst=burst)
            if return_stats:
                u2, v2, st = project(u, v, p, block_rows=block_rows,
                                     return_stats=True)
                return u2, v2, p, st
            u2, v2 = project(u, v, p, block_rows=block_rows)
            return u2, v2, p

    u3, v3 = u[None], v[None]

    ks = []
    left = iters
    while left > 0:
        ks.append(min(burst, left))
        left -= ks[-1]

    vm = pltpu.VMEM

    def specs(r, hd):
        mid, lo, hi, n_strips = _strip_specs(h, w, r, hd)
        out = pl.BlockSpec((1, r, w), lambda c, i: (c, i, 0), memory_space=vm)
        return mid, lo, hi, out, n_strips

    for k in {ks[0], ks[-1]}:
        if _fused_geometry(h, w, k, block_rows)[0] == 0:
            raise ValueError(
                f"pressure_project: no viable fused geometry for "
                f"{h}x{w} burst k={k} (check fusable() first)")

    def outs(out, n_strips):
        shapes = [jax.ShapeDtypeStruct((1, h, w), jnp.float32)] * 3
        specs_ = [out, out, out]
        if return_stats:
            st_shape, st_spec = _vel_stats_spec(n_strips)
            shapes.append(st_shape)
            specs_.append(st_spec)
        return shapes, specs_

    def unpack(res):
        # res = (p, u2, v2[, st])
        if return_stats:
            return (res[1][0], res[2][0], res[0][0],
                    _vel_stats_reduce(res[3]))
        return res[1][0], res[2][0], res[0][0]

    if len(ks) == 1:
        k = ks[0]
        r, hd = _fused_geometry(h, w, k, block_rows)
        mid, lo, hi, out, n_strips = specs(r, hd)
        kern = functools.partial(_single_pressure_kernel, k=k, hd=hd,
                                 n_strips=n_strips, half=half)
        shapes, out_specs = outs(out, n_strips)
        res = pl.pallas_call(
            kern,
            out_shape=shapes,
            grid=(1, n_strips),
            in_specs=[mid, lo, hi, mid, lo, hi],
            out_specs=out_specs,
            interpret=_interpret(),
        )(u3, u3, u3, v3, v3, v3)
        return unpack(res)

    # burst 1: divergence fused
    k = ks[0]
    r, hd = _fused_geometry(h, w, k, block_rows)
    mid, lo, hi, out, n_strips = specs(r, hd)
    kern = functools.partial(_first_pressure_kernel, k=k, hd=hd,
                             n_strips=n_strips, half=half)
    p, d = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((1, h, w), jnp.float32)] * 2,
        grid=(1, n_strips),
        in_specs=[mid, lo, hi, mid, lo, hi],
        out_specs=[out, out],
        interpret=_interpret(),
    )(u3, u3, u3, v3, v3, v3)

    # middle bursts: plain sweeps continuing from p
    mid_iters = sum(ks[1:-1])
    if mid_iters:
        p = pressure_solve(d[0], mid_iters, block_rows=block_rows,
                           burst=burst, init=p[0])[None]

    # final burst: projection fused
    k = ks[-1]
    r, hd = _fused_geometry(h, w, k, block_rows)
    mid, lo, hi, out, n_strips = specs(r, hd)
    kern = functools.partial(_last_pressure_kernel, k=k, hd=hd,
                             n_strips=n_strips)
    shapes, out_specs = outs(out, n_strips)
    res = pl.pallas_call(
        kern,
        out_shape=shapes,
        grid=(1, n_strips),
        in_specs=[mid, lo, hi, mid, lo, hi, mid, mid],
        out_specs=out_specs,
        interpret=_interpret(),
    )(p, p, p, d, d, d, u3, v3)
    return unpack(res)


# ---------------------------------------------------------------------------
# Fused vorticity confinement: curl + confinement force in ONE kernel pass.
# The reference launches vorticity as two kernels with a full curl field in
# HBM between them (GPUFluidSim.cu:536-573); the pure-jnp composition XLA
# produces measured 15.8 ms at 8192² (many materialized intermediates) vs a
# ~1.9 ms HBM bound for read-u,v/write-u,v.  The kernel computes the curl on
# the VMEM-resident strip ext and applies the confinement force to the core.
# ---------------------------------------------------------------------------


def _edge_rows(mid, lo_blk, hi_blk, first, last, depth: int):
    """``depth`` valid halo rows below/above a strip, edge-replicated at the
    physical boundaries.  The selects run on (depth, W) slices — the whole
    point of the slim one-shot kernels is that NO full-ext concat/where ever
    materializes (the old _replicate_fill path cost ~6 ext-wide VPU passes
    per field; vorticity measured 7.6 ms at 8192² against a ~2 ms DMA
    bound)."""
    w = mid.shape[-1]
    lo = jnp.where(first, jnp.broadcast_to(mid[:1], (depth, w)),
                   lo_blk[-depth:])
    hi = jnp.where(last, jnp.broadcast_to(mid[-1:], (depth, w)),
                   hi_blk[:depth])
    return lo, hi


def _vorticity_kernel(sc_ref, u_mid, u_lo, u_hi, v_mid, v_lo, v_hi,
                      u_out, v_out, *, n_strips, r, variant):
    i = pl.program_id(1)
    dt = sc_ref[0, 0]
    vorticity = sc_ref[1, 0]
    first = i == 0
    last = i == n_strips - 1
    um, vm = u_mid[0], v_mid[0]
    # 2 valid halo rows per side: 1 for the curl's u taps beyond the 1 curl
    # row the confinement taps read
    ulo, uhi = _edge_rows(um, u_lo[0], u_hi[0], first, last, 2)
    vlo, vhi = _edge_rows(vm, v_lo[0], v_hi[0], first, last, 2)
    ue = jnp.concatenate([ulo, um, uhi], axis=0)  # (r+4, w)
    ve = jnp.concatenate([vlo, vm, vhi], axis=0)
    u_out[0], v_out[0] = _confine(ue, ve, um, vm, first, last, r, dt,
                                 vorticity, variant)


def _curl_taps(ue, ve, first, last, r: int):
    """TRUE-curl strip + its clamp-ghost taps from (r+4, W) velocity exts
    whose 2 halo rows per side are real rows or edge-replicate ghosts
    (x is fully resident: clamped lane shifts supply the x taps).

    Curl on the ext rows (ref.curl: 0.5*(vR - vL - uT + uB), clamped x);
    ext rows 1..r+2 are TRUE curl rows (their u/v taps are real or exact
    clamp ghosts); core = rows 2..r+1.  The curl ghost at a physical edge
    is the clamp row of the TRUE curl (ref applies `neighbors` to the
    computed w field), not the curl of ghost velocity: we[1] at the first
    strip holds 0.5*(vR-vL) of the replicated row, so patch the single
    tap row with the edge's true curl we[2] (and mirror for the top)."""
    vl = jnp.concatenate([ve[:, :1], ve[:, :-1]], axis=1)
    vr = jnp.concatenate([ve[:, 1:], ve[:, -1:]], axis=1)
    ub = jnp.concatenate([ue[:1], ue[:-1]], axis=0)
    ut = jnp.concatenate([ue[1:], ue[-1:]], axis=0)
    we = 0.5 * (vr - vl - ut + ub)
    w = we[2 : 2 + r, :]
    wb_h = jnp.where(first, we[2:3], we[1:2])
    wt_h = jnp.where(last, we[r + 1 : r + 2], we[r + 2 : r + 3])
    wb = jnp.concatenate([wb_h, w[:-1]], axis=0)
    wt = jnp.concatenate([w[1:], wt_h], axis=0)
    wl = jnp.concatenate([w[:, :1], w[:, :-1]], axis=1)
    wr = jnp.concatenate([w[:, 1:], w[:, -1:]], axis=1)
    return w, wb, wt, wl, wr


def _confinement(w, wb, wt, wl, wr, um, vm, dt, vorticity, variant: str):
    """Confinement force from the curl strip + its 4 taps."""
    if variant == "gpu":
        # GPUFluidSim.cu:536-573 (clean sequential semantics of the racy
        # kernel, matching ops.ref.vorticity_confinement_gpu)
        fx = 0.5 * (jnp.abs(wt) - jnp.abs(wb))
        fy = 0.5 * (jnp.abs(wl) - jnp.abs(wr))
        ln = jnp.sqrt(fx * fx + fy * fy) + 1e-3
        s = w * vorticity / ln
        return um + fx * s * dt, vm + fy * s * dt
    # cpuFluidSim.cpp:271-296: gradient of |curl|, negated (clamp then
    # abs == abs then clamp, so |wl|,|wr| are the x-clamped |w| taps)
    fx = 0.5 * (jnp.abs(wt) - jnp.abs(wb))
    fy = 0.5 * (jnp.abs(wr) - jnp.abs(wl))
    ln = jnp.sqrt(fx * fx + fy * fy) + 1e-4
    s = w * vorticity / ln
    return um - fx * s * dt, vm - fy * s * dt


def _confine(ue, ve, um, vm, first, last, r: int, dt, vorticity,
            variant: str):
    """_curl_taps + _confinement on flat (full-width) strips.  (A fused
    dye-advect+confinement kernel also consumed these once — measured and
    rejected, see docs/ROADMAP.md; the split stays because it keeps the
    ghost-row construction separately testable from the force math.)"""
    w, wb, wt, wl, wr = _curl_taps(ue, ve, first, last, r)
    return _confinement(w, wb, wt, wl, wr, um, vm, dt, vorticity, variant)


def vorticity_supported(h: int, w: int) -> bool:
    """Exact geometries only: the clamp ghosts of this one-shot stencil are
    supplied by _edge_rows at the ARRAY edges, so any row/col padding
    would shift them off the physical boundary (mirror rows are the ghost
    that is exact under Jacobi ITERATION, not the literal clamp row a
    single curl/confinement application reads).  Padded odd grids keep the
    jnp op — they are the small-grid cases where the XLA stage is cheap."""
    if h < 2 * _SUBLANE or w < 128 or w % 128 != 0:
        return False
    r = _pick_block_rows(h, _SUBLANE, w, 256, planes=6)
    return r >= _SUBLANE and h % r == 0


@functools.partial(jax.jit, static_argnames=("variant", "block_rows"))
def vorticity_confinement(u: jnp.ndarray, v: jnp.ndarray, dt, vorticity,
                          variant: str = "gpu", *, block_rows: int = 256):
    """Fused curl + confinement (one HBM round trip of u, v).  Matches
    ops.ref.vorticity_confinement_{gpu,cpu} to f32 rounding.  Caller must
    check :func:`vorticity_supported`."""
    h, w = u.shape
    hd = _SUBLANE  # one valid halo row for w, one more for its taps
    r = _pick_block_rows(h, hd, w, block_rows, planes=6)
    n_strips = h // r
    sc = jnp.stack([jnp.asarray(dt, jnp.float32),
                    jnp.asarray(vorticity, jnp.float32)]).reshape(2, 1)
    mid, lo, hi, _ = _strip_specs(h, w, r, hd)
    out = pl.BlockSpec((1, r, w), lambda c, i: (c, i, 0),
                       memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((2, 1), lambda c, i: (0, 0),
                        memory_space=pltpu.SMEM)
    kern = functools.partial(_vorticity_kernel, n_strips=n_strips,
                             r=r, variant=variant)
    u3, v3 = u[None], v[None]
    u2, v2 = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((1, h, w), jnp.float32)] * 2,
        grid=(1, n_strips),
        in_specs=[smem, mid, lo, hi, mid, lo, hi],
        out_specs=[out, out],
        interpret=_interpret(),
    )(sc, u3, u3, u3, v3, v3, v3)
    return u2[0], v2[0]


# ---------------------------------------------------------------------------
# Single-pass stencil kernels: divergence and projection.  Same pattern as
# the vorticity kernel (strip + 1-valid-halo-row, replicate-fill clamp
# ghosts, exact geometries only).  They serve two masters: the multigrid
# pressure path (which composes divergence -> V-cycles -> project) and the
# wide-grid Jacobi path, where running ALL bursts through the tiled solver
# plus these two cheap passes beats the flat r=16 fused end bursts.
# ---------------------------------------------------------------------------


def _divergence_kernel(u_mid, v_mid, v_lo, v_hi, out, *, n_strips, half):
    # u only needs x taps (lane shifts of the resident strip); v needs one
    # valid halo ROW per side — see _edge_rows for why no full ext is built
    i = pl.program_id(1)
    um, vm = u_mid[0], v_mid[0]
    vlo, vhi = _edge_rows(vm, v_lo[0], v_hi[0], i == 0, i == n_strips - 1, 1)
    ul = jnp.concatenate([um[:, :1], um[:, :-1]], axis=1)
    ur = jnp.concatenate([um[:, 1:], um[:, -1:]], axis=1)
    vb = jnp.concatenate([vlo, vm[:-1]], axis=0)
    vt = jnp.concatenate([vm[1:], vhi], axis=0)
    core = (ur - ul) + (vt - vb)
    out[0] = core * 0.5 if half else core


def _project_kernel(p_mid, p_lo, p_hi, u_mid, v_mid, u_out, v_out,
                    *maybe_st, n_strips):
    i = pl.program_id(1)
    pm = p_mid[0]
    plo, phi = _edge_rows(pm, p_lo[0], p_hi[0], i == 0, i == n_strips - 1, 1)
    pl_ = jnp.concatenate([pm[:, :1], pm[:, :-1]], axis=1)
    pr_ = jnp.concatenate([pm[:, 1:], pm[:, -1:]], axis=1)
    pb = jnp.concatenate([plo, pm[:-1]], axis=0)
    pt = jnp.concatenate([pm[1:], phi], axis=0)
    u2 = u_mid[0] - 0.5 * (pr_ - pl_)
    v2 = v_mid[0] - 0.5 * (pt - pb)
    u_out[0] = u2
    v_out[0] = v2
    if maybe_st:
        _emit_vel_stats(maybe_st[0], u2, v2, i)


def _stencil_supported(h: int, w: int, planes: int) -> bool:
    if h < 2 * _SUBLANE or w < 128 or w % 128 != 0:
        return False
    r = _pick_block_rows(h, _SUBLANE, w, 256, planes=planes)
    return r >= _SUBLANE and h % r == 0


def divergence_supported(h: int, w: int) -> bool:
    return _stencil_supported(h, w, planes=5)


@functools.partial(jax.jit, static_argnames=("half", "block_rows"))
def divergence(u: jnp.ndarray, v: jnp.ndarray, half: bool, *,
               block_rows: int = 256):
    """Central-difference divergence (ref.divergence semantics, clamped
    edges; GPUFluidSim.cu:297-310).  Caller checks divergence_supported."""
    h, w = u.shape
    hd = _SUBLANE
    r = _pick_block_rows(h, hd, w, block_rows, planes=5)
    mid, lo, hi, n_strips = _strip_specs(h, w, r, hd)
    out = pl.BlockSpec((1, r, w), lambda c, i: (c, i, 0),
                       memory_space=pltpu.VMEM)
    kern = functools.partial(_divergence_kernel, n_strips=n_strips,
                             half=half)
    u3, v3 = u[None], v[None]
    d = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, h, w), jnp.float32),
        grid=(1, n_strips),
        in_specs=[mid, mid, lo, hi],
        out_specs=out,
        interpret=_interpret(),
    )(u3, v3, v3, v3)
    return d[0]


def _vel_stats_spec(n_strips: int):
    """(out_shape, out_spec) for a per-strip velocity-stats SMEM output of a
    grid-(1, n_strips) kernel; reduce with _vel_stats_reduce."""
    return (jax.ShapeDtypeStruct((2, n_strips), jnp.float32),
            pl.BlockSpec((2, n_strips), lambda c, i: (0, 0),
                         memory_space=pltpu.SMEM))


def _vel_stats_reduce(st):
    return jnp.max(st.reshape(2, -1), axis=1)


@functools.partial(jax.jit, static_argnames=("block_rows", "return_stats"))
def project(u: jnp.ndarray, v: jnp.ndarray, p: jnp.ndarray, *,
            block_rows: int = 256, return_stats: bool = False):
    """Pressure-gradient subtraction (ref.project semantics, clamped edges;
    GPUFluidSim.cu:498-516).  Caller checks divergence_supported (same
    geometry gate).  ``return_stats``: also emit ops.ref.vel_max of the
    output velocity from the kernel (blocks already in VMEM)."""
    h, w = u.shape
    hd = _SUBLANE
    r = _pick_block_rows(h, hd, w, block_rows, planes=5)
    mid, lo, hi, n_strips = _strip_specs(h, w, r, hd)
    out = pl.BlockSpec((1, r, w), lambda c, i: (c, i, 0),
                       memory_space=pltpu.VMEM)
    kern = functools.partial(_project_kernel, n_strips=n_strips)
    u3, v3, p3 = u[None], v[None], p[None]
    shapes = [jax.ShapeDtypeStruct((1, h, w), jnp.float32)] * 2
    specs = [out, out]
    if return_stats:
        st_shape, st_spec = _vel_stats_spec(n_strips)
        shapes, specs = shapes + [st_shape], specs + [st_spec]
    res = pl.pallas_call(
        kern,
        out_shape=shapes,
        grid=(1, n_strips),
        in_specs=[mid, lo, hi, mid, mid],
        out_specs=specs,
        interpret=_interpret(),
    )(p3, p3, p3, u3, v3)
    if return_stats:
        return res[0][0], res[1][0], _vel_stats_reduce(res[2])
    return res[0][0], res[1][0]


@functools.partial(jax.jit, static_argnames=("iters", "block_rows", "burst"))
def diffuse(fields: jnp.ndarray, dt, diffusion, iters: int, *,
            block_rows: int = 256, burst: int = 8):
    """Exact ``iters``-sweep Jacobi diffusion of (C, H, W) fields with
    alpha = diffusion²/dt, beta = 4 + alpha (ref: cpuFluidSim.cpp:182-233)."""
    if iters == 0:
        return fields
    squeeze = fields.ndim == 2
    if squeeze:
        fields = fields[None]
    c, h, w = fields.shape
    kf = jnp.asarray(diffusion, jnp.float32)
    alpha = jnp.broadcast_to(
        (kf * kf / jnp.asarray(dt, jnp.float32)).reshape(1, 1), (c, 1)
    )
    f = _diffuse_bursts(fields, alpha, iters, block_rows, burst)
    return f[0] if squeeze else f


def _diffuse_bursts(fields, alpha, iters, block_rows, burst, splat=None):
    """Shared burst loop; ``alpha`` is (C, 1) — per-channel Jacobi alpha.
    ``splat`` = (amps (C,), last (2,), radius) applies the fused gpu-variant
    splat tail in the FINAL burst's kernel."""
    c, h, w = fields.shape
    f = fields
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
    schedule = _burst_schedule(iters, burst, h, w, block_rows)
    for bi, (k, r, hd, hp, wp) in enumerate(schedule):
        with_splat = splat is not None and bi == len(schedule) - 1
        fi = _mirror_pad(f, h, w, hp, wp)
        plan = _col_plan(hp, wp, hd, block_rows)
        if plan is not None:
            f = _diffuse_burst_tiled(fi, alpha, amp_arr, sp_arr, k, hd,
                                     plan, with_splat)[:, :h, :w]
            continue
        mid, lo, hi, n_strips = _strip_specs(hp, wp, r, hd)
        kern = functools.partial(_diffuse_kernel, k=k, hd=hd,
                                 n_strips=n_strips, splat=with_splat)
        smem_c = pl.BlockSpec((c, 1), lambda ci, i: (0, 0),
                              memory_space=pltpu.SMEM)
        smem_3 = pl.BlockSpec((3, 1), lambda ci, i: (0, 0),
                              memory_space=pltpu.SMEM)
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
            grid=(c, n_strips),
            in_specs=[smem_c, smem_c, smem_3, mid, lo, hi],
            out_specs=pl.BlockSpec((1, r, wp), lambda ci, i: (ci, i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=_interpret(),
        )(alpha, amp_arr, sp_arr, fi, fi, fi)[:, :h, :w]
    return f


@functools.partial(jax.jit, static_argnames=("iters", "block_rows", "burst"))
def diffuse_multi(fields: jnp.ndarray, dt, coeffs, iters: int, *,
                  block_rows: int = 256, burst: int = 8):
    """Per-channel-coefficient Jacobi diffusion of (C, H, W) fields in one
    fused pass (velocity + dye together; each channel-program reads its own
    alpha from SMEM)."""
    if iters == 0:
        return fields
    c = fields.shape[0]
    kf = jnp.asarray(coeffs, jnp.float32).reshape(c, 1)
    alpha = kf * kf / jnp.asarray(dt, jnp.float32)
    return _diffuse_bursts(fields, alpha, iters, block_rows, burst)


@functools.partial(jax.jit, static_argnames=("iters", "block_rows", "burst"))
def diffuse_multi_splat(fields: jnp.ndarray, dt, coeffs, iters: int,
                        amps, last, radius, *,
                        block_rows: int = 256, burst: int = 8):
    """diffuse_multi followed by the gpu-variant splat, with the splat's
    per-channel Gaussian add fused into the FINAL burst kernel (the fields
    are already VMEM-resident there — the separate splat pass the reference
    launches, GPUFluidSim.cu:663, costs a full read+write of every field).
    Matches ops.ref.diffuse_multi_splat to f32 rounding."""
    c = fields.shape[0]
    if iters == 0:
        from cudafluidsimulation_tpu.ops import ref as _ref

        xs, ys = _ref.coord_grids(fields.shape[-2], fields.shape[-1])
        return _ref.splat_tail(fields, amps, last, radius, xs, ys)
    kf = jnp.asarray(coeffs, jnp.float32).reshape(c, 1)
    alpha = kf * kf / jnp.asarray(dt, jnp.float32)
    return _diffuse_bursts(fields, alpha, iters, block_rows, burst,
                           splat=(amps, last, radius))
