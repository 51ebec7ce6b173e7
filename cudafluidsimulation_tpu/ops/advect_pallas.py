"""Semi-Lagrangian advection as a gather-free Pallas TPU kernel.

XLA's TPU gather is a scalar loop (~7ns/element measured on v5e), which makes
the reference's backtrace-and-bilerp advection (cpuFluidSim.cpp:110-179,
GPUFluidSim.cu:205-294) the dominant cost of a naive JAX port — hundreds of
ms per 2048² step.  This kernel reformulates the bilinear gather as a
masked shift-accumulation, which is pure VPU work:

    out[y,x] = sum_{dy,dx} wy(dy)[y,x] * wx(dx)[y,x] * f[y+dy, x+dx]

where the bilerp weights factorize exactly: wy(dy) = (1-ty)*[cy1==y+dy]
+ ty*[cy2==y+dy] and likewise wx.

Both offset loops are dynamic fori_loops over the strip's REALIZED
displacement window (dynamic-shift pltpu.roll moves the data; the inner dx
loop advances with cheap static single-lane shifts), so quiet strips run a
handful of iterations and only strips containing fast flow pay for wide
windows.  (A 2-D column-blocked variant with x halos was tried and lost to
this strip design in both quiet and dispersed regimes — see git history.)

The VERTICAL displacement each step is bounded by ``max_displacement`` (D)
cells: taps farther than D rows from the target clamp to +/-D rows (the
y halo is only D deep).  On the FLAT path horizontal taps are UNBOUNDED —
the whole strip width is VMEM-resident, so |vx|*dt of any size is exact.
The reference's backtrace is unbounded in both axes, so results differ only
where |vy| * dt > D cells; the ref backend remains the exact-parity oracle,
and the dynamic windows mean raising D costs nothing when the flow is slow
(only halo HBM traffic grows, ~hd/r per plane).

Grid iterates over row strips with an hd-deep halo (hd = D+1 rounded up to
the 8-row sublane tile), same blocked layout as jacobi_pallas.

Column tiling (wide grids): very wide rows starve the strip geometry — at
w=8192 even the 2-channel kernel fell to one-channel-per-program r=16
strips with a 2/3 halo fraction (round-2's 175 ms/step 8192² suspect), and
at 2048² the d=31 exact bound pushed dye to the same fallback.  When
:func:`_tile_plan` decides flat geometry is poor, ONE pallas launch runs a
(channels, strips, tiles) grid where each program sees its tile through a
3x3 halo-block assembly (row lo/mid/hi x col lo/mid/hi BlockSpecs of the
same array — no materialized tiled copy, no per-tile launches).  Horizontal
taps are then bounded at D cells too (the col halo depth), the same
contract as the vertical bound; health.clamp_axes / the CLI clamp warning
report it, and :func:`uses_column_tiling` exposes the decision.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUBLANE = 8
_LANES = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tap_setup(dt, y0, x0, u, v, *, h_phys, w_phys, r, d, d_x, wt):
    """Backtrace positions -> bilerp fractions and clipped tap offsets.

    Departure points pos = (x, y) - dt*vel; corner via C-style truncation
    (cpuFluidSim.cpp:110-155 semantics, incl. tx<0 extrapolation).  Taps
    clamp to the PHYSICAL domain (pad cells beyond it are therefore never
    selected by the offset masks and may hold arbitrary finite junk)."""
    ys_i = jax.lax.broadcasted_iota(jnp.int32, (r, wt), 0) + y0
    xs_i = jax.lax.broadcasted_iota(jnp.int32, (r, wt), 1) + x0

    px = xs_i.astype(jnp.float32) - dt * u
    py = ys_i.astype(jnp.float32) - dt * v
    x1 = jnp.trunc(px)
    y1 = jnp.trunc(py)
    tx = px - x1
    ty = py - y1

    cx1 = jnp.clip(x1, 0, w_phys - 1).astype(jnp.int32)
    cx2 = jnp.clip(x1 + 1.0, 0, w_phys - 1).astype(jnp.int32)
    cy1 = jnp.clip(y1, 0, h_phys - 1).astype(jnp.int32)
    cy2 = jnp.clip(y1 + 1.0, 0, h_phys - 1).astype(jnp.int32)

    dy1 = jnp.clip(cy1 - ys_i, -d, d)
    dy2 = jnp.clip(cy2 - ys_i, -d, d)
    dx1 = jnp.clip(cx1 - xs_i, -d_x, d_x)
    dx2 = jnp.clip(cx2 - xs_i, -d_x, d_x)
    return tx, ty, dx1, dx2, dy1, dy2


def _finish(acc, mode, decay_rate, dt):
    decay = 1.0 / (1.0 + decay_rate * dt)
    if mode == "dye":
        # fmin: C fminf(1, NaN) -> 1.0 (see ops.ref.advect_dye)
        return jnp.fmin(1.0, jnp.power(acc, 1.005) * decay)
    return acc * decay


def _advect_core(dt, y0, x0, u, v, ext, *, mode, decay_rate, h_phys, w_phys,
                 r, hd, d, d_x, c, wt, win_ref=None):
    """The shared masked-shift-accumulation loop.

    ``u``/``v``: (r, wt) velocity at the output cells.  ``ext``: the
    (c, r + 2*hd, wt + 2*wd) tap neighborhood whose core starts at row hd,
    col wd (wd = 0 on the flat path).  ``y0``/``x0``: GLOBAL coordinates of
    the output block's first row/col.  Returns the (c, r, wt) output.

    ``win_ref``: optional SMEM scratch (2*(2d+1),) i32 — when present the
    per-dy dx windows are computed in a vectorized PRE-PASS and the main
    loop reads precomputed scalars instead of serializing a reduce->scalar
    chain into every dy iteration (the r4 verdict's stall hypothesis for
    the 2048² driven gap; A/B via scripts/advect_prepass_ab.py)."""
    he = r + 2 * hd
    wext = ext.shape[2]
    wd = (wext - wt) // 2

    tx, ty, dx1, dx2, dy1, dy2 = _tap_setup(
        dt, y0, x0, u, v, h_phys=h_phys, w_phys=w_phys, r=r, d=d, d_x=d_x,
        wt=wt)
    # Flat path (d_x = full width): x offsets are effectively unbounded —
    # the whole strip width lives in VMEM, so horizontal taps are exact for
    # arbitrary |vx|*dt (cx is domain-clamped, hence |dx| < w).  Column
    # tiles and x-sharded local views only hold d_x halo columns, so taps
    # clamp there (same semantics as the vertical bound).

    # per-strip active dy window (scalars); the loops below run EXACTLY the
    # realized windows — dynamic trip counts, dynamic roll shifts, no
    # unrolled guard blocks
    dylo = jnp.minimum(jnp.min(dy1), jnp.min(dy2))
    dyhi = jnp.maximum(jnp.max(dy1), jnp.max(dy2))

    def _dx_window(dy):
        # Per-dy dx window: only cells whose backtrace touches row offset dy
        # contribute here, so sweep just THEIR realized x-offsets.  In
        # rotational flow the displacement set hugs a circle of radius
        # ~|v|dt; the per-dy chords sum to ~the circle's area while a global
        # window would pay the full bounding box every dy — measured ~2x on
        # the driven 2048^2 benchmark flow.  (dx1 <= dx2 per cell, so the
        # cellwise extrema are dx1/dx2; empty masks yield lo > hi and the
        # fori_loop runs zero iterations.)
        active = (dy1 == dy) | (dy2 == dy)
        return (jnp.min(jnp.where(active, dx1, d_x)),
                jnp.max(jnp.where(active, dx2, -d_x)))

    if win_ref is not None:
        def pre_body(dy, z):
            lo, hi = _dx_window(dy)
            win_ref[2 * (dy - dylo)] = lo
            win_ref[2 * (dy - dylo) + 1] = hi
            return z

        jax.lax.fori_loop(dylo, dyhi + 1, pre_body, 0)

    def dy_body(dy, acc):
        wy = (
            jnp.where(dy1 == dy, 1.0 - ty, 0.0)
            + jnp.where(dy2 == dy, ty, 0.0)
        )
        if win_ref is not None:
            dxlo = win_ref[2 * (dy - dylo)]
            dxhi = win_ref[2 * (dy - dylo) + 1]
        else:
            dxlo, dxhi = _dx_window(dy)

        # rows y+dy of the strip: roll rows by -dy, slice the core.
        # |dy| <= d <= hd so selected rows never wrap.
        core = pltpu.roll(ext, jnp.mod(he - dy, he), axis=1)[:, hd : hd + r, :]

        def dx_body(dx, carry):
            acc, rcur = carry
            wx = (
                jnp.where(dx1 == dx, 1.0 - tx, 0.0)
                + jnp.where(dx2 == dx, tx, 0.0)
            )
            acc = acc + (wx * wy)[None] * rcur[:, :, :wt]
            # advance to the next offset with a cheap static single-lane
            # shift instead of a fresh arbitrary dynamic rotate (a slice-
            # concat wrap shift measured the same here)
            return acc, pltpu.roll(rcur, wext - 1, axis=2)

        # align ext column (wd + dxlo) onto output column 0; on column
        # tiles |dx| <= d <= wd keeps every tap in-bounds, on the flat
        # path (wd = 0) wrapped columns are masked out by wx
        r0 = pltpu.roll(core, jnp.mod(wext - wd - dxlo, wext), axis=2)
        acc, _ = jax.lax.fori_loop(dxlo, dxhi + 1, dx_body, (acc, r0))
        return acc

    acc = jax.lax.fori_loop(
        dylo, dyhi + 1, dy_body, jnp.zeros((c, r, wt), jnp.float32)
    )
    return _finish(acc, mode, decay_rate, dt)


def _advect_core_packed(dt, y0, x0, u, v, ext, *, mode, decay_rate, h_phys,
                        w_phys, r, hd, d, d_x, c, wt):
    """Opt-in bf16-packed dye core (config.fast_dye): identical tap set,
    windows and weights to :func:`_advect_core`, but dye channels 0 and 1
    are bf16-packed into one i32 plane (bf16 = top 16 f32 bits, +0x8000
    rounding) and channel 2 rides bitcast i32 at full precision, so EVERY
    roll moves a (2, he, wext) i32 stack instead of (3, he, wext) f32 —
    2/3 the roll volume for the op class that measured 49% of the dye
    kernel (scripts/roll_share_probe.py).  Taps unpack with mask/shift +
    bitcast (cheap elementwise VPU) and accumulate in f32.

    Accuracy: bf16 storage of 2 channels' TAP values — max |err| ~5e-3 on
    [0, 1] dye (measured vs the f32 core on the driven benchmark flow);
    accumulation and weights stay f32.  Measured 19% faster than the f32
    core at an identical geometry (16.09 vs 19.94 ms driven 2048²/d=31,
    scripts/advect_anatomy_probe.py `packed`).  Deliberately NOT used on
    the quiet fast path (the static ±1 core stays exact f32), so fast-mode
    error only arises where the flow is fast.  Requires mode "dye" and all
    3 channels in one program (cb == 3)."""
    assert mode == "dye" and c == 3
    he = r + 2 * hd
    wext = ext.shape[2]
    wd = (wext - wt) // 2

    tx, ty, dx1, dx2, dy1, dy2 = _tap_setup(
        dt, y0, x0, u, v, h_phys=h_phys, w_phys=w_phys, r=r, d=d, d_x=d_x,
        wt=wt)
    dylo = jnp.minimum(jnp.min(dy1), jnp.min(dy2))
    dyhi = jnp.maximum(jnp.max(dy1), jnp.max(dy2))

    m = jnp.int32(-65536)  # 0xFFFF0000
    b0 = pltpu.bitcast(ext[0], jnp.int32)
    b1 = pltpu.bitcast(ext[1], jnp.int32)
    pk = ((b0 + 0x8000) & m) | jax.lax.shift_right_logical(b1 + 0x8000, 16)
    pext = jnp.stack([pk, pltpu.bitcast(ext[2], jnp.int32)])

    def dy_body(dy, acc):
        wy = (jnp.where(dy1 == dy, 1.0 - ty, 0.0)
              + jnp.where(dy2 == dy, ty, 0.0))
        active = (dy1 == dy) | (dy2 == dy)
        dxlo = jnp.min(jnp.where(active, dx1, d_x))
        dxhi = jnp.max(jnp.where(active, dx2, -d_x))
        core = pltpu.roll(pext, jnp.mod(he - dy, he),
                          axis=1)[:, hd:hd + r, :]

        def dx_body(dx, carry):
            acc, rcur = carry
            wx = (jnp.where(dx1 == dx, 1.0 - tx, 0.0)
                  + jnp.where(dx2 == dx, tx, 0.0))
            w = (wx * wy)[None]
            c0 = pltpu.bitcast(rcur[0] & m, jnp.float32)
            c1 = pltpu.bitcast(rcur[0] << 16, jnp.float32)
            c2 = pltpu.bitcast(rcur[1], jnp.float32)
            vals = jnp.stack([c0, c1, c2])[:, :, :wt]
            return acc + w * vals, pltpu.roll(rcur, wext - 1, axis=2)

        r0 = pltpu.roll(core, jnp.mod(wext - wd - dxlo, wext), axis=2)
        acc, _ = jax.lax.fori_loop(dxlo, dxhi + 1, dx_body, (acc, r0))
        return acc

    acc = jax.lax.fori_loop(dylo, dyhi + 1, dy_body,
                            jnp.zeros((c, r, wt), jnp.float32))
    # Clamp extrapolation undershoot to 0 instead of reproducing the
    # reference's pow(neg)->NaN->fmin saturation to 1.0: bf16 tap noise can
    # flip the SIGN of a marginally-negative accumulation, which under the
    # exact semantics turns a ~0 dye cell into a full-bright 1.0 pixel.
    # The fast mode trades that quirk for artifact-free output (deliberate
    # divergence, opt-in only; the f32 cores keep exact parity).
    return _finish(jnp.maximum(acc, 0.0), mode, decay_rate, dt)


def _advect_core_packed_vel(dt, y0, x0, u, v, ext, *, mode, decay_rate,
                            h_phys, w_phys, r, hd, d, d_x, c, wt):
    """Opt-in bf16-packed VELOCITY core (config.fast_velocity): the two
    advected channels ARE (u, v), so both bf16-pack into ONE i32 plane
    (u = top 16 f32 bits with +0x8000 rounding, v = bottom 16) and every
    roll of the dynamic-window loop moves a (1, he, wext) stack instead of
    (2, he, wext) f32 — HALF the roll volume for the op class that measured
    49% of the advect kernels (scripts/roll_share_probe.py).  Same tap set,
    windows and weights as :func:`_advect_core`; taps unpack with
    mask/shift + bitcast and accumulate in f32.

    Accuracy: bf16 storage of the TAP values only (~2^-9 relative);
    weights, positions and accumulation stay f32, and mode "field" has no
    pow/NaN saturation quirk, so no clamp is needed (unlike the packed dye
    core).  The error feeds back through self-advection, so long chaotic
    rollouts decorrelate from the f32 trajectory — opt-in only; quiet
    steps stay exact via the static f32 fast path.  Requires mode "field"
    and both channels in one program (cb == 2)."""
    assert mode == "field" and c == 2
    he = r + 2 * hd
    wext = ext.shape[2]
    wd = (wext - wt) // 2

    tx, ty, dx1, dx2, dy1, dy2 = _tap_setup(
        dt, y0, x0, u, v, h_phys=h_phys, w_phys=w_phys, r=r, d=d, d_x=d_x,
        wt=wt)
    dylo = jnp.minimum(jnp.min(dy1), jnp.min(dy2))
    dyhi = jnp.maximum(jnp.max(dy1), jnp.max(dy2))

    m = jnp.int32(-65536)  # 0xFFFF0000
    b0 = pltpu.bitcast(ext[0], jnp.int32)
    b1 = pltpu.bitcast(ext[1], jnp.int32)
    pext = (((b0 + 0x8000) & m)
            | jax.lax.shift_right_logical(b1 + 0x8000, 16))[None]

    def dy_body(dy, acc):
        wy = (jnp.where(dy1 == dy, 1.0 - ty, 0.0)
              + jnp.where(dy2 == dy, ty, 0.0))
        active = (dy1 == dy) | (dy2 == dy)
        dxlo = jnp.min(jnp.where(active, dx1, d_x))
        dxhi = jnp.max(jnp.where(active, dx2, -d_x))
        core = pltpu.roll(pext, jnp.mod(he - dy, he),
                          axis=1)[:, hd:hd + r, :]

        def dx_body(dx, carry):
            acc, rcur = carry
            wx = (jnp.where(dx1 == dx, 1.0 - tx, 0.0)
                  + jnp.where(dx2 == dx, tx, 0.0))
            w = (wx * wy)[None]
            c0 = pltpu.bitcast(rcur[0] & m, jnp.float32)
            c1 = pltpu.bitcast(rcur[0] << 16, jnp.float32)
            vals = jnp.stack([c0, c1])[:, :, :wt]
            return acc + w * vals, pltpu.roll(rcur, wext - 1, axis=2)

        r0 = pltpu.roll(core, jnp.mod(wext - wd - dxlo, wext), axis=2)
        acc, _ = jax.lax.fori_loop(dxlo, dxhi + 1, dx_body, (acc, r0))
        return acc

    acc = jax.lax.fori_loop(dylo, dyhi + 1, dy_body,
                            jnp.zeros((c, r, wt), jnp.float32))
    return _finish(acc, mode, decay_rate, dt)


def _advect_core_static(dt, y0, x0, u, v, ext, *, mode, decay_rate, h_phys,
                        w_phys, r, hd, d, d_x, c, wt):
    """±1-window fast path: computes the SAME tap set and weights as
    :func:`_advect_core` whenever every tap offset of a physical cell lies
    in [-1, 1] on both axes, which the dispatch predicate (realized max
    |u|·dt and |v|·dt < 1, see :func:`_fast_path_ok`) guarantees; outputs
    agree to ≤1 ulp (the two programs fuse multiply-adds differently).
    Fully static — unrolled 3x3, slice-concat shifts, no in-kernel
    reductions, no dynamic rolls — which removes the reduction→scalar
    stall that dominates the dynamic-window core on quiet flows: 0.028 ms
    vs 1.15 ms at 960x540/c=3 (the copy floor is 0.02;
    scripts/advect_anatomy_probe.py, `static9` variant)."""
    wext = ext.shape[2]
    wd = (wext - wt) // 2
    tx, ty, dx1, dx2, dy1, dy2 = _tap_setup(
        dt, y0, x0, u, v, h_phys=h_phys, w_phys=w_phys, r=r, d=d, d_x=d_x,
        wt=wt)

    acc = jnp.zeros((c, r, wt), jnp.float32)
    for dy in (-1, 0, 1):
        wy = (jnp.where(dy1 == dy, 1.0 - ty, 0.0)
              + jnp.where(dy2 == dy, ty, 0.0))
        # |dy| <= 1 <= hd: static row slice, never wraps
        rows = ext[:, hd + dy:hd + dy + r, :]
        for dx in (-1, 0, 1):
            wx = (jnp.where(dx1 == dx, 1.0 - tx, 0.0)
                  + jnp.where(dx2 == dx, tx, 0.0))
            # align ext column (wd + dx) onto output column 0; on the flat
            # path (wd = 0) the dx = -1 wrap column is masked out by wx
            sh = (wd + dx) % wext
            cols = (rows if sh == 0 else
                    jnp.concatenate([rows[:, :, sh:], rows[:, :, :sh]],
                                    axis=2))
            acc = acc + (wx * wy)[None] * cols[:, :, :wt]
    return _finish(acc, mode, decay_rate, dt)


def _packed_core(mode, packed, cb, c):
    """Resolve the opt-in bf16-packed DYNAMIC core for this geometry, or
    None for the exact f32 core.  Packing needs all channels in one program
    (cb == c); geometries that split channels silently fall back to f32."""
    if not packed or cb != c:
        return None
    if mode == "dye" and c == 3:
        return _advect_core_packed
    if mode == "field" and c == 2:
        return _advect_core_packed_vel
    return None


def _fast_path_ok(u, v, dt, vel_stats=None):
    """True iff the realized backtrace displacement is strictly under one
    cell on both axes — the exactness condition for the static ±1 core
    (strict: |u·dt| < 1 keeps trunc-corner offsets in {-1, 0} / {0, 1}
    including the tx<0 extrapolation region).  NaN velocities compare
    False, routing blow-ups to the dynamic core (whose NaN semantics the
    parity tests pin).

    ``vel_stats``: optional producer-emitted (2,) [max|u|, max|v|] UPPER
    BOUND of the passed velocity (ops.ref.vel_max contract) — then the
    predicate is two scalar compares instead of two full-array HBM
    reductions (the reductions measured +1.8 ms/step at 8192², the only
    driven-flow cost of the dual dispatch).  A too-large bound merely
    denies the fast path; it can never wrongly grant it."""
    dt_f = jnp.asarray(dt, jnp.float32)
    if vel_stats is not None:
        return (vel_stats[0] * dt_f < 1.0) & (vel_stats[1] * dt_f < 1.0)
    return ((jnp.max(jnp.abs(u)) * dt_f < 1.0)
            & (jnp.max(jnp.abs(v)) * dt_f < 1.0))


def _emit_stats(st, val, ci, *rest, cb):
    """Per-channel max|val| -> this program's slots of the WHOLE-ARRAY SMEM
    stats ref (Mosaic requires SMEM output blocks to equal the array shape,
    so the stats buffer is shared across the sequential grid with a constant
    index map; program (ci, i[, t]) writes rows ci*cb+j, column i[, t] —
    every slot written by exactly one program).  One reduction per PROGRAM
    over the already-resident output block (a VPU pass, no HBM traffic) —
    unlike the per-loop-iteration window reductions the static core exists
    to avoid, a single end-of-program scalar store is cheap."""
    for j in range(val.shape[0]):
        st[(ci * cb + j,) + rest] = jnp.max(jnp.abs(val[j]))


def _advect_kernel(dt_ref, y0_ref, x0_ref, u_ref, v_ref, fm, fl, fh, out,
                   *rest, mode, decay_rate, h, w, h_phys, w_phys, r, hd,
                   d, d_x, c, core=None, prepass=False):
    i = pl.program_id(1)
    win = {"win_ref": rest[-1]} if prepass else {}
    maybe_st = rest[:-1] if prepass else rest
    # y0_ref/x0_ref hold the GLOBAL coordinates of array row/col 0 (nonzero
    # when a shard_map caller advects a halo-padded local view of a global
    # field); offsets dx/dy below stay local because translation cancels
    ext = jnp.concatenate([fl[:], fm[:], fh[:]], axis=1)  # (c, he, w)
    out[...] = (core or _advect_core)(
        dt_ref[0, 0], i * r + y0_ref[0, 0], x0_ref[0, 0],
        u_ref[:], v_ref[:], ext,
        mode=mode, decay_rate=decay_rate, h_phys=h_phys, w_phys=w_phys,
        r=r, hd=hd, d=d, d_x=d_x, c=c, wt=w, **win,
    )
    if maybe_st:
        _emit_stats(maybe_st[0], out[...], pl.program_id(0), i, cb=c)


def _advect_kernel_tiled(dt_ref, y0_ref, x0_ref, u_ref, v_ref,
                         f_mm, f_ml, f_mh, f_lm, f_ll, f_lh,
                         f_hm, f_hl, f_hh, out, *rest,
                         mode, decay_rate, h, h_phys, w_phys, r, hd, d,
                         c, wt, wd, core=None, prepass=False):
    """Column-tiled program: the tap neighborhood arrives as a 3x3 halo
    block assembly (rows lo/mid/hi x cols lo/mid/hi of the same field
    array), so one launch covers the whole (channels, strips, tiles) grid
    with no materialized tiled copy.  Horizontal taps bound at d <= wd."""
    i = pl.program_id(1)
    t = pl.program_id(2)
    win = {"win_ref": rest[-1]} if prepass else {}
    maybe_st = rest[:-1] if prepass else rest
    top = jnp.concatenate([f_ll[:], f_lm[:], f_lh[:]], axis=2)
    mid = jnp.concatenate([f_ml[:], f_mm[:], f_mh[:]], axis=2)
    bot = jnp.concatenate([f_hl[:], f_hm[:], f_hh[:]], axis=2)
    ext = jnp.concatenate([top, mid, bot], axis=1)  # (c, he, wt + 2*wd)
    out[...] = (core or _advect_core)(
        dt_ref[0, 0], i * r + y0_ref[0, 0], t * wt + x0_ref[0, 0],
        u_ref[:], v_ref[:], ext,
        mode=mode, decay_rate=decay_rate, h_phys=h_phys, w_phys=w_phys,
        r=r, hd=hd, d=d, d_x=d, c=c, wt=wt, **win,
    )
    if maybe_st:
        _emit_stats(maybe_st[0], out[...], pl.program_id(0), i, t, cb=c)


def _halo(d: int) -> int:
    # need rows hd+dy for dy in [-d, d] plus the +1 tap, 8-row aligned chunks
    # reaching hd + 8*floor(d/8) + r + 8 <= r + 2*hd
    return max(_SUBLANE, -(-(d + 1) // _SUBLANE) * _SUBLANE)


# VMEM planning budget for one program's working set (v5e has ~16 MiB/core;
# the margin covers Mosaic's own scratch).  Module global so the probe
# scripts can sweep it — see scripts/advect_probe2.py and docs/ROADMAP.md.
_VMEM_BUDGET = 10 * 1024 * 1024

# Experimental per-dy window pre-pass (SMEM scratch) for the exact dynamic
# core: computes ALL dx windows before the dy loop so the loop reads
# precomputed scalars instead of stalling on a reduce->scalar chain per
# iteration.  Module global for A/B probes (scripts/advect_prepass_ab.py);
# flips the default only on measured acceptance.
_WINDOW_PREPASS = False

# The runtime dual-path dispatch (lax.cond) to the static ±1-window core on
# quiet steps is controlled by the ``fast_path`` argument of :func:`advect`
# (config field ``advect_fast_path``, default on).  Both branches compile
# either way (the jaxpr carries two pallas_calls per advect), and vmapped
# ensembles lower the cond to a both-sides select — the static side costs
# ~3% of the dynamic side (measured, BASELINE.md ensemble row), which
# ``advect_fast_path=False`` reclaims for always-driven ensembles.


def _footprint(r: int, w: int, c: int, hd: int, wt: int = 0) -> int:
    """Estimated VMEM bytes for one program: double-buffered io blocks plus
    the ext value, its rolled copies, and the accumulator.  ``wt`` > 0 means
    a column tile: blocks cover (r x wt) cores + halo strips of total width
    w - wt, the loop values still span the full ext width ``w``."""
    wt = wt or w
    # io blocks: field core+halos, u/v core planes, out core
    blocks = (c * (r * wt + (w - wt) * r + 2 * hd * w)
              + 2 * r * wt + c * r * wt)
    # live values: ext + one rolled copy + accumulator (rolls reuse buffers)
    values = 2 * c * (r + 2 * hd) * w + c * r * wt
    return 4 * (2 * blocks + values)


def _pick_rows(h: int, w: int, c: int, hd: int, wt: int = 0) -> int:
    """Largest strip height that divides h, is a MULTIPLE OF THE HALO DEPTH
    (the lo/hi halo index maps address hd-row blocks at i*(r//hd)-1, which is
    only the right offset when hd | r), and fits in VMEM."""
    budget = _VMEM_BUDGET
    r = 256
    while r >= hd:
        if h % r == 0 and r % hd == 0 and _footprint(r, w, c, hd, wt) <= budget:
            return r
        r -= hd
    return 0


def _pad_geometry(h: int, w: int, c: int, hd: int, wt: int = 0):
    """(h_pad, w_pad, r, c_block): zero-padded geometry for arbitrary grids.
    Unlike the Jacobi mirror padding this needs no re-fill invariant — padded
    cells are never tap targets (taps clamp to the physical domain), so zeros
    suffice and any pad amount works.  Very wide grids that cannot fit all
    channels in VMEM at once fall back to one-channel-per-program
    (c_block=1; positions/weights are recomputed per channel)."""
    w_pad = -(-w // _LANES) * _LANES
    for c_block in ([c, 1] if c > 1 else [1]):
        h_try = -(-h // hd) * hd
        while h_try <= 4 * h + 8 * hd:
            r = _pick_rows(h_try, w_pad, c_block, hd, wt)
            if r >= hd:
                return h_try, w_pad, r, c_block
            h_try += hd
    raise ValueError(f"no viable advect geometry for {h}x{w}")


def flat_supported(h: int, w: int, c: int, d: int) -> bool:
    """Viability of the FLAT kernel alone.  Callers that advect x-sharded
    local views pass ``d_x != 0``, which pins :func:`advect` to the flat
    path (column tiles assume the array's x edges are PHYSICAL edges, not
    shard seams) — they must gate on this, not :func:`supported`."""
    if h < _SUBLANE or w < 64:
        return False
    try:
        _pad_geometry(h, w, c, _halo(d))
        return True
    except ValueError:
        return False


def supported(h: int, w: int, c: int, d: int) -> bool:
    if flat_supported(h, w, c, d):
        return True
    # flat-unviable geometries may still be served by column tiling
    # (e.g. 8192² at d=31); without it advect would fall back to the
    # XLA-gather ref op at ~7 ns/element
    return h >= _SUBLANE and w >= 64 and _tile_plan(h, w, c, d) is not None


def _tile_cost(r: int, cb: int, c: int, hd: int, wt: int, wd: int,
               t_cnt: int) -> float:
    """Relative per-cell cost model for a geometry choice, validated by
    on-chip probes (scripts/advect_probe2.py): the dy-loop roll work scales
    with the ext width (wt + 2*wd) and ext rows (r + 2*hd), the weight
    computation is recomputed per channel-program when cb < c, and each
    extra grid dimension step has a small fixed cost."""
    width_over = (wt + 2.0 * wd) / wt
    row_over = (r + 2.0 * hd) / r
    chan_over = 1.0 + 0.5 * (c / cb - 1.0)
    return width_over * row_over * chan_over * (1.0 + 0.01 * t_cnt)


def _tile_plan(h: int, w: int, c: int, d: int):
    """Column-tiling plan, or None to run the flat kernel.  Returns
    (wt, wd, t_cnt, r, cb): tile width, halo cols, tile count, strip rows,
    channel block.  Engages only when it beats the flat geometry's modeled
    cost by >10% (hysteresis keeps narrow/normal grids on the exact-x flat
    path)."""
    hd = _halo(d)
    try:
        _, wp, r_f, cb_f = _pad_geometry(h, w, c, hd)
        flat_ok = True
    except ValueError:
        # no viable flat geometry at all (e.g. 8192² at d=31: the full-width
        # ext alone overflows VMEM even one-channel-per-program) — tiling is
        # then the ONLY pallas path, so consider every tile plan
        wp = -(-w // _LANES) * _LANES
        flat_ok = False
    if flat_ok and cb_f == c and r_f >= 2 * hd:
        # flat geometry is healthy: keep the exact-x semantics (tiling only
        # rescues geometries the flat kernel already serves poorly)
        return None
    flat_cost = (_tile_cost(r_f, cb_f, c, hd, wp, 0, 1) if flat_ok
                 else float("inf"))
    wd = -(-max(d, 1) // _LANES) * _LANES
    best = None
    lanes = wp // _LANES
    for t_cnt in range(2, lanes + 1):
        if lanes % t_cnt:
            continue
        wt = wp // t_cnt
        if wt % wd or wt < 2 * wd:
            continue
        try:
            hp, _, r_t, cb_t = _pad_geometry(h, wt + 2 * wd, c, hd, wt=wt)
        except ValueError:
            continue
        cost = _tile_cost(r_t, cb_t, c, hd, wt, wd, t_cnt)
        if cost < 0.9 * flat_cost and (best is None or cost < best[0]):
            best = (cost, wt, wd, t_cnt, r_t, cb_t)
    if best is None:
        return None
    return best[1:]


def uses_column_tiling(h: int, w: int, c: int, d: int) -> bool:
    """True when :func:`advect` will column-tile this geometry (horizontal
    taps then bound at d like the vertical ones — see health.clamp_axes)."""
    return _tile_plan(h, w, c, d) is not None


@functools.partial(jax.jit, static_argnames=("decay_rate", "mode", "d",
                                             "h_phys", "w_phys", "d_x",
                                             "return_stats", "packed",
                                             "fast_path"))
def advect(fields: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, dt,
           decay_rate: float, mode: str = "field", d: int = 15,
           y0=0, h_phys: int = 0, x0=0, w_phys: int = 0,
           d_x: int = 0, vel_stats=None, return_stats: bool = False,
           packed: bool = False, fast_path: bool = True):
    """Advect (C, H, W) ``fields`` through velocity (u, v) with the
    reference's decay semantics.  mode "dye" applies the
    min(1, c^1.005 * decay) fade (GPUFluidSim.cu:288-290).

    For shard-local views of a global field, ``y0``/``x0`` (traced ok) are
    the global coordinates of array row/col 0 and ``h_phys``/``w_phys`` the
    GLOBAL extents used for tap clamping; 0 means "this array is the whole
    domain".  ``d_x`` bounds horizontal tap offsets (x-sharded local views
    pass their exchanged halo depth); 0 means unbounded (full strip width
    is resident) — except on wide grids where the column-tiled path engages
    (see module docstring) and bounds horizontal taps at d.

    ``vel_stats``: optional (2,) producer-emitted [max|u|, max|v|] bound of
    the passed velocity (ops.ref.vel_max contract) — makes the fast-path
    dispatch predicate two scalar compares (see :func:`_fast_path_ok`).
    ``return_stats``: also return the same bound ABOUT THE OUTPUT (mode
    "field" advects the velocity itself), emitted per-program from blocks
    already resident in VMEM, so the next consumer's predicate costs no
    HBM reads; pad rows/cols are included, which can only over-estimate
    (pad outputs are convex blends of physical values).
    ``fast_path``: the lax.cond dual dispatch to the static ±1 core on quiet
    steps (config.advect_fast_path); False pins the dynamic core."""
    c, h, w = fields.shape
    plan = _tile_plan(h, w, c, d) if d_x == 0 else None
    if plan is not None:
        return _advect_tiled(fields, u, v, dt, decay_rate, mode, d,
                             y0, h_phys or h, x0, w_phys or w, plan,
                             vel_stats, return_stats, packed, fast_path)
    return _advect_flat(fields, u, v, dt, decay_rate, mode, d, y0,
                        h_phys or h, x0, w_phys or w, d_x,
                        vel_stats, return_stats, packed, fast_path)


def _advect_flat(fields, u, v, dt, decay_rate, mode, d,
                 y0, h_phys, x0, w_phys, d_x, vel_stats=None,
                 return_stats=False, packed=False, fast_path=True):
    c, h, w = fields.shape
    hd = _halo(d)
    hp, wp, r, cb = _pad_geometry(h, w, c, hd)
    if (hp, wp) != (h, w):
        pad = [(0, hp - h), (0, wp - w)]
        fields_in = jnp.pad(fields, [(0, 0)] + pad)
        u_in = jnp.pad(u, pad)  # zero velocity in pads -> benign windows
        v_in = jnp.pad(v, pad)
    else:
        fields_in, u_in, v_in = fields, u, v
    n_strips = hp // r
    hblk = hp // hd
    c_grid = c // cb

    dt_arr = jnp.asarray(dt, jnp.float32).reshape(1, 1)
    y0_arr = jnp.asarray(y0, jnp.int32).reshape(1, 1)
    x0_arr = jnp.asarray(x0, jnp.int32).reshape(1, 1)

    vm = pltpu.VMEM
    plane = pl.BlockSpec((1 * r, wp), lambda ci, i: (i, 0), memory_space=vm)
    mid = pl.BlockSpec((cb, r, wp), lambda ci, i: (ci, i, 0), memory_space=vm)
    lo = pl.BlockSpec((cb, hd, wp),
                      lambda ci, i: (ci, jnp.maximum(i * (r // hd) - 1, 0), 0),
                      memory_space=vm)
    hi = pl.BlockSpec((cb, hd, wp),
                      lambda ci, i: (ci, jnp.minimum((i + 1) * (r // hd), hblk - 1), 0),
                      memory_space=vm)

    smem = pl.BlockSpec((1, 1), lambda ci, i: (0, 0), memory_space=pltpu.SMEM)

    # whole-array SMEM block, constant index map (see _emit_stats)
    st_spec = pl.BlockSpec((c, n_strips), lambda ci, i: (0, 0),
                           memory_space=pltpu.SMEM)

    def launch(core):
        prepass = _WINDOW_PREPASS and core is None
        kern = functools.partial(
            _advect_kernel, mode=mode, decay_rate=decay_rate,
            h=hp, w=wp, h_phys=h_phys, w_phys=w_phys, r=r, hd=hd, d=d,
            d_x=(d_x or wp - 1), c=cb, core=core, prepass=prepass,
        )
        shapes = [jax.ShapeDtypeStruct((c, hp, wp), jnp.float32)]
        specs = [mid]
        if return_stats:
            shapes.append(jax.ShapeDtypeStruct((c, n_strips), jnp.float32))
            specs.append(st_spec)
        call = pl.pallas_call(
            kern,
            out_shape=shapes,
            grid=(c_grid, n_strips),
            in_specs=[smem, smem, smem, plane, plane, mid, lo, hi],
            out_specs=specs,
            scratch_shapes=(
                [pltpu.SMEM((2 * (2 * d + 1),), jnp.int32)] if prepass
                else []),
            interpret=_interpret(),
        )
        return lambda a: call(a[0], a[1], a[2], a[3], a[4], a[5], a[5], a[5])

    # the opt-in bf16-packed dye core replaces the DYNAMIC core only (the
    # quiet fast path stays exact f32); needs all channels in one program
    dyn = _packed_core(mode, packed, cb, c)
    args = (dt_arr, y0_arr, x0_arr, u_in, v_in, fields_in)
    if fast_path:
        # runtime dual path: quiet steps (realized displacement < 1 cell on
        # both axes) take the static ±1 core, which runs at the DMA floor
        res = jax.lax.cond(_fast_path_ok(u_in, v_in, dt, vel_stats),
                           launch(_advect_core_static), launch(dyn), args)
    else:
        res = launch(dyn)(args)
    if return_stats:
        out, st = res
        return out[:, :h, :w], jnp.max(st, axis=1)
    return res[0][:, :h, :w]


def _advect_tiled(fields, u, v, dt, decay_rate, mode, d,
                  y0, h_phys, x0, w_phys, plan, vel_stats=None,
                  return_stats=False, packed=False, fast_path=True):
    """One (channels, strips, tiles) launch over 3x3 halo-block inputs."""
    c, h, w = fields.shape
    hd = _halo(d)
    wt, wd, t_cnt, r, cb = plan
    wp = wt * t_cnt
    hp = -(-h // r) * r  # rows pad to whole strips; pads are never tapped
    if (hp, wp) != (h, w):
        pad = [(0, hp - h), (0, wp - w)]
        fields_in = jnp.pad(fields, [(0, 0)] + pad)
        u_in = jnp.pad(u, pad)
        v_in = jnp.pad(v, pad)
    else:
        fields_in, u_in, v_in = fields, u, v
    n_strips = hp // r
    hblk = hp // hd
    wblk = wp // wd
    tw = wt // wd  # col blocks per tile
    rh = r // hd  # row blocks per strip
    c_grid = c // cb

    dt_arr = jnp.asarray(dt, jnp.float32).reshape(1, 1)
    y0_arr = jnp.asarray(y0, jnp.int32).reshape(1, 1)
    x0_arr = jnp.asarray(x0, jnp.int32).reshape(1, 1)

    def rlo(i):
        return jnp.maximum(i * rh - 1, 0)

    def rhi(i):
        return jnp.minimum((i + 1) * rh, hblk - 1)

    def clo(t):
        return jnp.maximum(t * tw - 1, 0)

    def chi(t):
        return jnp.minimum((t + 1) * tw, wblk - 1)

    vm = pltpu.VMEM

    def bs(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=vm)

    plane = bs((r, wt), lambda ci, i, t: (i, t))
    out_spec = bs((cb, r, wt), lambda ci, i, t: (ci, i, t))
    f_mm = bs((cb, r, wt), lambda ci, i, t: (ci, i, t))
    f_ml = bs((cb, r, wd), lambda ci, i, t: (ci, i, clo(t)))
    f_mh = bs((cb, r, wd), lambda ci, i, t: (ci, i, chi(t)))
    f_lm = bs((cb, hd, wt), lambda ci, i, t: (ci, rlo(i), t))
    f_ll = bs((cb, hd, wd), lambda ci, i, t: (ci, rlo(i), clo(t)))
    f_lh = bs((cb, hd, wd), lambda ci, i, t: (ci, rlo(i), chi(t)))
    f_hm = bs((cb, hd, wt), lambda ci, i, t: (ci, rhi(i), t))
    f_hl = bs((cb, hd, wd), lambda ci, i, t: (ci, rhi(i), clo(t)))
    f_hh = bs((cb, hd, wd), lambda ci, i, t: (ci, rhi(i), chi(t)))
    smem = pl.BlockSpec((1, 1), lambda ci, i, t: (0, 0),
                        memory_space=pltpu.SMEM)

    # Mosaic indexes row-halo blocks in hd rows and col-halo blocks in wd
    # cols; both the mid and the halo specs address the SAME (c, hp, wp)
    # array, just in different block units — pallas allows that because each
    # spec carries its own block shape.
    # whole-array SMEM block, constant index map (see _emit_stats)
    st_spec = pl.BlockSpec((c, n_strips, t_cnt), lambda ci, i, t: (0, 0, 0),
                           memory_space=pltpu.SMEM)

    def launch(core):
        prepass = _WINDOW_PREPASS and core is None
        kern = functools.partial(
            _advect_kernel_tiled, mode=mode, decay_rate=decay_rate,
            h=hp, h_phys=h_phys, w_phys=w_phys, r=r, hd=hd, d=d,
            c=cb, wt=wt, wd=wd, core=core, prepass=prepass,
        )
        shapes = [jax.ShapeDtypeStruct((c, hp, wp), jnp.float32)]
        specs = [out_spec]
        if return_stats:
            shapes.append(
                jax.ShapeDtypeStruct((c, n_strips, t_cnt), jnp.float32))
            specs.append(st_spec)
        call = pl.pallas_call(
            kern,
            out_shape=shapes,
            grid=(c_grid, n_strips, t_cnt),
            in_specs=[smem, smem, smem, plane, plane,
                      f_mm, f_ml, f_mh, f_lm, f_ll, f_lh, f_hm, f_hl, f_hh],
            out_specs=specs,
            scratch_shapes=(
                [pltpu.SMEM((2 * (2 * d + 1),), jnp.int32)] if prepass
                else []),
            interpret=_interpret(),
        )
        return lambda a: call(a[0], a[1], a[2], a[3], a[4],
                              *([a[5]] * 9))

    dyn = _packed_core(mode, packed, cb, c)
    args = (dt_arr, y0_arr, x0_arr, u_in, v_in, fields_in)
    if fast_path:
        res = jax.lax.cond(_fast_path_ok(u_in, v_in, dt, vel_stats),
                           launch(_advect_core_static), launch(dyn), args)
    else:
        res = launch(dyn)(args)
    if return_stats:
        out, st = res
        return out[:, :h, :w], jnp.max(st.reshape(c, -1), axis=1)
    return res[0][:, :h, :w]


def advect_velocity(u, v, dt, decay_rate, d: int = 15, *, vel_stats=None,
                    return_stats: bool = False, packed: bool = False,
                    fast_path: bool = True):
    """Self-advection (GPUFluidSim.cu:258-272 semantics, clean double-buffer
    reads like the CPU path).  ``vel_stats``/``return_stats``: the
    producer-emitted velocity-bound contract (ops.ref.vel_max) — the
    channels of mode "field" ARE (u, v), so the emitted output stats are
    exactly [max|u'|, max|v'|].  ``packed``: opt-in bf16-packed fast mode
    (config.fast_velocity) — see :func:`_advect_core_packed_vel`."""
    if return_stats:
        uv, st = advect(jnp.stack([u, v]), u, v, dt, float(decay_rate),
                        "field", d, vel_stats=vel_stats, return_stats=True,
                        packed=packed, fast_path=fast_path)
        return uv[0], uv[1], st
    uv = advect(jnp.stack([u, v]), u, v, dt, float(decay_rate), "field", d,
                vel_stats=vel_stats, packed=packed, fast_path=fast_path)
    return uv[0], uv[1]


def advect_dye(dye, u, v, dt, decay_rate, d: int = 15, *, vel_stats=None,
               packed: bool = False, fast_path: bool = True):
    """Dye advection + fade (GPUFluidSim.cu:275-294); callers pass the
    already-advected velocity, matching both reference step orders.
    ``packed``: opt-in bf16-packed fast mode (config.fast_dye) — see
    :func:`_advect_core_packed` for the accuracy/perf contract."""
    return advect(dye, u, v, dt, float(decay_rate), "dye", d,
                  vel_stats=vel_stats, packed=packed, fast_path=fast_path)
