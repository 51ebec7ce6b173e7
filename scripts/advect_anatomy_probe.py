"""Advect kernel cost anatomy (ROADMAP gap #2: fixed cost on small grids /
quiet flows).

Builds stripped-down variants of the flat advect kernel sharing the real
geometry planner, and delta-times each standalone (jitted scan, host-transfer
sync, best-of-3, jax.clear_caches between cases):

  copy   -- same BlockSpecs, kernel copies mid block (DMA + launch floor)
  setup  -- positions, weights, window arrays + the 4 global dy reductions
  fixed  -- full dy/dx accumulation loops but STATIC [-1,1] windows
            (no per-dy min/max reductions, no realized-window scalars)
  full   -- the real _advect_core (library-identical math)

The quiet flow realizes |v|*dt << 1 so fixed/full run the same trip counts;
any full-fixed delta is the window-reduction machinery, setup-copy is the
VPU preamble, and copy is the floor.  Usage:

    python scripts/advect_anatomy_probe.py [nx ny [c [d]]]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from cudafluidsimulation_tpu.ops import advect_pallas as ap  # noqa: E402

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 960
ny = int(sys.argv[2]) if len(sys.argv) > 2 else 540
C = int(sys.argv[3]) if len(sys.argv) > 3 else 3
D = int(sys.argv[4]) if len(sys.argv) > 4 else 15
VARIANTS = (sys.argv[5].split(",") if len(sys.argv) > 5
            else ["copy", "tablestat", "full"])
FORCE_R = int(sys.argv[6]) if len(sys.argv) > 6 else 0
FORCE_CB = int(sys.argv[7]) if len(sys.argv) > 7 else 0  # channel block



def variant_core(variant, dt, y0, x0, u, v, ext, *, h_phys, w_phys,
                 r, hd, d, d_x, c, wt, win=None):
    he = r + 2 * hd
    wext = ext.shape[2]
    wd = (wext - wt) // 2

    if variant == "copy":
        return ext[:, hd:hd + r, :wt] + u[None, :, :wt] * 0 + v[None, :, :wt] * 0

    ys_i = jax.lax.broadcasted_iota(jnp.int32, (r, wt), 0) + y0
    xs_i = jax.lax.broadcasted_iota(jnp.int32, (r, wt), 1) + x0
    ys_f = ys_i.astype(jnp.float32)
    xs_f = xs_i.astype(jnp.float32)
    px = xs_f - dt * u
    py = ys_f - dt * v
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
    if variant in ("smemwin", "hybrid", "hybrid1s", "tabledy", "tablestat"):
        # window scalars arrive from SMEM (computed outside by XLA):
        # dynamic loops + dynamic rolls kept, no in-kernel reduce for them
        dylo, dyhi, gxlo, gxhi = win[0], win[1], win[2], win[3]
    elif variant == "fullf32":
        # hypothesis: i32 horizontal reductions lower poorly; reduce the f32
        # twins and convert the scalar (dy/dx are small exact ints in f32)
        dylo = jnp.min(dy1.astype(jnp.float32)).astype(jnp.int32)
        dyhi = jnp.max(dy2.astype(jnp.float32)).astype(jnp.int32)
    else:
        dylo = jnp.minimum(jnp.min(dy1), jnp.min(dy2))
        dyhi = jnp.maximum(jnp.max(dy1), jnp.max(dy2))
        if variant == "globaldx":
            gxlo = jnp.min(dx1)
            gxhi = jnp.max(dx2)

    if variant == "static9":
        # fully static unrolled 3x3 stencil: no dynamic rolls, no dynamic
        # trip counts — valid only when the realized window is within
        # [-1,1]^2 (quiet flows).  Wrapped columns are masked by wx exactly
        # like the flat kernel's wrap semantics.
        acc = jnp.zeros((c, r, wt), jnp.float32)
        for dy in (-1, 0, 1):
            wy = (jnp.where(dy1 == dy, 1.0 - ty, 0.0)
                  + jnp.where(dy2 == dy, ty, 0.0))
            rows = ext[:, hd + dy:hd + dy + r, :]
            for dx in (-1, 0, 1):
                wx = (jnp.where(dx1 == dx, 1.0 - tx, 0.0)
                      + jnp.where(dx2 == dx, tx, 0.0))
                sh = (wd + dx) % wext
                cols = (rows if sh == 0 else
                        jnp.concatenate([rows[:, :, sh:], rows[:, :, :sh]],
                                        axis=2))
                acc = acc + (wx * wy)[None] * cols[:, :, :wt]
        return acc

    if variant == "setup":
        # touch every setup product so nothing DCEs; one extra plane op
        mark = (tx + ty + (dx1 + dx2 + dylo).astype(jnp.float32)
                + (dy1 + dy2 + dyhi).astype(jnp.float32))
        return ext[:, hd:hd + r, :wt] + mark[None]

    def dy_body_fixed(dy, acc):
        wy = (jnp.where(dy1 == dy, 1.0 - ty, 0.0)
              + jnp.where(dy2 == dy, ty, 0.0))
        core = pltpu.roll(ext, jnp.mod(he - dy, he), axis=1)[:, hd:hd + r, :]

        def dx_body(dx, carry):
            acc, rcur = carry
            wx = (jnp.where(dx1 == dx, 1.0 - tx, 0.0)
                  + jnp.where(dx2 == dx, tx, 0.0))
            acc = acc + (wx * wy)[None] * rcur[:, :, :wt]
            return acc, pltpu.roll(rcur, wext - 1, axis=2)

        r0 = pltpu.roll(core, jnp.mod(wext - wd + 1, wext), axis=2)
        acc, _ = jax.lax.fori_loop(-1, 2, dx_body, (acc, r0))
        return acc

    def dy_body_full(dy, acc):
        wy = (jnp.where(dy1 == dy, 1.0 - ty, 0.0)
              + jnp.where(dy2 == dy, ty, 0.0))
        active = (dy1 == dy) | (dy2 == dy)
        dxlo = jnp.min(jnp.where(active, dx1, d_x))
        dxhi = jnp.max(jnp.where(active, dx2, -d_x))
        core = pltpu.roll(ext, jnp.mod(he - dy, he), axis=1)[:, hd:hd + r, :]

        def dx_body(dx, carry):
            acc, rcur = carry
            wx = (jnp.where(dx1 == dx, 1.0 - tx, 0.0)
                  + jnp.where(dx2 == dx, tx, 0.0))
            acc = acc + (wx * wy)[None] * rcur[:, :, :wt]
            return acc, pltpu.roll(rcur, wext - 1, axis=2)

        r0 = pltpu.roll(core, jnp.mod(wext - wd - dxlo, wext), axis=2)
        acc, _ = jax.lax.fori_loop(dxlo, dxhi + 1, dx_body, (acc, r0))
        return acc

    def dy_body_gwin(dy, acc):
        # per-dy reductions removed: every dy sweeps the same global window
        wy = (jnp.where(dy1 == dy, 1.0 - ty, 0.0)
              + jnp.where(dy2 == dy, ty, 0.0))
        core = pltpu.roll(ext, jnp.mod(he - dy, he), axis=1)[:, hd:hd + r, :]

        def dx_body(dx, carry):
            acc, rcur = carry
            wx = (jnp.where(dx1 == dx, 1.0 - tx, 0.0)
                  + jnp.where(dx2 == dx, tx, 0.0))
            acc = acc + (wx * wy)[None] * rcur[:, :, :wt]
            return acc, pltpu.roll(rcur, wext - 1, axis=2)

        r0 = pltpu.roll(core, jnp.mod(wext - wd - gxlo, wext), axis=2)
        acc, _ = jax.lax.fori_loop(gxlo, gxhi + 1, dx_body, (acc, r0))
        return acc

    def dy_body_1s(dy, acc):
        # ONE stacked reduction per dy -> (2,1) vector, two static extracts:
        # tests whether the stall is per-reduction or per vector->sreg drain
        wy = (jnp.where(dy1 == dy, 1.0 - ty, 0.0)
              + jnp.where(dy2 == dy, ty, 0.0))
        active = (dy1 == dy) | (dy2 == dy)
        both = jnp.stack([jnp.where(active, -dx1, -d_x),
                          jnp.where(active, dx2, -d_x)])
        red = jnp.max(both, axis=(1, 2))  # [-dxlo, dxhi]
        dxlo = -red[0]
        dxhi = red[1]
        core = pltpu.roll(ext, jnp.mod(he - dy, he), axis=1)[:, hd:hd + r, :]

        def dx_body(dx, carry):
            acc, rcur = carry
            wx = (jnp.where(dx1 == dx, 1.0 - tx, 0.0)
                  + jnp.where(dx2 == dx, tx, 0.0))
            acc = acc + (wx * wy)[None] * rcur[:, :, :wt]
            return acc, pltpu.roll(rcur, wext - 1, axis=2)

        r0 = pltpu.roll(core, jnp.mod(wext - wd - dxlo, wext), axis=2)
        acc, _ = jax.lax.fori_loop(dxlo, dxhi + 1, dx_body, (acc, r0))
        return acc

    def dy_body_inc(dy, carry):
        # isolation variant: DYNAMIC trip counts but NO dynamic rolls in the
        # body — ``work`` is carried pre-rolled and advanced by a STATIC
        # single-row roll each iteration.  dx inner is the fixed [-1,1]
        # static window (quiet-regime only, like ``fixed``).
        acc, work = carry
        wy = (jnp.where(dy1 == dy, 1.0 - ty, 0.0)
              + jnp.where(dy2 == dy, ty, 0.0))
        core = work[:, hd:hd + r, :]

        def dx_body(dx, c2):
            acc, rcur = c2
            wx = (jnp.where(dx1 == dx, 1.0 - tx, 0.0)
                  + jnp.where(dx2 == dx, tx, 0.0))
            acc = acc + (wx * wy)[None] * rcur[:, :, :wt]
            return acc, pltpu.roll(rcur, wext - 1, axis=2)

        r0 = pltpu.roll(core, jnp.mod(wext - wd + 1, wext), axis=2)
        acc, _ = jax.lax.fori_loop(-1, 2, dx_body, (acc, r0))
        return acc, pltpu.roll(work, he - 1, axis=1)

    def dy_body_incfull(dy, carry):
        # PRODUCTION semantics (dynamic per-dy dx windows) with the dy roll
        # advanced incrementally: one dynamic row-align roll per program,
        # then a STATIC single-row roll per dy — tests whether arbitrary
        # dynamic sublane rotates cost more than static-by-1 ones at equal
        # moved volume (r4 candidate for the driven roll share)
        acc, work = carry
        wy = (jnp.where(dy1 == dy, 1.0 - ty, 0.0)
              + jnp.where(dy2 == dy, ty, 0.0))
        active = (dy1 == dy) | (dy2 == dy)
        dxlo = jnp.min(jnp.where(active, dx1, d_x))
        dxhi = jnp.max(jnp.where(active, dx2, -d_x))
        core = work[:, hd:hd + r, :]

        def dx_body(dx, c2):
            acc, rcur = c2
            wx = (jnp.where(dx1 == dx, 1.0 - tx, 0.0)
                  + jnp.where(dx2 == dx, tx, 0.0))
            acc = acc + (wx * wy)[None] * rcur[:, :, :wt]
            return acc, pltpu.roll(rcur, wext - 1, axis=2)

        r0 = pltpu.roll(core, jnp.mod(wext - wd - dxlo, wext), axis=2)
        acc, _ = jax.lax.fori_loop(dxlo, dxhi + 1, dx_body, (acc, r0))
        return acc, pltpu.roll(work, he - 1, axis=1)

    def dy_body_f32(dy, acc):
        wy = (jnp.where(dy1 == dy, 1.0 - ty, 0.0)
              + jnp.where(dy2 == dy, ty, 0.0))
        active = (dy1 == dy) | (dy2 == dy)
        dxlo = jnp.min(jnp.where(active, dx1, d_x).astype(jnp.float32)
                       ).astype(jnp.int32)
        dxhi = jnp.max(jnp.where(active, dx2, -d_x).astype(jnp.float32)
                       ).astype(jnp.int32)
        core = pltpu.roll(ext, jnp.mod(he - dy, he), axis=1)[:, hd:hd + r, :]

        def dx_body(dx, carry):
            acc, rcur = carry
            wx = (jnp.where(dx1 == dx, 1.0 - tx, 0.0)
                  + jnp.where(dx2 == dx, tx, 0.0))
            acc = acc + (wx * wy)[None] * rcur[:, :, :wt]
            return acc, pltpu.roll(rcur, wext - 1, axis=2)

        r0 = pltpu.roll(core, jnp.mod(wext - wd - dxlo, wext), axis=2)
        acc, _ = jax.lax.fori_loop(dxlo, dxhi + 1, dx_body, (acc, r0))
        return acc

    z = jnp.zeros((c, r, wt), jnp.float32)
    if variant == "packed":
        # bf16-pack dye channels 0,1 into one i32 plane (bf16 = top 16 bits
        # of f32, rounded by +0x8000 truncation); channel 2 rides bitcast
        # i32 at full precision.  ALL rolls then move a (2, he, wext) i32
        # stack instead of (3, he, wext) f32 — 2/3 the roll volume for the
        # op class that measured 49% of the dye kernel (roll_share_probe).
        # Taps unpack with mask/shift + bitcast (cheap elementwise VPU) and
        # FMA in f32; accuracy cost is bf16 storage of 2 channels' taps
        # (~2^-8 relative) — candidate opt-in fast mode only.
        assert c == 3
        m = jnp.int32(-65536)  # 0xFFFF0000
        b0 = pltpu.bitcast(ext[0], jnp.int32)
        b1 = pltpu.bitcast(ext[1], jnp.int32)
        pk = ((b0 + 0x8000) & m) | jax.lax.shift_right_logical(
            b1 + 0x8000, 16)
        pext = jnp.stack([pk, pltpu.bitcast(ext[2], jnp.int32)])

        def dy_body_packed(dy, acc):
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

        return jax.lax.fori_loop(dylo, dyhi + 1, dy_body_packed, z)
    if variant == "xpose":
        # Transposed loop order: OUTER over x offsets (static single-lane
        # advance rolls), INNER over each dx's realized dy chord (sublane
        # rolls).  Motivation: roll_share_probe measured lane rolls ~3x the
        # cost of sublane rolls at similar volume; this moves the O(area)
        # roll count from lanes to sublanes at the price of rolling he rows
        # instead of r in the inner loop.
        gxlo = jnp.minimum(jnp.min(dx1), jnp.min(dx2))
        gxhi = jnp.maximum(jnp.max(dx1), jnp.max(dx2))

        def dx_outer(dx, carry):
            acc, cur = carry
            wx = (jnp.where(dx1 == dx, 1.0 - tx, 0.0)
                  + jnp.where(dx2 == dx, tx, 0.0))
            active = (dx1 == dx) | (dx2 == dx)
            dylo_ = jnp.min(jnp.where(active, dy1, d))
            dyhi_ = jnp.max(jnp.where(active, dy2, -d))
            rcur0 = pltpu.roll(cur, jnp.mod(he - dylo_, he), axis=1)

            def dy_inner(dy, c2):
                acc, rr = c2
                wy = (jnp.where(dy1 == dy, 1.0 - ty, 0.0)
                      + jnp.where(dy2 == dy, ty, 0.0))
                acc = acc + (wx * wy)[None] * rr[:, hd:hd + r, :wt]
                return acc, pltpu.roll(rr, he - 1, axis=1)

            acc, _ = jax.lax.fori_loop(dylo_, dyhi_ + 1, dy_inner,
                                       (acc, rcur0))
            return acc, pltpu.roll(cur, wext - 1, axis=2)

        cur0 = pltpu.roll(ext, jnp.mod(wext - wd - gxlo, wext), axis=2)
        acc, _ = jax.lax.fori_loop(gxlo, gxhi + 1, dx_outer, (z, cur0))
        return acc
    if variant == "zigzag":
        # Candidate production design: per-strip GLOBAL x window swept
        # boustrophedon, so the only dynamic rolls are the two initial
        # alignment rolls; every in-loop roll is a static +/-1 shift.
        # Row pairs: even row sweeps dx forward, odd row sweeps backward.
        gxlo = jnp.min(dx1)
        gxhi = jnp.max(dx2)
        n_gx = gxhi - gxlo + 1
        n_pairs = (dyhi - dylo + 2) // 2
        work0 = pltpu.roll(ext, jnp.mod(he - dylo, he), axis=1)
        cur0 = pltpu.roll(work0, jnp.mod(wext - wd - gxlo, wext), axis=2)

        def wyof(dy):
            return (jnp.where(dy1 == dy, 1.0 - ty, 0.0)
                    + jnp.where(dy2 == dy, ty, 0.0))

        def wxof(dx):
            return (jnp.where(dx1 == dx, 1.0 - tx, 0.0)
                    + jnp.where(dx2 == dx, tx, 0.0))

        def pair_body(i, carry):
            acc, cur = carry
            dy_f = dylo + 2 * i
            wy_f = wyof(dy_f)

            def fwd(t, c2):
                a, cu = c2
                a = a + (wxof(gxlo + t) * wy_f)[None] * cu[:, hd:hd + r, :wt]
                return a, pltpu.roll(cu, wext - 1, axis=2)

            acc, cur = jax.lax.fori_loop(0, n_gx, fwd, (acc, cur))
            # lane alignment now gxhi+1; advance one row, sweep back
            cur = pltpu.roll(cur, he - 1, axis=1)
            wy_b = wyof(dy_f + 1)

            def bwd(t, c2):
                a, cu = c2
                cu = pltpu.roll(cu, 1, axis=2)
                a = a + (wxof(gxhi - t) * wy_b)[None] * cu[:, hd:hd + r, :wt]
                return a, cu

            acc, cur = jax.lax.fori_loop(0, n_gx, bwd, (acc, cur))
            # lane alignment back at gxlo; advance to the next pair's row
            return acc, pltpu.roll(cur, he - 1, axis=1)

        acc, _ = jax.lax.fori_loop(0, n_pairs, pair_body, (z, cur0))
        return acc
    if variant == "incdy":
        # one dynamic roll per program (align row hd onto dy=dylo), then the
        # dy loop advances with static rolls only
        work0 = pltpu.roll(ext, jnp.mod(he - dylo, he), axis=1)
        acc, _ = jax.lax.fori_loop(dylo, dyhi + 1, dy_body_inc, (z, work0))
        return acc
    if variant == "incfull":
        work0 = pltpu.roll(ext, jnp.mod(he - dylo, he), axis=1)
        acc, _ = jax.lax.fori_loop(dylo, dyhi + 1, dy_body_incfull,
                                   (z, work0))
        return acc
    if variant == "fixed":
        return jax.lax.fori_loop(-1, 2, dy_body_fixed, z)
    if variant in ("globaldx", "smemwin", "tabledy"):
        return jax.lax.fori_loop(dylo, dyhi + 1, dy_body_gwin, z)
    if variant == "fullf32":
        return jax.lax.fori_loop(dylo, dyhi + 1, dy_body_f32, z)
    if variant == "hybrid1s":
        return jax.lax.fori_loop(dylo, dyhi + 1, dy_body_1s, z)
    return jax.lax.fori_loop(dylo, dyhi + 1, dy_body_full, z)


def make_advect(variant, c, h, w, d):
    hd = ap._halo(d)
    hp, wp, r, cb = ap._pad_geometry(h, w, c, hd)
    if FORCE_R:
        r = FORCE_R
        assert r % hd == 0, (r, hd)
        hp = -(-h // r) * r
    if FORCE_CB:
        cb = FORCE_CB  # bypass the planner (packed variants shrink VMEM)
    n_strips = hp // r
    hblk = hp // hd
    c_grid = c // cb

    def kern(dt_ref, u_ref, v_ref, fm, fl, fh, out):
        i = pl.program_id(1)
        ext = jnp.concatenate([fl[:], fm[:], fh[:]], axis=1)
        out[...] = variant_core(
            variant, dt_ref[0, 0], i * r, 0, u_ref[:], v_ref[:], ext,
            h_phys=h, w_phys=w, r=r, hd=hd, d=d, d_x=wp - 1, c=cb, wt=wp)

    vm = pltpu.VMEM
    plane = pl.BlockSpec((1 * r, wp), lambda ci, i, *_: (i, 0), memory_space=vm)
    mid = pl.BlockSpec((cb, r, wp), lambda ci, i, *_: (ci, i, 0), memory_space=vm)
    lo = pl.BlockSpec((cb, hd, wp),
                      lambda ci, i, *_: (ci, jnp.maximum(i * (r // hd) - 1, 0), 0),
                      memory_space=vm)
    hi = pl.BlockSpec((cb, hd, wp),
                      lambda ci, i, *_: (ci, jnp.minimum((i + 1) * (r // hd), hblk - 1), 0),
                      memory_space=vm)
    smem = pl.BlockSpec((1, 1), lambda ci, i, *_: (0, 0), memory_space=pltpu.SMEM)

    if variant == "tablestat":
        # per-strip window row delivered as an SMEM BLOCK by the index map:
        # STATIC scalar reads in-kernel (the cheap class), per-strip bounds
        def kern_ts(dt_ref, win_ref, u_ref, v_ref, fm, fl, fh, out):
            i = pl.program_id(1)
            ext = jnp.concatenate([fl[:], fm[:], fh[:]], axis=1)
            win = (win_ref[0, 0, 0], win_ref[0, 0, 1],
                   win_ref[0, 0, 2], win_ref[0, 0, 3])
            out[...] = variant_core(
                variant, dt_ref[0, 0], i * r, 0, u_ref[:], v_ref[:], ext,
                h_phys=h, w_phys=w, r=r, hd=hd, d=d, d_x=wp - 1, c=cb, wt=wp,
                win=win)

        smemt = pl.BlockSpec((1, 1, 4), lambda ci, i: (i, 0, 0),
                             memory_space=pltpu.SMEM)
        call = pl.pallas_call(
            kern_ts,
            out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
            grid=(c_grid, n_strips),
            in_specs=[smem, smemt, plane, plane, mid, lo, hi],
            out_specs=mid,
            interpret=ap._interpret(),
        )
    elif variant in ("smemwin", "tabledy", "hybrid"):
        # scalar-prefetch: the window table is prefetched once for the whole
        # grid; per-strip values read by dynamic scalar index (the sanctioned
        # pattern for data-driven index maps)
        def kern_pf(win_ref, dt_ref, u_ref, v_ref, fm, fl, fh, out):
            i = pl.program_id(1)
            ext = jnp.concatenate([fl[:], fm[:], fh[:]], axis=1)
            win = (win_ref[i, 0], win_ref[i, 1], win_ref[i, 2], win_ref[i, 3])
            out[...] = variant_core(
                variant, dt_ref[0, 0], i * r, 0, u_ref[:], v_ref[:], ext,
                h_phys=h, w_phys=w, r=r, hd=hd, d=d, d_x=wp - 1, c=cb, wt=wp,
                win=win)

        call = pl.pallas_call(
            kern_pf,
            out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(c_grid, n_strips),
                in_specs=[smem, plane, plane, mid, lo, hi],
                out_specs=mid,
            ),
            interpret=ap._interpret(),
        )
    else:
        call = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
            grid=(c_grid, n_strips),
            in_specs=[smem, plane, plane, mid, lo, hi],
            out_specs=mid,
            interpret=ap._interpret(),
        )

    def win_table(ui, vi, dt):
        """Per-strip exact window bounds, kernel clip semantics, one XLA
        pass over the padded u/v planes."""
        ys = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
        y1 = jnp.trunc(ys.astype(jnp.float32) - dt * vi)
        x1 = jnp.trunc(xs.astype(jnp.float32) - dt * ui)
        dy1 = jnp.clip(jnp.clip(y1, 0, h - 1).astype(jnp.int32) - ys, -d, d)
        dy2 = jnp.clip(jnp.clip(y1 + 1, 0, h - 1).astype(jnp.int32) - ys,
                       -d, d)
        dx1 = jnp.clip(jnp.clip(x1, 0, w - 1).astype(jnp.int32) - xs,
                       -(wp - 1), wp - 1)
        dx2 = jnp.clip(jnp.clip(x1 + 1, 0, w - 1).astype(jnp.int32) - xs,
                       -(wp - 1), wp - 1)
        if variant in ("hybrid", "hybrid1s", "tabledy", "smemwin",
                       "tablestat"):
            s = (n_strips, r, wp)
            t = jnp.stack([
                jnp.min(dy1.reshape(s), axis=(1, 2)),
                jnp.max(dy2.reshape(s), axis=(1, 2)),
                jnp.min(dx1.reshape(s), axis=(1, 2)),
                jnp.max(dx2.reshape(s), axis=(1, 2)),
            ], axis=1)
            if variant == "tablestat":
                return t[:, None, :]
            return t
        glob = jnp.stack([jnp.min(dy1), jnp.max(dy2),
                          jnp.min(dx1), jnp.max(dx2)])
        return jnp.broadcast_to(glob[None, :], (n_strips, 4))

    def fn(f, u, v, dt):
        pad = [(0, hp - h), (0, wp - w)]
        fi = jnp.pad(f, [(0, 0)] + pad)
        ui = jnp.pad(u, pad)
        vi = jnp.pad(v, pad)
        dt_arr = jnp.asarray(dt, jnp.float32).reshape(1, 1)
        if variant == "tablestat":
            win = win_table(ui, vi, dt)
            return call(dt_arr, win, ui, vi, fi, fi, fi)[:, :h, :w]
        if variant in ("smemwin", "tabledy", "hybrid"):
            win = win_table(ui, vi, dt)
            return call(win, dt_arr, ui, vi, fi, fi, fi)[:, :h, :w]
        return call(dt_arr, ui, vi, fi, fi, fi)[:, :h, :w]

    return fn, (r, hd, cb, hp, wp, n_strips * c_grid)


def delta_time(fn, args, n_short=20, n_long=80):
    def make(k):
        @jax.jit
        def run(f, u, v, dt):
            def body(c, _):
                return fn(c, u, v, dt), None
            c, _ = jax.lax.scan(body, f, None, length=k)
            return c[0, 0, 0]
        return run

    short, long_ = make(n_short), make(n_long)
    float(short(*args)); float(long_(*args))

    def t(g):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(long_) - t(short)) / (n_long - n_short) * 1e3


def flow(h, w, speed):
    ky = jnp.pi / h
    kx = jnp.pi / w
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    u = speed * jnp.sin(ky * ys) * jnp.cos(kx * xs)
    v = -speed * jnp.cos(ky * ys) * jnp.sin(kx * xs)
    return u, v


print(f"== advect anatomy {nx}x{ny} c={C} d={D} ==", flush=True)
f = jax.random.uniform(jax.random.PRNGKey(0), (C, ny, nx), jnp.float32)
dt = 0.25
for regime, speed in (("quiet", 0.5), ("driven", float(D) * 0.7 / dt)):
    u, v = flow(ny, nx, speed)
    print(f"-- {regime}: max |v|*dt = {float(jnp.max(jnp.abs(v)))*dt:.2f} "
          f"cells --", flush=True)
    outs = {}
    for variant in VARIANTS:
        if regime == "driven" and variant == "fixed":
            continue  # fixed windows are only meaningful when flow < 1 cell
        jax.clear_caches()
        fn, geo = make_advect(variant, C, ny, nx, D)
        if variant in ("zigzag", "xpose", "packed", "full", "incfull"):
            outs[variant] = jax.device_get(jax.jit(fn)(f, u, v, dt))
        ms = delta_time(fn, (f, u, v, dt))
        print(f"  {variant:6s}: {ms:7.3f} ms   (r={geo[0]}, hd={geo[1]}, "
              f"cb={geo[2]}, grid={geo[3]}x{geo[4]}, programs={geo[5]})",
              flush=True)
    if "full" in outs and len(outs) >= 2:
        import numpy as np
        for k in outs:
            if k == "full":
                continue
            d_ = float(np.max(np.abs(outs[k] - outs["full"])))
            print(f"  max|{k}-full| = {d_:.3e}", flush=True)
    # library call for cross-check
    jax.clear_caches()
    lib = functools.partial(ap.advect, decay_rate=0.1, mode="dye", d=D)
    ms = delta_time(lambda ff, uu, vv, ddt: lib(ff, uu, vv, ddt), (f, u, v, dt))
    print(f"  lib   : {ms:7.3f} ms", flush=True)
