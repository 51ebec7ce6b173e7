"""Driven-advect floor model: realized window/chord volumes -> predicted ms.

The dynamic-window core's work per strip is (see ops/advect_pallas.py
_advect_core):

    per dy in [dylo, dyhi]:   1 roll of the (c, he, w) ext      [dy roll]
                              1 roll of the (c, r, w) core      [align roll]
    per dx in the dy's chord: 1 weight-build + FMA pass (r, w)  [acc]
                              1 single-lane roll (c, r, w)      [step roll]

This script computes those volumes EXACTLY from a realized flow (the same
per-strip windows and per-dy chords the kernel's reductions produce,
host-side numpy), converts them to time via the measured VPU element rate,
and prints them next to the ESSENTIAL tap floor (every output cell needs 4
taps + its weights: ~6 (r, w) passes total, window-independent) and the DMA
floor (read fields+velocity, write fields).  The gap between model and the
essential floor is the price of gather-free advection; the gap between
measured (scripts/advect_anatomy_probe.py `full` row) and the model is
implementation inefficiency.

Flows: the anatomy probe's swirl (peak |v|dt = 0.7 d) and the REAL
bench.py driven orbit flow after 60 steps.

    python scripts/advect_floor_model.py [N [D]]
"""
import json
import sys

sys.path.insert(0, ".")
import numpy as np  # noqa: E402

# measured rates (BASELINE.md roofline, v5e-1)
VPU_ELEMS_PER_MS = 1.2e9  # ~1.2 T elem/s elementwise f32
DMA_BYTES_PER_MS = 0.3e9  # ~0.3 GB/ms effective streaming, both directions


def window_volumes(u, v, dt, d, c, label):
    from cudafluidsimulation_tpu.ops import advect_pallas as ap

    h, w = u.shape
    hd = ap._halo(d)
    plan = ap._tile_plan(h, w, c, d)
    if plan is not None:
        # production path at this geometry is column-tiled: per-(strip,
        # tile) windows, x taps bounded at d (chords clamp to [-d, d])
        wt, wd_, t_cnt, r, cb = plan
        hp = -(-h // r) * r
        wp = wt * t_cnt
        x_bound = d
        wrow = wt + 2 * wd_  # the rolled ext row width per tile
    else:
        hp, wp, r, cb = ap._pad_geometry(h, w, c, hd)
        wt, t_cnt = wp, 1
        x_bound = wp - 1
        wrow = wp
    he = r + 2 * hd
    pad = [(0, hp - h), (0, wp - w)]
    ui, vi = np.pad(u, pad), np.pad(v, pad)

    ys = np.arange(hp, dtype=np.int32)[:, None]
    xs = np.arange(wp, dtype=np.int32)[None, :]
    y1 = np.trunc(ys.astype(np.float32) - dt * vi)
    x1 = np.trunc(xs.astype(np.float32) - dt * ui)
    dy1 = np.clip(np.clip(y1, 0, h - 1).astype(np.int32) - ys, -d, d)
    dy2 = np.clip(np.clip(y1 + 1, 0, h - 1).astype(np.int32) - ys, -d, d)
    dx1 = np.clip(np.clip(x1, 0, w - 1).astype(np.int32) - xs,
                  -x_bound, x_bound)
    dx2 = np.clip(np.clip(x1 + 1, 0, w - 1).astype(np.int32) - xs,
                  -x_bound, x_bound)

    n_strips = hp // r
    dyroll = align = acc = 0  # element volumes (x c where channel-scaled)
    window_rows = chord_total = 0
    for s in range(n_strips):
        for t in range(t_cnt):
            sl = (slice(s * r, (s + 1) * r), slice(t * wt, (t + 1) * wt))
            sdy1, sdy2 = dy1[sl], dy2[sl]
            sdx1, sdx2 = dx1[sl], dx2[sl]
            lo, hi = int(sdy1.min()), int(sdy2.max())
            window_rows += hi - lo + 1
            for dy in range(lo, hi + 1):
                active = (sdy1 == dy) | (sdy2 == dy)
                if not active.any():
                    dyroll += c * he * wrow  # fori still rolls empty dys
                    align += c * r * wrow
                    continue
                cxlo = int(sdx1[active].min())
                cxhi = int(sdx2[active].max())
                chord = cxhi - cxlo + 1
                chord_total += chord
                dyroll += c * he * wrow
                # align roll + wy build (2 cmp + 2 sel + add) + 2 window
                # reductions + active mask
                align += c * r * wrow + 9 * r * wt
                # per dx step: wx build (2 cmp + 2 sel + add = 5 passes of
                # (r, wt)) + weight mul (1) + fma (c) + step roll (c, wrow)
                acc += chord * ((6 + c) * r * wt + c * r * wrow)

    total = dyroll + align + acc
    essential = 6 * c * hp * wp  # 4 taps + weights, window-independent
    dma = (2 * c + 2) * hp * wp * 4  # read c + write c + read u,v (bytes)
    out = {
        "flow": label, "grid": [h, w], "d": d, "c": c,
        "r": r, "hd": hd, "tiled": plan is not None,
        "programs": n_strips * t_cnt,
        "mean_dy_window": round(window_rows / (n_strips * t_cnt), 1),
        "mean_chord": round(chord_total / max(1, window_rows), 1),
        "dyroll_Gelem": round(dyroll / 1e9, 2),
        "align_Gelem": round(align / 1e9, 2),
        "acc_Gelem": round(acc / 1e9, 2),
        "model_ms": round(total / VPU_ELEMS_PER_MS, 2),
        "essential_ms": round(essential / VPU_ELEMS_PER_MS, 3),
        "dma_ms": round(dma / DMA_BYTES_PER_MS, 3),
        "sweep_vs_essential": round(total / essential, 1),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 31

    # 1. the anatomy probe's swirl at its driven speed
    dt = 0.25
    speed = d * 0.7 / dt
    ky, kx = np.pi / n, np.pi / n
    ys = np.arange(n, dtype=np.float32)[:, None]
    xs = np.arange(n, dtype=np.float32)[None, :]
    u = speed * np.sin(ky * ys) * np.cos(kx * xs)
    v = -speed * np.cos(ky * ys) * np.sin(kx * xs)
    window_volumes(u, v, dt, d, 3, "anatomy-swirl (|v|dt<=%.1f)" % (d * 0.7))

    # 2. the real bench flow (60 driven orbit steps of the production sim)
    import jax

    from cudafluidsimulation_tpu import FluidConfig, Simulation
    from cudafluidsimulation_tpu.utils.impulse import orbit_impulse

    cfg = FluidConfig.gpu_reference(nx=n, ny=n, backend="auto",
                                    max_displacement=d)
    sim = Simulation(cfg)
    # steady state: bench.py's realized_max_displacement (21.6 cells) is
    # reached only after a few hundred driven steps — step 60 still has
    # ~3-row windows and would understate the production advect volume
    imp = orbit_impulse(300, cfg.dt, center=(n / 2, n / 2), radius=n / 8)
    st = jax.block_until_ready(sim.run(sim.init(), imp))
    u2, v2 = np.asarray(st.u), np.asarray(st.v)
    window_volumes(u2, v2, float(cfg.dt), d, 3, "bench-orbit@300")
    window_volumes(u2, v2, float(cfg.dt), d, 2, "bench-orbit@300 (velocity)")


if __name__ == "__main__":
    main()
