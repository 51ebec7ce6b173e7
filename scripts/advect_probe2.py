"""Delta-timed advect geometry probe: flat vs column-tiled, budget sweeps.

Usage: python scripts/advect_probe2.py [case ...] (from the repo root;
expects a driven 2048^2 field at /tmp/vf/big.npz — generate with
`python -m cudafluidsimulation_tpu.cli --grid 2048 --steps 300 --impulse
orbit --save-fields /tmp/vf/big.npz`).

Cases: v15 v31 d15 d31 (velocity/dye at d) on 2048^2, plus w8192
(upsampled 8192^2 velocity+dye).  Each case times the flat kernel AND any
tile plan, plus explicit (wt, budget) variants, as a jitted lax.scan delta
(two scan lengths subtracted, sync via host transfer) so the tunnel's
dispatch latency cancels.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from cudafluidsimulation_tpu.ops import advect_pallas as ap  # noqa: E402

try:
    z = np.load("/tmp/vf/big.npz")
    u2k = jnp.asarray(z["u"])
    v2k = jnp.asarray(z["v"])
    dye2k = jnp.asarray(z["dye"])
    print("field: /tmp/vf/big.npz (driven)")
except OSError:
    # synthetic driven-like flow: solid-body vortex peaking at |v|*dt ~ 22
    # cells (the benchmark flow's realized displacement) + noise so the
    # per-strip windows resemble the real run
    n = 2048
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float32)
    cy = cx = n / 2
    r = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2) + 1e-3
    taper = np.exp(-((r - n / 8) / (n / 6)) ** 2)  # fast ring like the orbit
    speed = 22.0 * 60.0 * taper
    rng = np.random.default_rng(0)
    u2k = jnp.asarray(-(yy - cy) / r * speed
                      + rng.standard_normal((n, n)).astype(np.float32) * 20)
    v2k = jnp.asarray((xx - cx) / r * speed
                      + rng.standard_normal((n, n)).astype(np.float32) * 20)
    dye2k = jnp.asarray(rng.random((3, n, n), dtype=np.float32))
    print("field: synthetic vortex (peak |v|dt ~22)")
dt = 1.0 / 60.0


def delta_time(fn, *args, n_short=3, n_long=13):
    def make(n):
        @jax.jit
        def run(f0, *rest):
            def body(f, _):
                y = fn(f, *rest)
                return f0 + 1e-30 * y, None

            f, _ = jax.lax.scan(body, f0, None, length=n)
            return jnp.sum(f)

        return run

    short, long_ = make(n_short), make(n_long)

    def t(g, *a):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    float(short(*args)); float(long_(*args))  # compile
    return (t(long_, *args) - t(short, *args)) / (n_long - n_short) * 1e3


def probe(label, fields, u, v, mode, d, plan):
    try:
        if plan == "flat":
            c, h, w = fields.shape
            def fn(f, uu, vv):
                return ap._advect_flat(f, uu, vv, dt, 1.2, mode, d, 0, h, 0, w, 0)
        else:
            c, h, w = fields.shape
            def fn(f, uu, vv):
                return ap._advect_tiled(f, uu, vv, dt, 1.2, mode, d, 0, h, 0,
                                        w, plan)
        ms = delta_time(fn, fields, u, v)
        print(f"{label}: {ms:7.3f} ms/call")
        return ms
    except Exception as e:
        print(f"{label}: FAILED ({type(e).__name__}: {str(e)[:120]})")
        return None


def tile_variants(h, w, c, d, wds=(128,)):
    """Explicit (wt, wd, T, r, cb) candidates that satisfy the constraints."""
    hd = ap._halo(d)
    out = []
    for wd in wds:
        lanes = w // 128
        for t_cnt in range(2, lanes + 1):
            if lanes % t_cnt:
                continue
            wt = w // t_cnt
            if wt % wd or wt < 2 * wd:
                continue
            try:
                _, _, r, cb = ap._pad_geometry(h, wt + 2 * wd, c, hd, wt=wt)
            except ValueError:
                continue
            out.append((wt, wd, t_cnt, r, cb))
    return out


cases = sys.argv[1:] or ["v31", "d31"]

# "q" prefix on any case probes the QUIET regime (velocities x0.01): the
# dynamic windows collapse, leaving the kernel's fixed per-cell cost
# (positions/weights, ext assembly, IO) — the ROADMAP #2 diagnosis target.
for case in cases:
    if case.startswith("q"):
        case = case[1:]
        u2k_c, v2k_c = u2k * 0.01, v2k * 0.01
    else:
        u2k_c, v2k_c = u2k, v2k
    if case == "v15":
        f, uu, vv, mode, d = jnp.stack([u2k_c, v2k_c]), u2k_c, v2k_c, "field", 15
    elif case == "v31":
        f, uu, vv, mode, d = jnp.stack([u2k_c, v2k_c]), u2k_c, v2k_c, "field", 31
    elif case == "d15":
        f, uu, vv, mode, d = dye2k, u2k_c, v2k_c, "dye", 15
    elif case == "d31":
        f, uu, vv, mode, d = dye2k, u2k_c, v2k_c, "dye", 31
    elif case == "w8192":
        # upsample the driven field 4x (same |v| -> same cell displacement)
        up = jnp.repeat(jnp.repeat(u2k_c, 4, 0), 4, 1)
        vp = jnp.repeat(jnp.repeat(v2k_c, 4, 0), 4, 1)
        for mode, d, f in (("field", 15, jnp.stack([up, vp])),
                           ("dye", 15, jnp.repeat(jnp.repeat(dye2k, 4, 1), 4, 2))):
            c, h, w = f.shape
            probe(f"8192 {mode} d={d} flat(auto)", f, up, vp, mode, d, "flat")
            plan = ap._tile_plan(h, w, c, d)
            if plan:
                probe(f"8192 {mode} d={d} tile(auto {plan})", f, up, vp, mode,
                      d, plan)
            for var in tile_variants(h, w, c, d):
                if var[0] in (512, 1024, 2048):
                    probe(f"8192 {mode} d={d} tile{var}", f, up, vp, mode, d,
                          var)
        continue
    elif case == "rollshare":
        # Upper bound for bf16-packed dye rolls (ROADMAP gap #3): re-time
        # the dye kernel with every pltpu.roll stubbed to identity (WRONG
        # numerics, identical loop/mask/FMA structure).  1 - t_noroll/t_base
        # is the roll share; bf16 packing could at best halve the rolls for
        # 2 of 3 dye channels, i.e. save ~share/3 of the dye kernel.
        import types

        f, uu, vv, mode, d = dye2k, u2k_c, v2k_c, "dye", 31
        c, h, w = f.shape
        base = probe("2048 dye31 flat  (rolls on)", f, uu, vv, mode, d, "flat")
        real = ap.pltpu
        ap.pltpu = types.SimpleNamespace(
            roll=lambda x, shift, axis: x, **{
                k: getattr(real, k) for k in ("VMEM", "SMEM")})
        try:
            noroll = probe("2048 dye31 flat  (rolls stubbed)", f, uu, vv,
                           mode, d, "flat")
        finally:
            ap.pltpu = real
        if base and noroll:
            print(f"roll share of dye kernel: {1 - noroll / base:.1%}")
        continue
    else:
        print(f"unknown case {case}")
        continue

    c, h, w = f.shape
    probe(f"2048 {case} flat(auto)", f, uu, vv, mode, d, "flat")
    plan = ap._tile_plan(h, w, c, d)
    if plan:
        probe(f"2048 {case} tile(auto {plan})", f, uu, vv, mode, d, plan)
    for var in tile_variants(h, w, c, d):
        if var[0] in (256, 512, 1024):
            probe(f"2048 {case} tile{var}", f, uu, vv, mode, d, var)
