"""Attribute the residual small-grid step cost (r3 verdict stretch #9).

At 960x540 the quiet step measures ~0.58 ms (fastpath_ab) while the advect
cores run at the copy floor and deep_burst already made launch count 4/step
— so where do the remaining ~0.5 ms go?  Three instruments, one session:

1. Stage scans at the quiet geometry, each at TWO iteration counts for the
   Jacobi stages (pressure 30/60, diffuse 20/40): the slope is the marginal
   per-sweep cost (compare to the 2048^2 in-VMEM ceiling of 235
   Gcell-sweeps/s = 2.2 us/sweep here), the intercept is the stage's fixed
   cost (launch + HBM trips + trapezoid halo work).
2. A chained-copy launch probe: scan bodies running k back-to-back pallas
   copies of one (540, 960) f32 plane (k = 1, 5, 9); the slope prices one
   launch + its 4.1 MB HBM round trip at this size, and a (8, 128) tile
   copy isolates pure dispatch.
3. The full quiet step, same session, to check the stage rows SUM.

Rules of the road: jax.clear_caches() between cases, host-transfer sync,
delta-timed scans (never single-call timings), best-of-3.

    python scripts/smallgrid_attrib.py [NX NY [SHORT LONG]]
"""
import json
import sys
import time

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from cudafluidsimulation_tpu import FluidConfig, Simulation  # noqa: E402
from cudafluidsimulation_tpu.ops import jacobi_pallas as jp  # noqa: E402
from cudafluidsimulation_tpu.ops.backend import get_ops  # noqa: E402
from cudafluidsimulation_tpu.utils.impulse import no_impulse  # noqa: E402

NX, NY = 960, 540
SHORT, LONG = 100, 400
if len(sys.argv) > 2:
    NX, NY = int(sys.argv[1]), int(sys.argv[2])
    if len(sys.argv) > 4:
        SHORT, LONG = int(sys.argv[3]), int(sys.argv[4])

CFG = FluidConfig.gpu_reference(nx=NX, ny=NY, backend="auto")
H, W = CFG.ny, CFG.nx  # arrays are (H, W)


def scan_ms(make_body, init_carry, n_short=SHORT, n_long=LONG):
    """Delta-timed ms per application of make_body()(carry) -> carry."""
    jax.clear_caches()
    body = make_body()

    def make(k):
        @jax.jit
        def run(c0):
            def f(c, _):
                return body(c), None

            c, _ = jax.lax.scan(f, c0, None, length=k)
            return jax.tree.leaves(c)[0].ravel()[0]

        return lambda: float(run(init_carry))

    short, long_ = make(n_short), make(n_long)
    short(); long_()  # compile

    def t(g):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            g()
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(long_) - t(short)) / (n_long - n_short) * 1e3


def zeros():
    z = jnp.zeros((H, W), jnp.float32)
    return z, z, jnp.zeros((3, H, W), jnp.float32), jnp.zeros(2, jnp.float32)


def main():
    u0, v0, dye0, vs0 = zeros()
    ops = get_ops(CFG)  # the SAME dispatch the pipeline runs (geometry
    # gates included — e.g. vorticity falls back to the XLA ref op at
    # 960x540 where 540 is not sublane-aligned)
    rows = {}

    # --- 1. stage scans (quiet flow: zero fields keep the static advect
    # fast path engaged and vorticity at zero — value-independent kernels,
    # so timings are representative of any quiet frame)
    def adv_vel():
        def body(c):
            u, v, vs = c
            u2, v2, vs2 = ops.advect_velocity(u, v, CFG.dt, CFG.decay_rate,
                                              vel_stats=vs,
                                              return_stats=True)
            return u2, v2, vs2

        return body

    rows["advect_velocity"] = scan_ms(adv_vel, (u0, v0, vs0))

    def adv_dye():
        def body(dye):
            return ops.advect_dye(dye, u0, v0, CFG.dt, CFG.decay_rate,
                                  vel_stats=vs0)

        return body

    rows["advect_dye"] = scan_ms(adv_dye, dye0)

    def vort():
        def body(c):
            return ops.vorticity_confinement_gpu(c[0], c[1], CFG.dt,
                                                 CFG.vorticity)

        return body

    rows["vorticity"] = scan_ms(vort, (u0, v0))

    coeffs = jnp.asarray([CFG.velocity_diffusion] * 2
                         + [CFG.color_diffusion] * 3, jnp.float32)
    amps0 = jnp.zeros(5, jnp.float32)
    last0 = jnp.zeros(2, jnp.float32)

    def diff(iters):
        def mk():
            def body(f5):
                return ops.diffuse_multi_splat(f5, CFG.dt, coeffs, iters,
                                               amps0, last0,
                                               CFG.splat_radius)

            return body

        return mk

    f50 = jnp.zeros((5, H, W), jnp.float32)
    it_d = CFG.diffusion_iters
    rows[f"diffuse_splat_{it_d}"] = scan_ms(diff(it_d), f50)
    rows[f"diffuse_splat_{2 * it_d}"] = scan_ms(diff(2 * it_d), f50)

    def press(iters):
        def mk():
            def body(c):
                u, v = c
                u2, v2, _p, _st = ops.pressure_project(
                    u, v, iters, CFG.half_divergence, return_stats=True)
                return u2, v2

            return body

        return mk

    it_p = CFG.pressure_iters
    rows[f"pressure_project_{it_p}"] = scan_ms(press(it_p), (u0, v0))
    rows[f"pressure_project_{2 * it_p}"] = scan_ms(press(2 * it_p), (u0, v0))

    # --- 2. chained-copy launch probe
    def copy_call(h, w):
        def kern(a, o):
            o[...] = a[...]

        bs = pl.BlockSpec((h, w), lambda: (0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(kern,
                              out_shape=jax.ShapeDtypeStruct((h, w),
                                                             jnp.float32),
                              in_specs=[bs], out_specs=bs,
                              interpret=jp._interpret())

    def chain(kk, h, w):
        cp = copy_call(h, w)

        def mk():
            def body(x):
                for _ in range(kk):
                    x = cp(x)
                return x

            return body

        return mk

    for kk in (1, 5, 9):
        rows[f"copy_chain_{kk}x_{H}x{W}"] = scan_ms(
            chain(kk, H, W), jnp.zeros((H, W), jnp.float32))
    for kk in (1, 9):
        rows[f"copy_chain_{kk}x_8x128"] = scan_ms(
            chain(kk, 8, 128), jnp.zeros((8, 128), jnp.float32))

    # --- 3. full quiet step, same session
    jax.clear_caches()
    sim = Simulation(CFG)
    st = sim.init()

    def full(k):
        imp = no_impulse(k, CFG.dt)

        @jax.jit
        def run(s):
            out = sim._jit_run(s, imp)
            return out.u[0, 0]

        return lambda: float(run(st))

    short, long_ = full(SHORT), full(LONG)
    short(); long_()

    def t(g):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            g()
            best = min(best, time.perf_counter() - t0)
        return best

    rows["full_quiet_step"] = (t(long_) - t(short)) / (LONG - SHORT) * 1e3

    # --- derived attribution
    out = {k: round(v, 4) for k, v in rows.items()}
    p1, p2 = rows[f"pressure_project_{it_p}"], rows[
        f"pressure_project_{2 * it_p}"]
    d1, d2 = rows[f"diffuse_splat_{it_d}"], rows[f"diffuse_splat_{2 * it_d}"]
    out["derived"] = {
        "pressure_marginal_us_per_sweep": round((p2 - p1) / it_p * 1e3, 3),
        "pressure_fixed_ms": round(2 * p1 - p2, 4),
        "diffuse_marginal_us_per_chsweep": round(
            (d2 - d1) / (5 * it_d) * 1e3, 3),
        "diffuse_fixed_ms": round(2 * d1 - d2, 4),
        "per_launch_ms_at_grid": round(
            (rows[f"copy_chain_9x_{H}x{W}"] - rows[f"copy_chain_1x_{H}x{W}"])
            / 8, 4),
        "per_launch_ms_tiny": round(
            (rows["copy_chain_9x_8x128"] - rows["copy_chain_1x_8x128"]) / 8,
            4),
        "stage_sum_ms": round(
            rows["advect_velocity"] + rows["advect_dye"] + rows["vorticity"]
            + d1 + p1, 4),
        "full_step_ms": round(rows["full_quiet_step"], 4),
        "vmem_ceiling_us_per_sweep_2048sq": round(
            H * W / 235e9 * 1e6, 3),
    }
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
