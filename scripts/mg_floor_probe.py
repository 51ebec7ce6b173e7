"""Multigrid solver frontier, re-measured with the r4 burst smoother.

The r2 frontier table (BASELINE.md "Solver frontier") predates the r3
kernels: mg-2 then cost ~4-5 ms/step more than the 40-sweep Jacobi path
even though two V-cycles are only ~15 fine-sweep-equivalents (~0.26 ms at
the 235 Gcell-sweeps/s in-VMEM ceiling).  This probe measures, same
session, driven 2048² whole steps (the only honest comparison — see
CLAUDE.md round-3 lessons):

  - jacobi-40 parity step (frontier anchor)
  - mg-{1,2,3} with the scan smoother (the r2 path)
  - mg-{1,2,3} with the pallas burst smoother (r4)
  - mg tol=0.05 (the `--preset quality` configuration)

plus the rms residual each solver leaves (single eval, fixed seed) so the
frontier table pairs cost with convergence.  Rules of the road:
jax.clear_caches() between cases, host-transfer sync, delta-timed scans,
best-of-3.

    python scripts/mg_floor_probe.py [NX NY [SHORT LONG]]
"""
import functools
import json
import sys
import time

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cudafluidsimulation_tpu import FluidConfig, Simulation  # noqa: E402
from cudafluidsimulation_tpu.models.pipelines import make_step  # noqa: E402
from cudafluidsimulation_tpu.models.simulation import run_scan  # noqa: E402
from cudafluidsimulation_tpu.ops import multigrid  # noqa: E402
from cudafluidsimulation_tpu.ops.backend import get_ops  # noqa: E402
from cudafluidsimulation_tpu.utils.impulse import orbit_impulse  # noqa: E402


def build(nx, ny, smoother=None, **over):
    """smoother: None = production path (fused pressure_project_mg on the
    pallas backend), "fused" = same explicitly, "scan"/"burst" = the unfused
    divergence/solve/project composition with that smoother (r2/r4-early
    paths; the fused hook must be removed or the pipeline would prefer it)."""
    cfg = FluidConfig.gpu_reference(nx=nx, ny=ny, backend="auto",
                                    max_displacement=31, **over)
    ops = get_ops(cfg)
    if smoother in ("scan", "burst") and cfg.pressure_solver == "multigrid":
        if hasattr(ops, "pressure_project_mg"):
            del ops.pressure_project_mg
        ops.pressure_solve_mg = functools.partial(
            multigrid.pressure_solve_mg, smoother=smoother)
    sim = Simulation(cfg)  # builds its own ops; only for init()
    step = make_step(cfg, ops)
    return cfg, sim.init(), jax.jit(functools.partial(run_scan, step))


def step_ms(nx, ny, n_short, n_long, smoother=None, **over):
    jax.clear_caches()
    cfg, st, run = build(nx, ny, smoother, **over)

    def make(k):
        imp = orbit_impulse(k, cfg.dt, center=(nx / 2, ny / 2), radius=ny / 8)

        @jax.jit
        def go(s, im):
            out = run(s, im)
            return out.u[0, 0]

        return lambda: float(go(st, imp))

    short, long_ = make(n_short), make(n_long)
    short(); long_()

    def t(g):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            g()
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(long_) - t(short)) / (n_long - n_short) * 1e3


def residuals(nx, ny):
    """rms(A p + div) each solver leaves on the SAME driven-flow divergence
    (30 parity steps in, fixed orbit impulse)."""
    jax.clear_caches()
    cfg, st, run = build(nx, ny)
    imp = orbit_impulse(30, cfg.dt, center=(nx / 2, ny / 2), radius=ny / 8)
    st = jax.block_until_ready(run(st, imp))
    from cudafluidsimulation_tpu.ops import ref

    div = ref.divergence(st.u, st.v, cfg.half_divergence)
    out = {"zero_guess": float(multigrid.residual_norm(jnp.zeros_like(div),
                                                       div))}
    from cudafluidsimulation_tpu.ops import jacobi_pallas

    p40 = jacobi_pallas.pressure_solve(div, 40)
    out["jacobi40"] = float(multigrid.residual_norm(p40, div))
    for c in (1, 2, 3):
        p = multigrid.pressure_solve_mg(div, cycles=c, smoother="burst")
        out[f"mg{c}"] = float(multigrid.residual_norm(p, div))
    return out


def main():
    nx = ny = 2048
    short, long_ = 20, 60
    if len(sys.argv) > 2:
        nx, ny = int(sys.argv[1]), int(sys.argv[2])
        if len(sys.argv) > 4:
            short, long_ = int(sys.argv[3]), int(sys.argv[4])
    res = {"grid": [nx, ny]}
    res["jacobi40_ms"] = step_ms(nx, ny, short, long_)
    for c in (1, 2, 3):
        res[f"mg{c}_scan_ms"] = step_ms(
            nx, ny, short, long_, smoother="scan",
            pressure_solver="multigrid", mg_cycles=c)
        res[f"mg{c}_burst_ms"] = step_ms(
            nx, ny, short, long_, smoother="burst",
            pressure_solver="multigrid", mg_cycles=c)
        res[f"mg{c}_fused_ms"] = step_ms(
            nx, ny, short, long_, smoother="fused",
            pressure_solver="multigrid", mg_cycles=c)
        print(json.dumps({k: v for k, v in res.items()}), flush=True)
    res["quality_tol05_ms"] = step_ms(
        nx, ny, short, long_, pressure_solver="multigrid", mg_tol=0.05)
    res["residuals"] = residuals(nx, ny)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
