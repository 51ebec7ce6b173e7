"""8192² quality row: jacobi-100 parity step vs multigrid (fused driver).

At 8192² the finest mg level is column-tiled territory: mg_ends_fusable
says no there, and since r4 the pre-smooth+residual runs as the fused
TILED smooth_res kernel (jacobi_pallas._smooth_res_kernel_tiled) instead
of tiled smooth_damped + a separate XLA residual pass; the divergence /
project ends stay standalone kernels at this size (4096 and below use the
fused flat kernels).  Measures the whole driven step (delta-timed scans,
clear_caches between cases, best-of-3) plus the residuals each solver
leaves.

    python scripts/mg8192_probe.py [N [SHORT LONG]]
"""
import json
import sys
import time

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cudafluidsimulation_tpu import FluidConfig, Simulation  # noqa: E402
from cudafluidsimulation_tpu.ops import multigrid  # noqa: E402
from cudafluidsimulation_tpu.utils.impulse import orbit_impulse  # noqa: E402


def step_ms(n, n_short, n_long, **over):
    jax.clear_caches()
    cfg = FluidConfig.gpu_reference(nx=n, ny=n, backend="auto",
                                    max_displacement=31, pressure_iters=100,
                                    **over)
    sim = Simulation(cfg)
    st = sim.init()

    def make(k):
        imp = orbit_impulse(k, cfg.dt, center=(n / 2, n / 2), radius=n / 8)

        @jax.jit
        def run(s, im):
            out = sim._jit_run(s, im)
            return out.u[0, 0]

        return lambda: float(run(st, imp))

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


def residuals(n):
    jax.clear_caches()
    cfg = FluidConfig.gpu_reference(nx=n, ny=n, backend="auto",
                                    max_displacement=31, pressure_iters=100)
    sim = Simulation(cfg)
    imp = orbit_impulse(20, cfg.dt, center=(n / 2, n / 2), radius=n / 8)
    st = jax.block_until_ready(sim.run(sim.init(), imp))
    from cudafluidsimulation_tpu.ops import jacobi_pallas, ref

    div = ref.divergence(st.u, st.v, cfg.half_divergence)
    out = {"zero_guess": float(multigrid.residual_norm(
        jnp.zeros_like(div), div))}
    p100 = jacobi_pallas.pressure_solve(div, 100)
    out["jacobi100"] = float(multigrid.residual_norm(p100, div))
    for c in (1, 2):
        p = multigrid.pressure_solve_mg(div, cycles=c, smoother="burst")
        out[f"mg{c}"] = float(multigrid.residual_norm(p, div))
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    short, long_ = (int(sys.argv[2]), int(sys.argv[3])) \
        if len(sys.argv) > 3 else (5, 15)
    res = {"grid": n, "pressure_iters": 100}
    res["jacobi100_ms"] = step_ms(n, short, long_)
    print(json.dumps(res), flush=True)
    res["mg2_fused_ms"] = step_ms(n, short, long_,
                                  pressure_solver="multigrid", mg_cycles=2)
    print(json.dumps(res), flush=True)
    res["quality_tol05_ms"] = step_ms(n, short, long_,
                                      pressure_solver="multigrid",
                                      mg_tol=0.05)
    res["residuals"] = residuals(n)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
