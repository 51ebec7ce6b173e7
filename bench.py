"""Headline benchmark: steps/sec of the full stable-fluids step.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N, ...}

Flagship config (BASELINE.md north star): 2048² grid, gpu-parity pipeline
(20 diffusion iters on velocity+dye, 40 pressure iters), driven impulse, full
jit lax.scan.  vs_baseline compares cell-update throughput against the
reference GPU's 960x540 @ 108 FPS on an RTX 3090 (= 0.056 Gcell/s,
BASELINE.md derivation).

Exactness: the advection bound is set to max_displacement=31 cells, ABOVE
the driven flow's realized |v|*dt (~22 at 2048² — measured every run and
reported as "realized_max_displacement"), so the benchmark's physics is
bit-faithful to the reference's unbounded backtrace
(GPUFluidSim.cu:267) for the whole rollout; "exact" records the check.
Round 2 benched the d=15 default, which silently clamped fast backtraces.
"""

import json
import sys
import time

import jax
import numpy as np


def main():
    from cudafluidsimulation_tpu import FluidConfig, Simulation
    from cudafluidsimulation_tpu.utils.impulse import orbit_impulse

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        n = 2048
        steps = 200  # long scan: amortizes the axon relay's ~40ms dispatch
        timing_iters = 3
    else:  # smoke-test fallback off-TPU
        n = 256
        steps = 10
        timing_iters = 2

    d = 31  # covers the flow's realized |v|*dt (~22) -> exact backtraces
    cfg = FluidConfig.gpu_reference(nx=n, ny=n, pressure_iters=40,
                                    backend="auto", max_displacement=d)
    sim = Simulation(cfg)
    imp = orbit_impulse(steps, cfg.dt, center=(n / 2, n / 2), radius=n / 8, omega=3.0)

    # the TPU tunnel in this environment occasionally drops a request with a
    # transient UNAVAILABLE device error; retry rather than losing the round's
    # benchmark to an infrastructure flake
    from cudafluidsimulation_tpu.utils.impulse import no_impulse

    last_err = None
    for attempt in range(3):
        try:
            state = sim.init()

            # sync via a SCALAR computed inside the program and fetched to
            # the host: block_until_ready through the relay intermittently
            # returns early (round 3 caught an 8192² step reading 122 ms by
            # block_until_ready vs 149 ms by host transfer + stage sum)
            @jax.jit
            def run(st, im):
                out = sim._jit_run(st, im)
                return out.u[0, 0]

            float(run(state, imp))  # compile
            times = []
            for _ in range(timing_iters):
                t0 = time.perf_counter()
                float(run(state, imp))
                times.append(time.perf_counter() - t0)
            # best-of, not median: the tunnel intermittently stalls whole
            # multi-second windows, and best-of resists that
            sec = min(times)
            # quiet variant (no impulse, zero state): isolates the advect
            # kernel's flow-dependent window cost — the driven/quiet ratio
            # is the reconciliation of "6 ms" vs "9 ms" style disputes
            # (same compiled program: shapes identical, no recompile)
            quiet = no_impulse(steps, cfg.dt)
            qt = []
            for _ in range(timing_iters):
                t0 = time.perf_counter()
                float(run(state, quiet))
                qt.append(time.perf_counter() - t0)
            quiet_sec = min(qt)
            # realized backtrace displacement over the whole driven rollout
            # (per-step max |v|*dt, scanned — not just the final state);
            # exact means no step's backtrace was clamped by the d bound
            _, (disp_x, disp_y) = sim.run_displacement(state, imp)
            from cudafluidsimulation_tpu.ops import advect_pallas

            x_bounded = cfg.resolve_backend() == "pallas" and (
                advect_pallas.uses_column_tiling(n, n, 2, d)
                or advect_pallas.uses_column_tiling(n, n, 3, d))
            break
        except Exception as e:  # jax.errors.JaxRuntimeError and friends
            last_err = e
            time.sleep(10)
    else:
        raise last_err
    steps_per_sec = steps / sec

    def _variant_rate(vcfg):
        """Best-of driven steps/s of a config variant on the same impulse
        stream (fresh Simulation; same scalar-fetch sync discipline)."""
        vsim = Simulation(vcfg)
        vstate = vsim.init()

        @jax.jit
        def vrun(st, im):
            out = vsim._jit_run(st, im)
            return out.u[0, 0]

        float(vrun(vstate, imp))  # compile
        vt = []
        for _ in range(timing_iters):
            t0 = time.perf_counter()
            float(vrun(vstate, imp))
            vt.append(time.perf_counter() - t0)
        return steps / min(vt)

    # beyond-parity headline rows, re-measured every round so the driver
    # records them next to the parity number (r4 verdict #7):
    #   quality = multigrid pressure, residual-targeted rms(Ap+div)<0.05
    #   fast    = bf16-packed advection + separable fast diffuse
    extra = {}
    for key, vcfg in (
        ("quality_steps_per_sec",
         FluidConfig.quality(nx=n, ny=n, backend="auto")),
        ("fast_steps_per_sec",
         FluidConfig.gpu_reference(nx=n, ny=n, pressure_iters=40,
                                   backend="auto", max_displacement=d,
                                   fast_dye=True, fast_velocity=True,
                                   fast_diffuse=True)),
    ):
        try:
            extra[key] = round(_variant_rate(vcfg), 2)
        except Exception:  # keep the parity line on variant-path flakes
            extra[key] = None

    gcell = steps_per_sec * n * n / 1e9
    baseline_gcell = 0.056  # reference RTX 3090: 960*540*108 (BASELINE.md)
    result = {
        "metric": f"sim steps/sec at {n}^2 (40 Jacobi pressure iters, 20 diffusion, "
        f"gpu-parity pipeline, backend={cfg.resolve_backend()})",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(gcell / baseline_gcell, 2),
        "quiet_steps_per_sec": round(steps / quiet_sec, 2),
        **extra,
        "max_displacement": d,
        "realized_max_displacement": round(max(disp_x, disp_y), 2),
        # vertical taps are always bounded at d on the pallas path; the
        # column-tiled kernel (which the dye channels use at 2048²/d=31)
        # bounds horizontal taps too — mirror the CLI's _clamp_warning logic
        "exact": bool(disp_y <= d and (disp_x <= d or not x_bounded)),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
