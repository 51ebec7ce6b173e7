"""Full benchmark suite over the BASELINE.json configs.

Prints one JSON line per config (bench.py remains the single headline
metric).  Run on TPU; falls back to tiny smoke sizes elsewhere.

  1. 256² cpu-parity headless, 100 steps, scripted center splat
  2. 1024² single-chip, 40 Jacobi iters, 1000-step jit scan
  3. 2048² with on-device RGBA render each step
  4. vmapped ensemble: 64 x 512² viscosity sweep
  4b. 8192² on one chip; 4c. solver frontier (Jacobi-40 vs multigrid,
      residual + throughput)
  5. 8192² sharded: shard_map rollout (dry-run scale if <8 devices)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# fake an 8-device host platform BEFORE jax initializes: XLA flags are
# parsed once at first backend init, so setting this later (as the config-5
# fallback used to) silently yields 1 CPU device
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import jax.numpy as jnp
import numpy as np


def _sync(r):
    # honest sync: fetch ONE element to the host (block_until_ready
    # intermittently returns early through the device relay — BASELINE.md
    # r3 sync-artifact note; a host transfer cannot)
    leaf = jax.tree.leaves(r)[0]
    return float(jnp.asarray(leaf)[(0,) * jnp.asarray(leaf).ndim])


def timed(fn, *args, reps=3):
    _sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def emit(name, steps, sec, cells, extra=None):
    rec = {
        "config": name,
        "steps_per_sec": round(steps / sec, 2),
        "gcell_per_sec": round(steps / sec * cells / 1e9, 4),
        "vs_ref_gpu_gcell": round((steps / sec * cells / 1e9) / 0.056, 2),
    }
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def main():
    from cudafluidsimulation_tpu import FluidConfig, Simulation, init_state
    from cudafluidsimulation_tpu.models.ensemble import (
        batched_impulse,
        batched_state,
        make_diffusion_sweep_run,
    )
    from cudafluidsimulation_tpu.models.simulation import run_scan_render
    from cudafluidsimulation_tpu.utils.impulse import constant_impulse, orbit_impulse

    on_tpu = jax.default_backend() == "tpu"
    scale = 1 if on_tpu else 4  # shrink sizes off-TPU

    # 1. cpu-parity 256², 100 steps, center splat
    n = 256 // scale
    cfg = FluidConfig.cpu_reference(nx=n, ny=n, backend="auto")
    sim = Simulation(cfg)
    imp = constant_impulse(100, cfg.dt, pos=(n / 2, n / 2), last_pos=(n / 2 - 3, n / 2 - 2))
    sec = timed(sim._jit_run, sim.init(), imp)
    emit("cpu-parity 256^2 x100 center-splat", 100, sec, n * n)

    # 1b. the reference's OWN workload: 960x540, 20/30 iters, driven —
    # frame-for-frame vs the RTX 3090's 8.99 ms/frame (108 FPS)
    if on_tpu:
        nx, ny = 960, 540
        steps = 200
        cfg = FluidConfig.gpu_reference(nx=nx, ny=ny, backend="auto")
        sim = Simulation(cfg)
        imp = orbit_impulse(steps, cfg.dt, center=(nx / 2, ny / 2),
                            radius=ny / 8)
        sec = timed(sim._jit_run, sim.init(), imp)
        emit(f"reference-workload {nx}x{ny} x{steps} (20/30 iters)", steps,
             sec, nx * ny,
             {"vs_ref_gpu_fps": round((steps / sec) / 108.0, 2)})

    # 2. 1024² single chip, 40 iters, 1000 steps
    n = 1024 // scale
    steps = 1000 if on_tpu else 50
    cfg = FluidConfig.gpu_reference(nx=n, ny=n, pressure_iters=40, backend="auto")
    sim = Simulation(cfg)
    imp = orbit_impulse(steps, cfg.dt, center=(n / 2, n / 2), radius=n / 8)
    sec = timed(sim._jit_run, sim.init(), imp, reps=1 if on_tpu else 3)
    emit(f"single-chip {n}^2 x{steps} (40 pressure iters)", steps, sec, n * n)

    # 3. 2048² with per-step device-side render
    n = 2048 // scale
    steps = 100 if on_tpu else 10
    cfg = FluidConfig.gpu_reference(nx=n, ny=n, pressure_iters=40, backend="auto")
    sim = Simulation(cfg)
    imp = orbit_impulse(steps, cfg.dt, center=(n / 2, n / 2), radius=n / 8)
    import functools

    fn = jax.jit(functools.partial(
        run_scan_render, sim.step_fn, sim.render_fn))
    sec = timed(lambda s, i: fn(s, i)[0], sim.init(), imp, reps=1)
    emit(f"render-pipeline {n}^2 x{steps} (RGBA every step)", steps, sec, n * n)

    # 4. ensemble: 64 x 512² viscosity sweep
    b = 64 if on_tpu else 4
    n = 512 // scale
    steps = 100 if on_tpu else 10
    cfg = FluidConfig.gpu_reference(nx=n, ny=n, backend="auto")
    run = make_diffusion_sweep_run(cfg)
    states = batched_state(cfg, b)
    imp = batched_impulse(
        orbit_impulse(steps, cfg.dt, center=(n / 2, n / 2), radius=n / 8), b,
        jitter_pos=np.random.default_rng(0).uniform(-8, 8, (b, 2)),
    )
    diffs = jnp.linspace(0.2, 1.5, b)
    sec = timed(run, diffs, states, imp, reps=1)
    emit(f"ensemble {b} x {n}^2 x{steps} viscosity sweep", steps, sec,
         b * n * n)

    # 4b. 8192² on ONE chip (1.9 GB of fields; the sharded config's
    # single-device anchor point)
    if on_tpu:
        n = 8192
        steps = 24  # long enough that the constant dispatch latency is noise
        cfg = FluidConfig.gpu_reference(nx=n, ny=n, pressure_iters=100,
                                        backend="auto")
        sim = Simulation(cfg)
        imp = orbit_impulse(steps, cfg.dt, center=(n / 2, n / 2), radius=n / 8)
        sec = timed(sim._jit_run, sim.init(), imp, reps=2)
        emit(f"single-chip {n}^2 x{steps} (100 pressure iters)", steps, sec,
             n * n)

    # 4b-XL. 16384² capacity anchor (7.0 GB of f32 fields; BENCH_16384=1 to
    # enable — the compile + rollout is minutes and stresses HBM headroom).
    # The column planners hold: jacobi tiles 8 x (2048 + 2*128 halo) at
    # r=128, advect tiles at (1024, 128) x 16x64 (probed on CPU; the run
    # itself is the real VMEM/HBM evidence).
    if on_tpu and os.environ.get("BENCH_16384"):
        n = 16384
        steps = 8
        cfg = FluidConfig.gpu_reference(nx=n, ny=n, pressure_iters=100,
                                        backend="auto")
        sim = Simulation(cfg)
        imp = orbit_impulse(steps, cfg.dt, center=(n / 2, n / 2), radius=n / 8)
        sec = timed(sim._jit_run, sim.init(), imp, reps=2)
        emit(f"single-chip {n}^2 x{steps} (100 pressure iters)", steps, sec,
             n * n)

    # 4c. solver quality/time frontier: the parity Jacobi-40 barely dents
    # the pressure residual at 2048² (it stalls on low-frequency error),
    # while multigrid actually SOLVES the Poisson problem — the measured
    # accuracy-per-time evidence behind BASELINE.md's "far lower residuals"
    from cudafluidsimulation_tpu.ops.multigrid import (
        pressure_solve_mg, residual_norm,
    )

    n = 2048 // scale
    steps = 100 if on_tpu else 5
    cfg_j = FluidConfig.gpu_reference(nx=n, ny=n, pressure_iters=40,
                                      backend="auto")
    sim_j = Simulation(cfg_j)
    imp = orbit_impulse(steps, cfg_j.dt, center=(n / 2, n / 2), radius=n / 8)
    # the warmup/compile run doubles as the driven-field producer (one
    # 100-step 2048^2 rollout saved vs a separate timed() warmup)
    st = sim_j._jit_run(sim_j.init(), imp)
    jax.tree.map(lambda a: a.block_until_ready(), st)
    t0 = time.perf_counter()
    jax.tree.map(lambda a: a.block_until_ready(),
                 sim_j._jit_run(sim_j.init(), imp))
    sec_j = time.perf_counter() - t0
    ops_j = sim_j.ops
    div = jax.jit(lambda s: ops_j.divergence(s.u, s.v,
                                             cfg_j.half_divergence))(st)
    r_zero = float(residual_norm(jnp.zeros_like(div), div))
    r_j = float(residual_norm(
        jax.jit(lambda d: ops_j.pressure_solve(d, 40))(div), div))
    emit(f"solver-frontier {n}^2 jacobi-40 (parity)", steps, sec_j, n * n,
         {"pressure_residual_rms": round(r_j, 4),
          "zero_guess_residual_rms": round(r_zero, 4)})

    cycles = 2
    cfg_m = FluidConfig.gpu_reference(nx=n, ny=n,
                                      pressure_solver="multigrid",
                                      mg_cycles=cycles, backend="auto")
    sim_m = Simulation(cfg_m)
    r_m = float(residual_norm(
        jax.jit(lambda d: pressure_solve_mg(d, cycles))(div), div))
    sec_m = timed(sim_m._jit_run, sim_m.init(), imp, reps=1)
    emit(f"solver-frontier {n}^2 multigrid-{cycles}", steps, sec_m, n * n,
         {"pressure_residual_rms": round(r_m, 4),
          "residual_vs_jacobi40": round(r_j / max(r_m, 1e-30), 1)})

    # the --preset quality config: residual-targeted multigrid (rms < 0.05)
    # + exact d=31 advection bound — one flag reproduces this row
    cfg_q = FluidConfig.quality(nx=n, ny=n, backend="auto")
    sim_q = Simulation(cfg_q)
    r_q = float(residual_norm(
        jax.jit(lambda d: pressure_solve_mg(
            d, cfg_q.mg_cycles, tol=cfg_q.mg_tol,
            max_cycles=cfg_q.mg_max_cycles))(div), div))
    sec_q = timed(sim_q._jit_run, sim_q.init(), imp, reps=1)
    emit(f"solver-frontier {n}^2 quality-preset (mg tol={cfg_q.mg_tol}, "
         f"d={cfg_q.max_displacement})", steps, sec_q, n * n,
         {"pressure_residual_rms": round(r_q, 4),
          "residual_vs_jacobi40": round(r_j / max(r_q, 1e-30), 1)})

    # 5. sharded 8192² (needs >= 8 devices; else report dry-run scale)
    ndev = len(jax.devices())
    if ndev >= 8 and on_tpu:
        from cudafluidsimulation_tpu.parallel.sharded import make_mesh, shard_state
        from cudafluidsimulation_tpu.parallel.shardmap_step import (
            make_shardmap_rollout,
        )

        n = 8192
        steps = 20
        cfg = FluidConfig.gpu_reference(nx=n, ny=n, pressure_iters=100,
                                        backend="ref")
        mesh = make_mesh(8, ens=1)
        run = make_shardmap_rollout(cfg, mesh)
        st = shard_state(init_state(cfg), mesh)
        imp = orbit_impulse(steps, cfg.dt, center=(n / 2, n / 2), radius=n / 8)
        sec = timed(run, st, imp, reps=1)
        emit(f"sharded {n}^2 x{steps} over 8 chips (100 pressure iters)",
             steps, sec, n * n)
    else:
        # no 8-chip hardware: measure the 8192² communication schedule on a
        # virtual 8-device CPU mesh instead (device count faked at module
        # import).  Traffic numbers come from the traced jaxpr (every
        # ppermute XLA will emit), and a small-grid rollout on the virtual
        # mesh validates the path executes.
        cpu_devs = jax.devices("cpu")
        if len(cpu_devs) >= 8:
            from cudafluidsimulation_tpu.parallel.halo import measure_halo_traffic
            from cudafluidsimulation_tpu.parallel.sharded import (
                make_mesh, shard_state,
            )
            from cudafluidsimulation_tpu.parallel.shardmap_step import (
                make_shardmap_rollout,
            )

            mesh = make_mesh(8, ens=1, devices=cpu_devs)
            n = 8192
            # the production path: per-shard pallas burst kernels, fused
            # divergence->Jacobi->project (1 velocity exchange + one
            # pressure exchange per burst after the first)
            cfg = FluidConfig.gpu_reference(nx=n, ny=n, pressure_iters=100,
                                            backend="pallas")
            traffic = measure_halo_traffic(cfg, mesh)
            # the sweep-per-exchange ref schedule, for contrast (scan trip
            # counts are now expanded, so this is the true ~1 sweep/pair)
            cfg_ref = FluidConfig.gpu_reference(nx=n, ny=n, pressure_iters=100,
                                                backend="ref")
            traffic_ref = measure_halo_traffic(cfg_ref, mesh)
            traffic["ref_backend_exchange_pairs_per_step"] = traffic_ref[
                "exchange_pairs_per_step"]

            # execution validation at a CPU-feasible size
            nv = 512
            steps = 4
            cfgv = FluidConfig.gpu_reference(nx=nv, ny=nv, pressure_iters=100,
                                             backend="ref")
            with jax.default_device(cpu_devs[0]):
                run = make_shardmap_rollout(cfgv, mesh)
                st = shard_state(init_state(cfgv), mesh)
                imp = orbit_impulse(steps, cfgv.dt, center=(nv / 2, nv / 2),
                                    radius=nv / 8)
                sec = timed(run, st, imp, reps=1)
            rec = {
                "config": "sharded 8192^2 (virtual 8-device mesh model)",
                "validated_at": f"{nv}^2 x{steps} on 8 virtual CPU devices "
                f"({round(steps / sec, 2)} steps/s there)",
            }
            rec.update(traffic)
            rec["ici_mb_per_step_per_device"] = round(
                traffic["ici_bytes_per_step_per_device"] / 1e6, 2)
            print(json.dumps(rec), flush=True)

            # same model for the 2-D (rows x cols) torus layout
            from cudafluidsimulation_tpu.parallel.shardmap2d import (
                make_mesh2d, make_shardmap2d_step,
            )

            mesh2 = make_mesh2d(2, 4, devices=cpu_devs)
            t2 = measure_halo_traffic(cfg, mesh2,  # pallas backend config
                                      step_builder=make_shardmap2d_step)
            rec2 = {"config": "sharded 8192^2 (2x4 rows-x-cols mesh model)"}
            rec2.update(t2)
            rec2["ici_mb_per_step_per_device"] = round(
                t2["ici_bytes_per_step_per_device"] / 1e6, 2)
            print(json.dumps(rec2), flush=True)

            # sharded QUALITY preset traffic (multigrid pressure): per-level
            # smooth/residual/prolong exchanges replace the Jacobi bursts'.
            # Fixed mg_cycles=2 keeps the count exact; the tol row counts the
            # traced while_loop body ONCE (one cycle) + cycle 1 — actual
            # runs scale it by the realized cycle count (1..max_cycles).
            cfg_mg = FluidConfig.gpu_reference(
                nx=n, ny=n, pressure_iters=100, backend="pallas",
                pressure_solver="multigrid", mg_cycles=2)
            t_mg = measure_halo_traffic(cfg_mg, mesh)
            rec3 = {"config": "sharded 8192^2 multigrid mg_cycles=2 "
                              "(rows mesh model)"}
            rec3.update(t_mg)
            rec3["ici_mb_per_step_per_device"] = round(
                t_mg["ici_bytes_per_step_per_device"] / 1e6, 2)
            print(json.dumps(rec3), flush=True)
        else:
            print(json.dumps({"config": "sharded 8192^2",
                              "skipped": f"needs 8 devices, have {ndev}"}),
                  flush=True)


if __name__ == "__main__":
    main()
