"""Fused Pallas TPU kernels for the bandwidth-bound stencil ops.

The CUDA reference's perf trick is block-local Jacobi on shared-memory tiles
with stale halos (GPUFluidSim.cu:316-429, 445-495): load a (16+2)² tile once,
iterate 20-30x without refreshing the halo.  The TPU-native version here is
the *principled* form of the same idea: a burst kernel keeps a row-strip of
the field in VMEM with a k-deep halo and runs k exact Jacobi sweeps per HBM
round trip (the halo shrinks one row per sweep, so the strip interior is
bit-exact global Jacobi — no stale-halo approximation), cutting HBM traffic
by ~k x.

This module exposes ``overrides(config)`` consumed by ops.backend.get_ops;
anything not overridden falls back to the jnp ref ops (XLA already fuses the
cheap elementwise stages well).
"""

from __future__ import annotations

import functools

from cudafluidsimulation_tpu.config import FluidConfig


def overrides(config: FluidConfig) -> dict:
    from cudafluidsimulation_tpu.ops import advect_pallas, jacobi_pallas

    out = {}
    if jacobi_pallas.supported(config):
        # small grids run each whole Jacobi stage as ONE deep burst when
        # that wins (fewer HBM trips/launches); see jacobi_pallas.deep_burst
        dif_burst, dif_rows = jacobi_pallas.deep_burst(
            config.ny, config.nx, config.diffusion_iters,
            config.block_rows, config.jacobi_burst)
        prs_burst, prs_rows = jacobi_pallas.deep_burst(
            config.ny, config.nx, config.pressure_iters,
            config.block_rows, config.jacobi_burst)
        out["diffuse"] = functools.partial(
            jacobi_pallas.diffuse,
            block_rows=dif_rows,
            burst=dif_burst,
        )
        out["diffuse_multi"] = functools.partial(
            jacobi_pallas.diffuse_multi,
            block_rows=dif_rows,
            burst=dif_burst,
        )
        out["diffuse_multi_splat"] = functools.partial(
            jacobi_pallas.diffuse_multi_splat,
            block_rows=dif_rows,
            burst=dif_burst,
        )
        out["pressure_solve"] = functools.partial(
            jacobi_pallas.pressure_solve,
            block_rows=prs_rows,
            burst=prs_burst,
        )
        from cudafluidsimulation_tpu.ops import multigrid

        # multigrid fine-level smoothing as trapezoid bursts (big levels
        # only — ops.multigrid._smooth_mixed gates; small levels keep the
        # XLA scan that beat the rejected tiny-launch kernel)
        out["pressure_solve_mg"] = functools.partial(
            multigrid.pressure_solve_mg, smoother="burst")
        # ... and the fully-fused mg projection (divergence into cycle 1's
        # pre-smooth, projection into the last post-smooth, residuals
        # emitted by every pre-smooth launch); optional namespace hook,
        # consumed by models/pipelines.py — anything patching the namespace
        # (instrument, ensembles) must cover it like the other fused ops
        out["pressure_project_mg"] = functools.partial(
            multigrid.pressure_project_mg, block_rows=config.block_rows)
        if jacobi_pallas.fusable(config.ny, config.nx, config.pressure_iters,
                                 prs_rows, prs_burst):
            out["pressure_project"] = functools.partial(
                jacobi_pallas.pressure_project,
                block_rows=prs_rows,
                burst=prs_burst,
            )
        else:
            # unfusable geometry (mirror-padded grids): still burst-solve the
            # sweeps in pallas, with jnp divergence/project around them
            from cudafluidsimulation_tpu.ops import ref as _r

            def _pp(u, v, iters, half, _br=prs_rows, _bu=prs_burst,
                    return_stats=False):
                d = _r.divergence(u, v, half)
                p = jacobi_pallas.pressure_solve(
                    d, iters, block_rows=_br, burst=_bu)
                if return_stats:
                    u2, v2, st = _r.project(u, v, p, return_stats=True)
                    return u2, v2, p, st
                u2, v2 = _r.project(u, v, p)
                return u2, v2, p

            out["pressure_project"] = _pp
    if jacobi_pallas.divergence_supported(config.ny, config.nx):
        # single-pass stencil kernels (also the multigrid path's div/project)
        out["divergence"] = functools.partial(
            jacobi_pallas.divergence, block_rows=config.block_rows)
        out["project"] = functools.partial(
            jacobi_pallas.project, block_rows=config.block_rows)
    if jacobi_pallas.vorticity_supported(config.ny, config.nx):
        out["vorticity_confinement_gpu"] = functools.partial(
            jacobi_pallas.vorticity_confinement, variant="gpu",
            block_rows=config.block_rows,
        )
        out["vorticity_confinement_cpu"] = functools.partial(
            jacobi_pallas.vorticity_confinement, variant="cpu",
            block_rows=config.block_rows,
        )
    if config.fast_diffuse and jacobi_pallas.supported(config):
        from cudafluidsimulation_tpu.ops import fastdiffuse

        # separable blur evaluation of the k-sweep diffusion operator
        # (opt-in, ~1e-4 operator error — ops/fastdiffuse.py); empty when
        # the tap volume would not undercut the exact burst
        out.update(fastdiffuse.make_ops(config))
    d = config.max_displacement
    # gate each op on ITS channel footprint: geometries where only the
    # 3-channel dye advection overflows VMEM still get the 2-channel
    # velocity kernel (the kernel falls back to one-channel-per-program
    # before failing, so this split rarely matters — but never wrongly
    # disables the cheaper op)
    if advect_pallas.supported(config.ny, config.nx, 2, d):
        out["advect_velocity"] = functools.partial(
            advect_pallas.advect_velocity, d=d, packed=config.fast_velocity,
            fast_path=config.advect_fast_path)
    if advect_pallas.supported(config.ny, config.nx, 3, d):
        out["advect_dye"] = functools.partial(
            advect_pallas.advect_dye, d=d, packed=config.fast_dye,
            fast_path=config.advect_fast_path)
    return out
