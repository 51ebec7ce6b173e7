"""Batched ensembles: many independent sims on one chip via vmap.

The reference can run exactly one simulation per process (global mutable
arrays, cpuFluidSim.cpp:34-48).  Here a whole parameter sweep is one vmapped
rollout (BASELINE.json config 4: 64 x 512² on one chip).  Per-member physics
parameters that live in jnp arrays (force positions, impulse scripts) batch
directly; config-level parameters (viscosity, iteration counts) are static,
so sweeps over them use one compiled rollout per distinct config — or the
in-array `DiffusionSweep` trick below, which promotes the diffusion
coefficient to a traced per-member value.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cudafluidsimulation_tpu.config import FluidConfig
from cudafluidsimulation_tpu.models.pipelines import make_step
from cudafluidsimulation_tpu.models.simulation import run_scan
from cudafluidsimulation_tpu.ops.backend import get_ops
from cudafluidsimulation_tpu.state import FluidState, init_state
from cudafluidsimulation_tpu.utils.impulse import Impulse


def batched_state(config: FluidConfig, n: int) -> FluidState:
    return jax.tree.map(lambda x: jnp.stack([x] * n), init_state(config))


def batched_impulse(imp: Impulse, n: int,
                    jitter_pos: Optional[np.ndarray] = None) -> Impulse:
    """Tile a (T, ...) impulse stream to (B, T, ...); optionally offset each
    member's positions by ``jitter_pos`` (B, 2) for decorrelated sweeps."""
    out = Impulse(*(jnp.stack([f] * n) for f in imp))
    if jitter_pos is not None:
        j = jnp.asarray(jitter_pos, jnp.float32)[:, None, :]
        out = out._replace(pos=out.pos + j, last_pos=out.last_pos + j)
    return out


def make_ensemble_run(config: FluidConfig):
    """vmapped rollout: (batched_state, (B, T) impulses) -> batched final."""
    step = make_step(config)

    def run_one(state, impulses):
        return run_scan(step, state, impulses)

    return jax.jit(jax.vmap(run_one))


def make_diffusion_sweep_run(config: FluidConfig):
    """Rollout vmapped over a per-member velocity-diffusion coefficient.

    Promotes the viscosity from static config to a traced per-member scalar,
    so a whole sweep (BASELINE config 4) is ONE compiled program:
    run(diffusions (B,), batched_state, (B, T) impulses) -> batched final.
    """
    ops = get_ops(config)

    def run_one(diffusion, state, impulses):
        return run_scan(_step_with_diffusion(config, ops, diffusion),
                        state, impulses)

    return jax.jit(jax.vmap(run_one))


def _step_with_diffusion(config, ops, diffusion):
    """make_step with the velocity-diffusion coefficient overridden by a
    traced scalar (dye diffusion keeps the config value)."""
    import types

    patched = types.SimpleNamespace(**vars(ops))
    base_diffuse = ops.diffuse
    base_multi = ops.diffuse_multi
    base_multi_splat = ops.diffuse_multi_splat

    def diffuse(fields, dt, k, iters):
        if fields.shape[0] == 2:  # velocity planes: swept coefficient
            return base_diffuse(fields, dt, diffusion, iters)
        return base_diffuse(fields, dt, k, iters)

    def diffuse_multi(fields, dt, coeffs, iters):
        # channels 0-1 are velocity (see pipelines fused-diffusion stage)
        coeffs = jnp.asarray(coeffs, jnp.float32).at[:2].set(diffusion)
        return base_multi(fields, dt, coeffs, iters)

    def diffuse_multi_splat(fields, dt, coeffs, iters, amps, last, radius):
        coeffs = jnp.asarray(coeffs, jnp.float32).at[:2].set(diffusion)
        return base_multi_splat(fields, dt, coeffs, iters, amps, last, radius)

    patched.diffuse = diffuse
    patched.diffuse_multi = diffuse_multi
    patched.diffuse_multi_splat = diffuse_multi_splat
    from cudafluidsimulation_tpu.models.pipelines import make_step

    return make_step(config, patched)
