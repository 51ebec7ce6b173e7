"""Simulation health checks — the failure-detection layer the reference
lacks entirely (SURVEY.md §5: only a CUDA abort macro).

Numerical blow-up in a stable-fluids step shows up as NaN/Inf fields or
runaway velocity magnitudes.  These helpers make that observable at the
harness level without touching the hot loop: run segments, check between
segments, and report the segment where health was lost.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from cudafluidsimulation_tpu.state import FluidState


class Health(NamedTuple):
    finite: bool
    max_speed: float
    max_dye: float

    @property
    def ok(self) -> bool:
        return self.finite


class HealthError(RuntimeError):
    pass


@jax.jit
def _health_stats(state: FluidState):
    finite = (
        jnp.isfinite(state.u).all()
        & jnp.isfinite(state.v).all()
        & jnp.isfinite(state.dye).all()
        & jnp.isfinite(state.pressure).all()
    )
    speed = jnp.sqrt(jnp.max(state.u * state.u + state.v * state.v))
    return finite, speed, jnp.max(state.dye)


def check_health(state: FluidState, max_speed: Optional[float] = None) -> Health:
    finite, speed, dye = _health_stats(state)
    h = Health(bool(finite), float(speed), float(dye))
    if not h.finite:
        raise HealthError(
            f"non-finite fields at step {int(state.step)} "
            f"(t={float(state.t):.4f})"
        )
    if max_speed is not None and h.max_speed > max_speed:
        raise HealthError(
            f"velocity blow-up at step {int(state.step)}: "
            f"max speed {h.max_speed:.1f} > limit {max_speed:.1f}"
        )
    return h


def run_checked(sim, state: FluidState, impulses, segment: int = 100,
                max_speed: Optional[float] = None) -> FluidState:
    """Run a rollout in ``segment``-step slices with a health check between
    slices; raises HealthError naming the failing segment."""
    from cudafluidsimulation_tpu.utils.impulse import Impulse

    total = int(impulses.pressed.shape[0])
    start = 0
    while start < total:
        end = min(start + segment, total)
        part = Impulse(*(f[start:end] for f in impulses))
        state = sim.run(state, part)
        check_health(state, max_speed=max_speed)
        start = end
    return state
