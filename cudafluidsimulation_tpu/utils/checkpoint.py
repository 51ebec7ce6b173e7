"""Checkpoint / resume of the simulation state pytree.

The reference has no checkpointing at all (SURVEY.md §5) — its state is mouse
input history baked into mutable arrays.  Here the whole FluidState is a
pytree, so save/restore is a flat npz round trip.
"""

from __future__ import annotations

import numpy as np

from cudafluidsimulation_tpu.state import FluidState


def save_state(path: str, state: FluidState) -> None:
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in state._asdict().items()})


def load_state(path: str) -> FluidState:
    import jax.numpy as jnp

    with np.load(path) as data:
        return FluidState(**{k: jnp.asarray(data[k]) for k in FluidState._fields})
