"""Checkpoint / resume of the simulation state pytree.

The reference has no checkpointing at all (SURVEY.md §5) — its state is mouse
input history baked into mutable arrays.  Here the whole FluidState is a
pytree, so save/restore is a flat npz round trip.
"""

from __future__ import annotations

import numpy as np

from cudafluidsimulation_tpu.state import FluidState


def _norm(path: str) -> str:
    # np.savez_compressed appends .npz itself; normalize so save and load
    # agree for extensionless paths
    return path if path.endswith(".npz") else path + ".npz"


def save_state(path: str, state: FluidState) -> None:
    np.savez_compressed(
        _norm(path), **{k: np.asarray(v) for k, v in state._asdict().items()}
    )


def load_state(path: str) -> FluidState:
    import jax.numpy as jnp

    with np.load(_norm(path)) as data:
        return FluidState(**{k: jnp.asarray(data[k]) for k in FluidState._fields})
