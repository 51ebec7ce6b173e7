"""Checkpoint / resume of the simulation state pytree.

The reference has no checkpointing at all (SURVEY.md §5) — its state is mouse
input history baked into mutable arrays.  Here the whole FluidState is a
pytree, so save/restore is a flat npz round trip.

Writes are crash-safe: the npz is written to a temp file in the target
directory and atomically renamed over the destination (`os.replace`), so a
kill mid-write can never corrupt an existing checkpoint.  When overwriting,
the previous checkpoint is first rotated to ``<path>.prev.npz`` — a torn
*rename* window (crash between the two replaces) still leaves the rotated
copy loadable via :func:`load_state_with_fallback`.
"""

from __future__ import annotations

import os

import numpy as np

from cudafluidsimulation_tpu.state import FluidState


def _norm(path: str) -> str:
    # np.savez_compressed appends .npz itself; normalize so save and load
    # agree for extensionless paths
    return path if path.endswith(".npz") else path + ".npz"


def prev_path(path: str) -> str:
    """The rotation target for the previously saved checkpoint."""
    p = _norm(path)
    return p[: -len(".npz")] + ".prev.npz"


def save_state(path: str, state: FluidState, rotate: bool = True) -> None:
    """Atomically write ``state``; keep the prior file as ``.prev.npz``.

    Order of operations: write tmp → fsync → rotate old → replace.  A crash
    at any point leaves at least one complete, loadable checkpoint on disk
    (the old one until the final ``os.replace``, the new one after).
    """
    dst = _norm(path)
    parent = os.path.dirname(dst)
    if parent:
        os.makedirs(parent, exist_ok=True)
    tmp = dst + f".tmp.{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            np.savez_compressed(
                f, **{k: np.asarray(v) for k, v in state._asdict().items()}
            )
            f.flush()
            os.fsync(f.fileno())
        if rotate and os.path.exists(dst):
            os.replace(dst, prev_path(dst))
        os.replace(tmp, dst)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def load_state(path: str) -> FluidState:
    import jax.numpy as jnp

    with np.load(_norm(path)) as data:
        fields = {}
        for k in FluidState._fields:
            if k == "vel_stats" and k not in data.files:
                # checkpoints written before the producer-emitted velocity
                # stats existed: recompute the bound from the saved fields
                # (a one-time host-side reduction at load)
                fields[k] = jnp.asarray(
                    np.stack([np.max(np.abs(data["u"])),
                              np.max(np.abs(data["v"]))]).astype(np.float32))
                continue
            fields[k] = jnp.asarray(data[k])
        return FluidState(**fields)


def load_state_with_fallback(path: str) -> FluidState:
    """Load ``path``; if it is missing or unreadable (torn write from a
    pre-atomic writer, partial disk), fall back to the rotated ``.prev.npz``."""
    try:
        return load_state(path)
    except Exception:
        fb = prev_path(path)
        if os.path.exists(fb):
            return load_state(fb)
        raise
