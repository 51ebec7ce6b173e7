"""Row-halo exchange over a mesh axis with lax.ppermute.

The building block of the explicit multi-chip path (SURVEY.md §5): fields
are row-sharded over the "x" mesh axis; each stencil/advection op first
fetches ``width`` boundary rows from its neighbors over ICI, then computes
locally on the padded array.  Physical domain edges (first/last shard) get
clamped-BC padding instead: edge replication for 1-wide stencil halos and
mirror (even) reflection for multi-sweep Jacobi bursts — the same exact
Neumann ghost treatments the single-chip pallas kernels use.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _perm(n: int, up: bool):
    # up: data flows to higher rank (i -> i+1)
    return [(i, i + 1) for i in range(n - 1)] if up else [(i, i - 1) for i in range(1, n)]


def exchange_rows(a: jnp.ndarray, width: int, axis_name: str,
                  edge: str = "clamp") -> jnp.ndarray:
    """Pad local (..., Hl, W) rows with ``width`` halo rows from mesh
    neighbors; physical edges padded per ``edge``: "clamp" (replicate edge
    row) or "mirror" (even reflection, exact for Jacobi bursts)."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    top_rows = a[..., -width:, :]  # my highest rows -> neighbor above's low halo
    bot_rows = a[..., :width, :]  # my lowest rows -> neighbor below's high halo

    from_below = lax.ppermute(top_rows, axis_name, _perm(n, up=True))
    from_above = lax.ppermute(bot_rows, axis_name, _perm(n, up=False))

    if edge == "mirror":
        low_fill = jnp.flip(a[..., :width, :], axis=-2)
        high_fill = jnp.flip(a[..., -width:, :], axis=-2)
    else:
        reps = [1] * (a.ndim - 2) + [width, 1]
        low_fill = jnp.tile(a[..., :1, :], reps)
        high_fill = jnp.tile(a[..., -1:, :], reps)

    low = jnp.where(idx == 0, low_fill, from_below)
    high = jnp.where(idx == n - 1, high_fill, from_above)
    return jnp.concatenate([low, a, high], axis=-2)


def shift_x_clamped(a: jnp.ndarray, d: int) -> jnp.ndarray:
    """x (lane) shifts never cross shards — plain clamped shift."""
    from cudafluidsimulation_tpu.ops.stencil import shift_x

    return shift_x(a, d)


def neighbors_padded(ap: jnp.ndarray, width: int = 1) -> Tuple[jnp.ndarray, ...]:
    """(left, right, below, above) for the un-padded core of an
    ``exchange_rows``-padded array (y-neighbors come from the halo)."""
    hl = ap.shape[-2] - 2 * width
    core = ap[..., width : width + hl, :]
    left = shift_x_clamped(core, -1)
    right = shift_x_clamped(core, 1)
    below = ap[..., width - 1 : width - 1 + hl, :]
    above = ap[..., width + 1 : width + 1 + hl, :]
    return left, right, below, above
