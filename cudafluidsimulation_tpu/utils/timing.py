"""Per-stage timing and the end-of-run report.

The reference hand-rolls running averages around every stage with
``cudaDeviceSynchronize`` between kernels (cpuFluidSim.cpp:329-385,
GPUFluidSim.cu:609-712) and prints a report at exit (Main.cpp:183-206).
On TPU, syncing inside the hot loop would serialize the pipeline, so the
production path times whole jitted ``lax.scan`` segments; this module
provides (a) that whole-loop timing and (b) an out-of-band per-stage
breakdown that runs each stage as its own jitted function purely for
reporting — never inside the hot loop.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List

import jax


@dataclass
class StageReport:
    grid: str
    steps: int
    total_s: float
    stage_ms: Dict[str, float] = field(default_factory=dict)

    @property
    def steps_per_sec(self) -> float:
        return self.steps / self.total_s if self.total_s > 0 else float("inf")

    def format(self) -> str:
        # Same shape as the reference's exit report (Main.cpp:195-206).
        lines = [
            "================ SIMULATION END ======================",
            f"Grid: {self.grid}   Steps: {self.steps}",
            "------------------------------------------------------",
            f"Average compute time: {1000.0 * self.total_s / max(1, self.steps):.3f}ms / step",
            f"Throughput: {self.steps_per_sec:.1f} steps/s",
            "------------------------------------------------------",
        ]
        for name, ms in self.stage_ms.items():
            lines.append(f"{name} compute time: {ms:.3f}ms")
        lines.append("======================================================")
        return "\n".join(lines)


def time_fn(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median wall seconds per call of a jitted fn.

    NOTE: on the tunneled-TPU environment a single dispatch costs 25-40 ms of
    relay latency, so this is only trustworthy for fns that are themselves
    long scans.  For individual stages use :func:`time_scanned`, which runs
    the stage n times inside ONE dispatch.

    Syncs by fetching a scalar element of the result to the host (see
    :func:`time_scanned` — ``block_until_ready`` can return early here)."""
    @jax.jit
    def run(*a):
        leaf = jax.tree.leaves(fn(*a))[0]
        return leaf[(0,) * getattr(leaf, "ndim", 0)]

    for _ in range(warmup):
        float(run(*args))
    times: List[float] = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(run(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def time_scanned(body, init_carry, n: int = 24, iters: int = 3,
                 warmup: int = 1) -> float:
    """Best-of wall seconds per application of ``body`` measured as one
    jitted ``lax.scan`` of ``n`` applications (one dispatch amortizes the
    relay's per-call latency; best-of resists its multi-second stalls).

    ``body(carry, eps) -> carry`` must thread its output back into its input
    so XLA cannot hoist or CSE the iterations; ``eps`` is a traced f32 scalar
    that is 0.0 at runtime — mix loop-invariant operands with ``x + eps * y``
    to create a formal (value-preserving) dependence on the previous
    iteration.

    Sync is a SCALAR element of the final carry computed inside the jitted
    program and fetched to the host — ``block_until_ready`` through this
    environment's relay intermittently returns before the program finishes
    (a round-3 8192² step measured 122 ms by block_until_ready vs 149 ms by
    host-transfer sync, below its own stage sum; the host transfer agrees
    with the stage sum).
    """
    import jax.numpy as jnp

    @jax.jit
    def run(carry, epss):
        out = jax.lax.scan(lambda c, e: (body(c, e), None), carry, epss)[0]
        leaf = jax.tree.leaves(out)[0]
        # scalar element (no ravel/reshape: 1-D relayouts are not free here)
        return leaf[(0,) * getattr(leaf, "ndim", 0)]

    epss = jnp.zeros((n,), jnp.float32)
    for _ in range(warmup):
        float(run(init_carry, epss))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(run(init_carry, epss))
        best = min(best, time.perf_counter() - t0)
    return best / n
