"""Burst-depth probe at 8192^2 (ROADMAP gap #1's pending sweep).

Times SINGLE bursts per depth (chain cost = sum over the schedule's bursts;
full-chain scans cost too many tunnel compiles).  Deeper bursts trade fewer
HBM round trips for more halo compute ((r+2hd)/r x (wt+2wd)/wt); the
in-kernel ghost fill (round 3) removed the per-burst pad build, so the
per-burst fixed cost left is the raw field round trip.
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from cudafluidsimulation_tpu.ops import jacobi_pallas as jp  # noqa: E402

n = 8192
# generate ON DEVICE: host gen + 1.3GB tunnel transfer costs minutes
f5 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (5, n, n)))()
d0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(1), (n, n)))()
alpha5 = jnp.full((5, 1), 38.4, jnp.float32)


def delta_time(fn, *args, n_short=2, n_long=8):
    def make(k):
        @jax.jit
        def run(x, *rest):
            def body(c, _):
                y = fn(c, *rest)
                y0 = y[0] if isinstance(y, tuple) else y
                return x + 1e-30 * y0, None

            c, _ = jax.lax.scan(body, x, None, length=k)
            return c[(0,) * c.ndim]

        return run

    short, long_ = make(n_short), make(n_long)

    def t(g, *a):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    float(short(*args)); float(long_(*args))
    return (t(long_, *args) - t(short, *args)) / (n_long - n_short) * 1e3


print(f"== single-burst depth probe at {n}^2 ==", flush=True)
for k in (4, 8, 10, 16, 20):
    try:
        ms = delta_time(lambda ff, al, k=k:
                        jp._diffuse_bursts(ff, al, k, 256, k), f5, alpha5)
        print(f"diffuse 5ch single burst k={k:3d}: {ms:8.2f} ms"
              f"  ({ms/k:6.3f} ms/sweep)", flush=True)
    except Exception as e:
        print(f"diffuse k={k}: FAILED {type(e).__name__}: {e}", flush=True)
for k in (8, 16, 32):
    try:
        ms = delta_time(lambda dd, k=k:
                        jp.pressure_solve(dd, k, burst=k), d0)
        print(f"pressure single burst  k={k:3d}: {ms:8.2f} ms"
              f"  ({ms/k:6.3f} ms/sweep)", flush=True)
    except Exception as e:
        print(f"pressure k={k}: FAILED {type(e).__name__}: {e}", flush=True)
