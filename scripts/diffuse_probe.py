"""Delta-timed Jacobi-stage probe: burst / block_rows sweeps at 2048^2.

Usage: python scripts/diffuse_probe.py (from the repo root).

Times diffuse_multi (5 channels x 20 iters — the parity diffusion stage)
and pressure_project (40 iters) for burst/block_rows variants as jitted
lax.scan deltas (two scan lengths subtracted; sync via host transfer), so
the tunnel's dispatch latency cancels.  VERDICT r2 #3: diffuse measured
~2.3 ms vs its 1.79 ms in-VMEM floor (1.29x) — the suspects are per-burst
HBM round trips (3 bursts at burst=8) and halo compute overhead.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from cudafluidsimulation_tpu.ops import jacobi_pallas as jp  # noqa: E402

n = 2048
rng = np.random.default_rng(0)
fields = jnp.asarray(rng.standard_normal((5, n, n)).astype(np.float32))
u = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
v = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
coeffs = jnp.asarray([0.8] * 5, jnp.float32)
dt = 1.0 / 60.0


def delta_time(fn, *args, n_short=3, n_long=13):
    def make(k):
        @jax.jit
        def run(f0, *rest):
            def body(f, _):
                y = fn(f, *rest)
                return f0 + 1e-30 * y, None

            f, _ = jax.lax.scan(body, f0, None, length=k)
            return jnp.sum(f)

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


print("== diffuse_multi: 5ch x 20 iters at 2048^2 "
      "(in-VMEM floor 1.79 ms; r2 achieved ~2.3) ==")
for br in (128, 256):
    for burst in (5, 7, 8, 10, 12, 16, 20):
        try:
            def fn(f, _br=br, _bu=burst):
                return jp.diffuse_multi(f, dt, coeffs, 20, block_rows=_br,
                                        burst=_bu)

            ms = delta_time(fn, fields)
            print(f"block_rows={br} burst={burst}: {ms:6.3f} ms")
        except Exception as e:
            print(f"block_rows={br} burst={burst}: FAILED "
                  f"({type(e).__name__}: {str(e)[:100]})")

print("== pressure_project: 40 iters at 2048^2 ==")
for br in (128, 256):
    for burst in (8, 10, 14, 20):
        try:
            def fn(uu, _br=br, _bu=burst):
                u2, v2, p = jp.pressure_project(uu, v, 40, True,
                                                block_rows=_br, burst=_bu)
                return u2

            ms = delta_time(fn, u)
            print(f"block_rows={br} burst={burst}: {ms:6.3f} ms")
        except Exception as e:
            print(f"block_rows={br} burst={burst}: FAILED "
                  f"({type(e).__name__}: {str(e)[:100]})")
