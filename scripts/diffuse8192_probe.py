"""Isolated diffuse timings at 8192^2 (stage_timings says 53.6 ms vs the
32.5 ms geometry model; pressure_solve does the same 100 cell-sweeps in 37.2
ms with 13 HBM trips vs diffuse's 3 — so diffuse has ~16 ms of structural
overhead to find).  Delta-timed scans; big arrays passed as args (closures
ship as constants through the compile relay -> HTTP 413).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from cudafluidsimulation_tpu.ops import jacobi_pallas as jp  # noqa: E402

n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
rng = np.random.default_rng(0)
f5 = jnp.asarray(rng.standard_normal((5, n, n)).astype(np.float32))
coeffs = jnp.asarray([0.8, 0.8, 0.001, 0.001, 0.001], jnp.float32)
alpha5 = (coeffs * coeffs / jnp.float32(1 / 60.0)).reshape(5, 1)
amps = jnp.asarray([0.0, 0.0, 0.5, 0.4, 0.3], jnp.float32)
last = jnp.asarray([n / 2.0, n / 2.0], jnp.float32)
dt = 1.0 / 60.0


def delta_time(fn, *args, n_short=2, n_long=6):
    def make(k):
        @jax.jit
        def run(x, *rest):
            def body(c, _):
                y = fn(c, *rest)
                y0 = y[0] if isinstance(y, tuple) else y
                return x + 1e-30 * y0, None

            c, _ = jax.lax.scan(body, x, None, length=k)
            return jnp.sum(c)

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


cases = [
    ("diffuse_multi 20it burst=8 (3 trips)",
     lambda ff, cc: jp.diffuse_multi(ff, dt, cc, 20), (f5, coeffs)),
    ("diffuse_multi_splat (the step's op) ",
     lambda ff, cc, aa, ll: jp.diffuse_multi_splat(
         ff, dt, cc, 20, aa, ll, 300.0), (f5, coeffs, amps, last)),
    ("one burst k=8 (tiled)              ",
     lambda ff, al: jp._diffuse_bursts(ff, al, 8, 256, 8), (f5, alpha5)),
    ("one burst k=4 (tiled)              ",
     lambda ff, al: jp._diffuse_bursts(ff, al, 4, 256, 8), (f5, alpha5)),
    ("_halo_cols(5ch) alone              ",
     lambda ff: jp._halo_cols(ff, 128, 1024, 8), (f5,)),
    ("diffuse_multi 20it burst=10 (2 trips)",
     lambda ff, cc: jp.diffuse_multi(ff, dt, cc, 20, burst=10), (f5, coeffs)),
    ("diffuse_multi 20it burst=20 (1 trip)",
     lambda ff, cc: jp.diffuse_multi(ff, dt, cc, 20, burst=20), (f5, coeffs)),
]

print(f"== diffuse probe at {n}^2 ==", flush=True)
for name, fn, args in cases:
    try:
        ms = delta_time(fn, *args)
        print(f"{name}: {ms:8.2f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
