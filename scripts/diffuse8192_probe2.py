"""Diffuse burst fixed-cost decomposition at 8192^2.

probe1 found: rate ~0.38 ms/field-sweep (vs 0.287 predicted by the 235G
ceiling x1.266 geometry) + ~7 ms fixed per burst.  Candidates: per-program
launch overhead (grid 5x64x4 = 1280 programs), the _halo_cols build, or
non-overlapped DMA.  k=1 bursts give the intercept; forced t_cnt/r variants
move the program count at ~constant compute.
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from cudafluidsimulation_tpu.ops import jacobi_pallas as jp  # noqa: E402

n = 8192
rng = np.random.default_rng(0)
f5 = jnp.asarray(rng.standard_normal((5, n, n)).astype(np.float32))
d0 = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
alpha5 = jnp.full((5, 1), 38.4, jnp.float32)


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


def forced_plan(plan):
    def fn(ff, al, k=8):
        saved = jp._col_plan
        jp._col_plan = lambda *a, **kw: plan
        try:
            return jp._diffuse_bursts(ff, al, k, 256, 8)
        finally:
            jp._col_plan = saved
    return fn


cases = [
    ("burst k=1 default plan        ",
     lambda ff, al: jp._diffuse_bursts(ff, al, 1, 256, 8), (f5, alpha5)),
    ("burst k=2 default plan        ",
     lambda ff, al: jp._diffuse_bursts(ff, al, 2, 256, 8), (f5, alpha5)),
    ("burst k=8 default (2048/128/4/128)",
     lambda ff, al: jp._diffuse_bursts(ff, al, 8, 256, 8), (f5, alpha5)),
    ("burst k=8 forced (4096/128/2/64)  ",
     forced_plan((4096, 128, 2, 64)), (f5, alpha5)),
    ("burst k=8 forced (2048/128/4/64)  ",
     forced_plan((2048, 128, 4, 64)), (f5, alpha5)),
    ("burst k=8 forced (1024/128/8/256) ",
     forced_plan((1024, 128, 8, 256)), (f5, alpha5)),
    ("pressure burst k=8 (1ch, cmp)  ",
     lambda dd: jp.pressure_solve(dd, 8, burst=8), (d0,)),
]

print(f"== diffuse fixed-cost probe at {n}^2 ==", flush=True)
for name, fn, args in cases:
    try:
        ms = delta_time(fn, *args)
        print(f"{name}: {ms:8.2f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
