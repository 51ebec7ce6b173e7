"""A/B the 8192^2 pressure_project paths on-chip, delta-timed.

Path NEW (e1629a3, committed during a relay outage, unmeasured):
  divergence kernel -> all-tiled pressure_solve bursts -> project kernel.
Path OLD (round-3 measured at 122 ms/step composite):
  flat fused first/last bursts (r=16) + tiled middle bursts.

Also times the pieces (divergence, project, pressure_solve) and sweeps
burst depth at 8192^2 (the probe the relay outage interrupted).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from cudafluidsimulation_tpu.ops import jacobi_pallas as jp  # noqa: E402

n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
iters = 100
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
v = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
d0 = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))


def delta_time(fn, *args, n_short=2, n_long=6):
    # NOTE: big arrays must come in via *args, not closures — the compile
    # relay ships closed-over constants in the request body (HTTP 413).
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


pp_raw = jp.pressure_project.__wrapped__  # un-jitted: lets us fork paths

cases = []
if "solve" in sys.argv or len(sys.argv) <= 2:
    cases.append(("pressure_solve(100) all-tiled  ",
                  lambda dd: jp.pressure_solve(dd, iters, burst=8), (d0,)))
cases += [
    ("divergence kernel              ",
     lambda uu, vv: jp.divergence(uu, vv, False), (u, v)),
    ("project kernel                 ",
     lambda uu, vv, dd: jp.project(uu, vv, dd)[0], (u, v, d0)),
    ("pressure_project NEW (kernels) ",
     lambda uu, vv: pp_raw(uu, vv, iters, False, burst=8)[0], (u, v)),
]

print(f"== pressure path A/B at {n}^2, {iters} iters ==", flush=True)
for name, fn, args in cases:
    try:
        ms = delta_time(fn, *args)
        print(f"{name}: {ms:8.2f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

# OLD path: disable the wide-grid branch so the flat fused end bursts run
_saved = jp.divergence_supported
jp.divergence_supported = lambda h, w: False
try:
    ms = delta_time(lambda uu, vv: pp_raw(uu, vv, iters, False, burst=8)[0],
                    u, v)
    print(f"pressure_project OLD (flat end): {ms:8.2f} ms", flush=True)
finally:
    jp.divergence_supported = _saved

print(f"== burst sweep, pressure_solve({iters}) at {n}^2 ==", flush=True)
for b in (10, 12, 16):
    try:
        ms = delta_time(lambda dd, bb=b: jp.pressure_solve(dd, iters, burst=bb), d0)
        print(f"burst={b:2d}: {ms:8.2f} ms", flush=True)
    except Exception as e:
        print(f"burst={b:2d}: FAILED {type(e).__name__}: {e}", flush=True)
