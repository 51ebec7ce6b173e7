"""Isolated cost of advect_dye_vorticity vs its unfused composition at
8192^2 (fixed velocity — the stage-scan's confinement self-amplification
cannot pollute these numbers)."""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from cudafluidsimulation_tpu.ops import advect_pallas as ap  # noqa: E402
from cudafluidsimulation_tpu.ops import jacobi_pallas as jp  # noqa: E402

n = 8192
d = 15
key = jax.random.PRNGKey(0)
u = jax.jit(lambda k: jax.random.normal(k, (n, n)) * 50.0)(key)
v = jax.jit(lambda k: jax.random.normal(k, (n, n)) * 50.0)(jax.random.PRNGKey(1))
dye = jax.jit(lambda k: jax.random.uniform(k, (3, n, n)))(jax.random.PRNGKey(2))
dt = 1 / 60


def delta_time(fn, *args, n_short=2, n_long=6):
    def make(k):
        @jax.jit
        def run(dd, *rest):
            def body(c, _):
                out = fn(c, *rest)
                out0 = out[0] if isinstance(out, tuple) else out
                return dd * 0.999 + 1e-6 * out0, None

            c, _ = jax.lax.scan(body, dd, None, length=k)
            return c[(0,) * c.ndim]

        return run

    short, long_ = make(n_short), make(n_long)
    float(short(*args)); float(long_(*args))

    def t(g, *a):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(short, *args), (t(long_, *args) - t(short, *args))
            / (n_long - n_short) * 1e3)


_, ms = delta_time(lambda dd, uu, vv: ap.advect_dye(dd, uu, vv, dt, 1.2, d=d),
                   dye, u, v)
print(f"advect_dye alone:        {ms:7.2f} ms", flush=True)
_, ms = delta_time(lambda dd, uu, vv: ap.advect_dye_vorticity(
    dd, uu, vv, dt, 1.2, 30.0, variant="gpu", d=d)[0], dye, u, v)
print(f"advect_dye_vorticity:    {ms:7.2f} ms", flush=True)


def vort_only(uu, vv):
    return jp.vorticity_confinement(uu, vv, dt, 30.0, variant="gpu")


@jax.jit
def vrun(uu, vv, k):
    pass


def delta_time_uv(n_short=2, n_long=6):
    def make(k):
        @jax.jit
        def run(uu, vv):
            def body(c, _):
                u2, v2 = vort_only(c[0], c[1])
                return (c[0] * 0.999 + 1e-6 * u2, c[1] * 0.999 + 1e-6 * v2), None

            c, _ = jax.lax.scan(body, (uu, vv), None, length=k)
            return c[0][0, 0]

        return run

    short, long_ = make(n_short), make(n_long)
    float(short(u, v)); float(long_(u, v))

    def t(g):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(u, v))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(long_) - t(short)) / (n_long - n_short) * 1e3


print(f"vorticity standalone:    {delta_time_uv():7.2f} ms", flush=True)
