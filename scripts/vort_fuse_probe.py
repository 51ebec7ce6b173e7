"""Baseline costs the REJECTED dye-advect+vorticity fusion was judged
against: isolated advect_dye and the standalone vorticity kernel at
8192^2 on iid-random velocity (fixed field — no stage-scan
self-amplification).

Historical record (the fused implementation was measured and removed
before ever being committed — it exists only in the round-3 session
notes): on this exact workload the fused kernel (dye 3x3 blocks + u,v
3x3 halo-sliver blocks, 27 operands, confinement in-kernel) measured
121.78 ms vs advect_dye's 80.01 ms, i.e. +41.8 ms for work the
standalone kernel below does in ~4.4 ms; a confinement-stubbed variant
(identical operands/outputs, compute replaced by copies) measured
95.62 ms, attributing +15.6 ms to the operand structure alone.  Lesson:
many-small-operand pallas programs pay real DMA-stream cost; fusions
must reuse whole blocks (see docs/ROADMAP.md and CLAUDE.md).

Note the absolute advect numbers here are the kernel's WORST case —
iid-random velocity makes every per-dy dx window span the full
displacement ball; the in-step developed-flow dye advect is ~8-9 ms.
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from cudafluidsimulation_tpu.ops import advect_pallas as ap  # noqa: E402
from cudafluidsimulation_tpu.ops import jacobi_pallas as jp  # noqa: E402

n = 8192
d = 15
u = jax.jit(lambda k: jax.random.normal(k, (n, n)) * 50.0)(
    jax.random.PRNGKey(0))
v = jax.jit(lambda k: jax.random.normal(k, (n, n)) * 50.0)(
    jax.random.PRNGKey(1))
dye = jax.jit(lambda k: jax.random.uniform(k, (3, n, n)))(
    jax.random.PRNGKey(2))
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

    return (t(long_, *args) - t(short, *args)) / (n_long - n_short) * 1e3


ms = delta_time(lambda dd, uu, vv: ap.advect_dye(dd, uu, vv, dt, 1.2, d=d),
                dye, u, v)
print(f"advect_dye alone:        {ms:7.2f} ms", flush=True)


def delta_time_uv(n_short=2, n_long=6):
    def make(k):
        @jax.jit
        def run(uu, vv):
            def body(c, _):
                u2, v2 = jp.vorticity_confinement(c[0], c[1], dt, 30.0,
                                                  variant="gpu")
                return (c[0] * 0.999 + 1e-6 * u2,
                        c[1] * 0.999 + 1e-6 * v2), None

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
