"""Roll-share probe for the dye advect kernel (ROADMAP gap: bf16-packed
dye rolls are only worth building if rolls dominate).

Times advect_dye at 2048²/d=31 on a bench-like swirl flow with
(a) the real kernel, (b) dy-rolls stubbed to identity, (c) ALL rolls
stubbed.  The stubs keep loop trip counts (windows come from the data,
which is unchanged) and kernel structure; only the roll work disappears.
Numerics are wrong under the stubs — timing only.
"""
import sys
import time
import types

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from cudafluidsimulation_tpu.ops import advect_pallas as ap  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
d = int(sys.argv[2]) if len(sys.argv) > 2 else 31
dt = 1 / 60


@jax.jit
def swirl():
    ys = jnp.arange(n, dtype=jnp.float32)[:, None] - n / 2
    xs = jnp.arange(n, dtype=jnp.float32)[None, :] - n / 2
    rr = jnp.sqrt(ys * ys + xs * xs) + 1e-3
    # |v| ~ 1200 near mid-radius -> |v|*dt ~ 20 cells, like the driven bench
    mag = 1200.0 * jnp.exp(-((rr - n / 4) / (n / 8)) ** 2)
    return -mag * ys / rr, mag * xs / rr


u, v = swirl()
dye = jax.jit(lambda k: jax.random.uniform(k, (3, n, n)))(jax.random.PRNGKey(0))


def delta_time(fn, *args, n_short=2, n_long=8):
    def make(k):
        @jax.jit
        def run(dd, *rest):
            def body(c, _):
                return c * 0.999 + 1e-6 * fn(c, *rest), None

            c, _ = jax.lax.scan(body, dd, None, length=k)
            return c[0, 0, 0]

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


real_roll = pltpu.roll


def run_case(tag, stub_axis1, stub_axis2):
    def roll(x, shift, axis=0, **kw):
        if (axis == 1 and stub_axis1) or (axis == 2 and stub_axis2):
            return x
        return real_roll(x, shift, axis=axis, **kw)

    shim = types.SimpleNamespace(**{k: getattr(pltpu, k) for k in dir(pltpu)
                                    if not k.startswith("_")})
    shim.roll = roll
    orig = ap.pltpu
    ap.pltpu = shim
    # module-level jits cache traced jaxprs by (fun, avals) — without this
    # the stubbed cases would silently reuse the first case's real-roll
    # trace and measure nothing
    jax.clear_caches()
    try:
        ms = delta_time(
            lambda dd, uu, vv: ap.advect_dye(dd, uu, vv, dt, 1.2, d=d),
            dye, u, v)
    finally:
        ap.pltpu = orig
    print(f"{tag:28s} {ms:7.2f} ms", flush=True)
    return ms


a = run_case("advect_dye real", False, False)
b = run_case("dy-rolls stubbed", True, False)
c = run_case("all rolls stubbed", True, True)
print(f"dy-roll share: {(a - b) / a * 100:.0f}%   "
      f"all-roll share: {(a - c) / a * 100:.0f}%", flush=True)
