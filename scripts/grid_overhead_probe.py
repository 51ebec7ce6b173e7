"""Per-program overhead / effective DMA bandwidth probe.

A pure copy kernel moves the same 268 MB (read) + 268 MB (write) at every
strip height; any cost growth as r shrinks (more programs) is per-program
overhead, and the flat floor is the achievable HBM bandwidth through the
pallas pipeline.  Motivated by the 8192² vorticity stage measuring 7.8 ms
against a ~2 ms DMA bound with 512 r=16 programs.
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

n = 8192
x = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (1, n, n)))()


def copy_fn(r, t_cnt=1):
    def kern(a, o):
        o[0] = a[0]

    bs = pl.BlockSpec((1, r, n // t_cnt), lambda i, t: (0, i, t),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, n, n), jnp.float32),
        grid=(n // r, t_cnt),
        in_specs=[bs],
        out_specs=bs,
    )


def delta_time(fn, a, n_short=2, n_long=10):
    def make(k):
        @jax.jit
        def run(xx):
            def body(c, _):
                return fn(c), None

            c, _ = jax.lax.scan(body, xx, None, length=k)
            return c[0, 0, 0]

        return run

    short, long_ = make(n_short), make(n_long)
    float(short(a)); float(long_(a))

    def t(g):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(a))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(long_) - t(short)) / (n_long - n_short) * 1e3


print("== copy-kernel grid-overhead probe, 8192^2 f32 (536 MB moved) ==",
      flush=True)
for r, t_cnt in ((64, 1), (32, 1), (16, 1), (8, 1), (64, 4), (16, 4)):
    ms = delta_time(copy_fn(r, t_cnt), x)
    progs = n // r * t_cnt
    print(f"r={r:4d} t={t_cnt}  programs={progs:5d}  {ms:7.3f} ms"
          f"  -> {0.536/ms*1e3:6.1f} GB/s  {ms/progs*1e3:7.2f} us/program",
      flush=True)
