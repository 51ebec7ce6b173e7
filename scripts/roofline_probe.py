"""VPU roofline probes (TPU): in-VMEM Jacobi sweep ceiling + FMA throughput.

Sync via host transfer of a reduced scalar — block_until_ready does not
reliably block through the axon relay.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, R = 2048, 2048, 256


def sweep_kernel(x_ref, o_ref, *, k):
    x = x_ref[:]
    for _ in range(k):
        l = jnp.concatenate([x[:, :1], x[:, :-1]], 1)
        r = jnp.concatenate([x[:, 1:], x[:, -1:]], 1)
        b = jnp.concatenate([x[:1], x[:-1]], 0)
        t = jnp.concatenate([x[1:], x[-1:]], 0)
        x = (l + r + b + t - x) * 0.25
    o_ref[:] = x


def fma_kernel(x_ref, o_ref, *, k):
    # 8 independent chains -> throughput-bound, not latency-bound
    xs = [x_ref[:] * (1.0 + 1e-6 * i) for i in range(8)]
    for _ in range(k):
        xs = [x * 1.0000001 + 1e-7 for x in xs]
    acc = xs[0]
    for x in xs[1:]:
        acc = acc + x
    o_ref[:] = acc


def run_probe(kernel, k, n_chains, label, ops_per_cell_iter):
    f = pl.pallas_call(
        functools.partial(kernel, k=k),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        grid=(H // R,),
        in_specs=[pl.BlockSpec((R, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )

    # delta timing between two scan lengths cancels the constant relay /
    # transfer overhead exactly
    L1, L2 = 16, 144

    def make(length):
        @jax.jit
        def run(x):
            out = jax.lax.scan(lambda c, _: (f(c), None), x, None,
                               length=length)[0]
            return jnp.sum(out)
        return run

    r1, r2 = make(L1), make(L2)
    x = jnp.asarray(np.random.default_rng(0).random((H, W), np.float32))
    float(r1(x)); float(r2(x))
    b1 = b2 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(r1(x)); b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(r2(x)); b2 = min(b2, time.perf_counter() - t0)
    iters = (L2 - L1) * k * n_chains
    per_iter = (b2 - b1) / iters
    cells = H * W
    rate = cells / per_iter
    print(f"{label}: {1e9*per_iter/cells:.4f} ns/cell/iter -> "
          f"{rate/1e9:.1f} Gcell-iter/s, "
          f"{ops_per_cell_iter*rate/1e12:.2f} T op/s", flush=True)
    return rate


for k in (4, 8, 16):
    run_probe(sweep_kernel, k, 1, f"jacobi sweep k={k} (VMEM)", 10)
fma = run_probe(fma_kernel, 64, 8, "FMA x8 chains", 2)
