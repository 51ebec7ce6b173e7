"""Isolated vorticity-confinement timings at 8192^2.

In-step attribution says ~7.8 ms; the traffic model says ~4.5 ms at the
default flat r=32 geometry (reads 2 fields x (r + 2*8 sliver halos), writes
2 fields => 1.25x read overhead; 1.07 GB essential / ~0.3 GB/ms effective
streaming).  This probe times the kernel alone across strip heights to see
whether the remainder is geometry (halo fraction), VPU passes (concat-built
ext + curl taps), or attribution noise.

Rules of the road honored: delta-timed scans (two lengths, subtracted),
host-transfer sync, big arrays as args, jax.clear_caches() around every
monkeypatched geometry case (module-level jits cache by (fun, avals)).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from cudafluidsimulation_tpu.ops import jacobi_pallas as jp  # noqa: E402
from cudafluidsimulation_tpu.ops import ref  # noqa: E402

n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
v = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
dt = 1.0 / 60.0


def delta_time(fn, *args, n_short=2, n_long=6):
    def make(k):
        @jax.jit
        def run(x, y):
            def body(c, _):
                cu, cv = c
                nu, nv = fn(cu, cv)
                # keep magnitudes bounded so repeated confinement can't
                # drift toward inf/NaN over the scan (timing is shape-only,
                # but keep the data honest anyway)
                return (nu * 0.999, nv * 0.999), None

            c, _ = jax.lax.scan(body, (x, y), None, length=k)
            return jnp.sum(c[0]) + jnp.sum(c[1])

        return run

    short, long_ = make(n_short), make(n_long)

    def t(g):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    float(short(*args)); float(long_(*args))
    return (t(long_) - t(short)) / (n_long - n_short) * 1e3


print(f"== vorticity probe at {n}^2 ==", flush=True)

# -- geometry sweep via the public block_rows knob (r <= VMEM budget) and a
#    budget-lifting monkeypatch for taller strips ----------------------------
orig_pick = jp._pick_block_rows


def run_case(name, fn):
    jax.clear_caches()
    try:
        ms = delta_time(fn, u, v)
        print(f"{name}: {ms:8.2f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
    finally:
        jp._pick_block_rows = orig_pick
        jax.clear_caches()


run_case("default (r=budget<=256)      ",
         lambda a, b: jp.vorticity_confinement(a, b, dt, 0.5, "gpu"))
run_case("r=16                          ",
         lambda a, b: jp.vorticity_confinement(a, b, dt, 0.5, "gpu",
                                               block_rows=16))
run_case("r=8                           ",
         lambda a, b: jp.vorticity_confinement(a, b, dt, 0.5, "gpu",
                                               block_rows=8))


def force_r(forced):
    def pick(h, hd, w, requested, planes=4):
        if planes == 6:  # the vorticity call
            return forced if h % forced == 0 else 0
        return orig_pick(h, hd, w, requested, planes)

    jp._pick_block_rows = pick


for forced in (64, 128):
    force_r(forced)
    run_case(f"r={forced} (budget lifted)       ",
             lambda a, b: jp.vorticity_confinement(a, b, dt, 0.5, "gpu"))

# -- reference composition (what the kernel replaced) ------------------------
run_case("jnp curl+confine (ref op)     ",
         lambda a, b: ref.vorticity_confinement_gpu(a, b, dt, 0.5))

# -- DMA bound: same-traffic pure copy (2 fields in, 2 out) ------------------
def _copy_kernel(a_ref, b_ref, oa, ob):
    oa[0] = a_ref[0]
    ob[0] = b_ref[0]


def copy2(a, b, r):
    h, w = a.shape
    blk = jp.pl.BlockSpec((1, r, w), lambda c, i: (c, i, 0),
                          memory_space=jp.pltpu.VMEM)
    ya, yb = jp.pl.pallas_call(
        _copy_kernel,
        out_shape=[jax.ShapeDtypeStruct((1, h, w), jnp.float32)] * 2,
        grid=(1, h // r),
        in_specs=[blk, blk], out_specs=[blk, blk],
        interpret=jp._interpret(),
    )(a[None], b[None])
    return ya[0] + 1e-6, yb[0]


run_case("copy bound (2 in / 2 out)     ", lambda a, b: copy2(a, b, 256))
