"""Per-component cost attribution of the multigrid V-cycle at 2048².

mg_floor_probe.py showed the burst smoother is nearly neutral at the whole
step (mg2 7.79 scan -> 7.65 burst), so the ~2.2 ms the mg2 step pays over
jacobi-40 is NOT smoothing sweeps.  This measures the V-cycle's pieces in
isolation (delta-timed scans, scalar-threaded carries so XLA cannot hoist
the loop body, host-transfer sync) to find where the time actually goes.
Suspect: the 9-3-3-1 prolongation interleaves via jnp.stack + reshape —
the same relayout family that made reshape-based restriction cost 4.5 ms
(26x its strided twin, CLAUDE.md perf model).

    python scripts/mg_anatomy_probe.py [N]
"""
import json
import sys
import time

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cudafluidsimulation_tpu.ops import jacobi_pallas, multigrid  # noqa: E402


def timed_scan(body, init, n_short=50, n_long=150):
    """ms per body(carry) -> carry — two scan lengths, subtracted; sync via
    host fetch of a reduced scalar."""
    def run(n):
        @jax.jit
        def go(c):
            out = jax.lax.scan(lambda c, _: (body(c), None), c, None,
                               length=n)[0]
            return jax.tree_util.tree_leaves(out)[0].ravel()[0]

        def f():
            return float(go(init))

        f()  # compile
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            f()
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(n_long) - run(n_short)) / (n_long - n_short) * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    p0 = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    c0 = jnp.asarray(rng.standard_normal((n // 2, n // 2)).astype(np.float32))
    eps = jnp.float32(1e-12)
    out = {"grid": n}

    def dep(base, carry):
        # scalar-thread the carry into the body input (one fused broadcast)
        return base * (1.0 + eps * carry.ravel()[0])

    # smoothing: 2 damped sweeps, scan vs burst
    def sc(p):
        def sweep(pp, _):
            l, r, b, t = multigrid.neighbors(pp)
            return pp + 0.8 * (0.25 * (l + r + b + t + rhs) - pp), None
        return jax.lax.scan(sweep, p, None, length=2)[0]

    out["smooth2_scan_ms"] = timed_scan(sc, p0)
    out["smooth2_burst_ms"] = timed_scan(
        lambda p: jacobi_pallas.smooth_damped(p, rhs, 2), p0)
    print(json.dumps(out), flush=True)

    # residual + restrict (fine -> coarse); carry is the coarse array
    def res_restrict(c):
        p = dep(p0, c)
        return 4.0 * multigrid._restrict(rhs - multigrid._apply_a(p))

    out["residual_restrict_ms"] = timed_scan(res_restrict, c0)

    # prolong + correct (coarse -> fine); carry is the fine array
    def prolong_correct(f):
        return p0 + multigrid._prolong(dep(c0, f))

    out["prolong_correct_ms"] = timed_scan(prolong_correct, p0)
    print(json.dumps(out), flush=True)

    # whole solves, for cross-checking the component sum
    for c in (1, 2):
        for sm in ("scan", "burst"):
            out[f"mg{c}_{sm}_solve_ms"] = timed_scan(
                lambda p, c=c, sm=sm: multigrid.pressure_solve_mg(
                    dep(rhs, p), cycles=c, smoother=sm), p0,
                n_short=10, n_long=40)
        print(json.dumps(out), flush=True)

    # sub-fine tail: the whole solve on a 256² rhs (levels 256..16)
    rhs_s = jnp.asarray(rng.standard_normal((256, 256)).astype(np.float32))
    out["mg2_256_burst_solve_ms"] = timed_scan(
        lambda p: multigrid.pressure_solve_mg(dep(rhs_s, p), cycles=2,
                                              smoother="burst"),
        jnp.zeros((256, 256), jnp.float32), n_short=10, n_long=40)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
