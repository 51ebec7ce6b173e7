"""Ensemble A/B: the quiet-flow advect fast path under vmap (VERDICT r4 #5).

The static ±1-window fast path is a lax.cond dual dispatch; under vmap the
predicate is per-member, so XLA lowers the cond to a BOTH-SIDES select —
every member pays the static core on top of the dynamic one.  r4 added
``config.advect_fast_path=False`` for always-driven ensembles on exactly
this argument, but the cost was an estimate ("~3%", BASELINE r3 row), never
measured on the current kernel set.  This probe runs the BASELINE config-4
workload (64 x 512² diffusion sweep, orbit-driven so the fast path never
wins) with the fast path on vs off, plus the current fast preset's packed
modes, and prints one JSON row.

Rules of the road: jax.clear_caches() between cases (module-level jitted ops
cache traces by (fun, avals)), host-transfer sync, delta-timed scans,
best-of-3.

    python scripts/ensemble_ab.py [B N [SHORT LONG]]
"""
import json
import sys
import time

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cudafluidsimulation_tpu import FluidConfig  # noqa: E402
from cudafluidsimulation_tpu.models.ensemble import (  # noqa: E402
    batched_impulse, batched_state, make_diffusion_sweep_run)
from cudafluidsimulation_tpu.utils.impulse import orbit_impulse  # noqa: E402


def ens_ms(b, n, fast_path, fast_vel, fast_dye, fast_diff,
           n_short=20, n_long=60):
    """ms per ensemble step (all B members advanced once)."""
    jax.clear_caches()
    cfg = FluidConfig.gpu_reference(
        nx=n, ny=n, backend="auto",
        advect_fast_path=fast_path, fast_velocity=fast_vel,
        fast_dye=fast_dye, fast_diffuse=fast_diff)
    run = make_diffusion_sweep_run(cfg)
    states = batched_state(cfg, b)
    diffs = jnp.linspace(0.2, 1.5, b)

    def make(k):
        imp = batched_impulse(
            orbit_impulse(k, cfg.dt, center=(n / 2, n / 2), radius=n / 8), b,
            jitter_pos=np.random.default_rng(0).uniform(-8, 8, (b, 2)))

        @jax.jit
        def go(d, s, im):
            out = run(d, s, im)
            return out.u[0, 0, 0]

        return lambda: float(go(diffs, states, imp))

    short, long_ = make(n_short), make(n_long)
    short(); long_()  # compile

    def t(g):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            g()
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(long_) - t(short)) / (n_long - n_short) * 1e3


b, n = 64, 512
steps = (20, 60)
if len(sys.argv) > 2:
    b, n = int(sys.argv[1]), int(sys.argv[2])
    if len(sys.argv) > 4:
        steps = (int(sys.argv[3]), int(sys.argv[4]))

row = {"batch": b, "grid": f"{n}x{n}"}
fp_on = ens_ms(b, n, True, False, False, False, *steps)
fp_off = ens_ms(b, n, False, False, False, False, *steps)
row["fastpath_on_ms"] = round(fp_on, 3)
row["fastpath_off_ms"] = round(fp_off, 3)
row["select_tax_pct"] = round((fp_on - fp_off) / fp_off * 100, 2)
row["ens_steps_per_sec_off"] = round(1e3 / fp_off, 2)
# the full fast preset under vmap (packed advect + separable diffuse)
row["preset_fast_off_ms"] = round(
    ens_ms(b, n, False, True, True, True, *steps), 3)
print(json.dumps(row), flush=True)
