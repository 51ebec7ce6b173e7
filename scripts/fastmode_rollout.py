"""Fast-mode rollout accuracy: RMSE-vs-steps of --fast-dye / --fast-vel /
--fast-diffuse (r5) and the full --preset fast bundle.

r3 characterized the bf16-packed cores per-STEP (~5e-3 dye, ~2^-9
relative velocity taps); chaotic rollouts decorrelate from the f32
trajectory, so a user needs the CURVE: 500 driven steps at 2048²/d=31,
states compared to the exact-f32 arm every 50 steps — field RMSE plus the
rendered-frame mean/max byte deltas for the dye arms (what the eye sees).

Interpretation guide: driven stable fluids is chaotic, so ANY perturbation
(bf16 taps, a different chip, a reordered sum) grows exponentially until
RMSE saturates near the inter-snapshot decorrelation level; the curve's
knee tells you how many steps stay visually faithful, after which frames
are equally-plausible DIFFERENT turbulence, not degraded renders.

    python scripts/fastmode_rollout.py [N [STEPS EVERY]]
"""
import json
import sys

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cudafluidsimulation_tpu import FluidConfig, Simulation  # noqa: E402
from cudafluidsimulation_tpu.utils.impulse import orbit_impulse  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    every = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    arms = {
        "exact": {},
        "fast_dye": {"fast_dye": True},
        "fast_vel": {"fast_velocity": True},
        "fast_both": {"fast_dye": True, "fast_velocity": True},
        # r5: the separable-diffuse arm (~1.2e-4 per-application operator
        # error, ops/fastdiffuse.py) and the full --preset fast bundle
        "fast_diffuse": {"fast_diffuse": True},
        "fast_all": {"fast_dye": True, "fast_velocity": True,
                     "fast_diffuse": True},
    }
    sims, states = {}, {}
    for name, over in arms.items():
        cfg = FluidConfig.gpu_reference(nx=n, ny=n, backend="auto",
                                        max_displacement=31, **over)
        sims[name] = Simulation(cfg)
        states[name] = sims[name].init()
    dt = sims["exact"].config.dt

    def rmse(a, b):
        return float(jnp.sqrt(jnp.mean((a - b) ** 2)))

    # one phase-continuous impulse stream, segmented (every arm sees the
    # exact same drags)
    full = orbit_impulse(steps, dt, center=(n / 2, n / 2), radius=n / 8)

    for seg in range(steps // every):
        t0 = seg * every
        im = jax.tree.map(lambda x: x[t0:t0 + every], full)
        for name in arms:
            states[name] = sims[name].run(states[name], im)
        ex = states["exact"]
        row = {"step": (seg + 1) * every}
        fr_ex = sims["exact"].render(ex).astype(jnp.float32)
        for name in arms:
            if name == "exact":
                continue
            st = states[name]
            row[f"{name}_dye_rmse"] = round(rmse(st.dye, ex.dye), 5)
            row[f"{name}_vel_rmse"] = round(
                rmse(jnp.stack([st.u, st.v]), jnp.stack([ex.u, ex.v])), 4)
            fr = sims[name].render(st).astype(jnp.float32)
            d = jnp.abs(fr - fr_ex)
            row[f"{name}_frame_mean"] = round(float(jnp.mean(d)), 3)
            row[f"{name}_frame_max"] = round(float(jnp.max(d)), 1)
        # decorrelation reference: exact field vs itself 'every' steps ago
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
