"""In-run per-stage instrumentation (reference-style timers)."""

import numpy as np

from cudafluidsimulation_tpu import FluidConfig, Simulation, init_state
from cudafluidsimulation_tpu.utils.impulse import constant_impulse
from cudafluidsimulation_tpu.utils.instrument import run_instrumented


def test_instrumented_run_matches_plain_run_and_reports_stages():
    cfg = FluidConfig.gpu_reference(nx=64, ny=64, backend="ref",
                                    diffusion_iters=3, pressure_iters=4,
                                    vorticity=0.5, force_scale=500.0)
    imp = constant_impulse(6, cfg.dt, pos=(32.0, 32.0), last_pos=(30.0, 31.0))
    sim = Simulation(cfg)
    expected = sim.run(sim.init(), imp)

    state, report = run_instrumented(cfg, sim.init(), imp)
    np.testing.assert_allclose(np.asarray(state.u), np.asarray(expected.u),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(state.dye), np.asarray(expected.dye),
                               atol=1e-4)
    for stage in ("Advect", "Vorticity", "Diffuse", "Force", "Pressure",
                  "Project"):
        assert stage in report.stage_ms, stage
        assert report.stage_ms[stage] >= 0
    assert report.steps == 6
    text = report.format()
    assert "Advect compute time" in text


def test_advect_both_decomposes_into_advect_billing():
    """A namespace carrying the fused advect_both (the sharded paths do)
    must still bill the Advect bucket: timed_ops decomposes it through the
    wrapped advect_velocity/advect_dye, mirroring the pressure_project and
    diffuse_multi_splat decompositions (round-2 advisor finding)."""
    import types

    from cudafluidsimulation_tpu.ops.backend import get_ops
    from cudafluidsimulation_tpu.utils.instrument import timed_ops

    cfg = FluidConfig.gpu_reference(nx=64, ny=64, backend="ref",
                                    diffusion_iters=2, pressure_iters=2)
    base = get_ops(cfg)
    # plain namespaces lack advect_both -> the wrapper must not invent one
    totals = {}
    assert not hasattr(timed_ops(base, totals), "advect_both")

    fused = types.SimpleNamespace(**vars(base))

    def advect_both(u, v, dye, dt, decay_rate):
        u2, v2 = base.advect_velocity(u, v, dt, decay_rate)
        return u2, v2, base.advect_dye(dye, u2, v2, dt, decay_rate)

    fused.advect_both = advect_both
    totals = {}
    wrapped = timed_ops(fused, totals)
    import jax.numpy as jnp

    z = jnp.zeros((64, 64), jnp.float32)
    u2, v2, dye2 = wrapped.advect_both(z, z, jnp.zeros((3, 64, 64)), 1 / 60, 1.2)
    assert u2.shape == (64, 64) and dye2.shape == (3, 64, 64)
    assert totals.get("Advect", 0.0) > 0.0


def test_cpu_variant_stage_buckets():
    cfg = FluidConfig.cpu_reference(nx=64, ny=64, backend="ref")
    imp = constant_impulse(3, cfg.dt, pos=(32.0, 32.0), last_pos=(30.0, 31.0))
    _, report = run_instrumented(cfg, init_state(cfg), imp)
    # cpu variant: no bloom; 6 reference stages present
    assert "Bloom" not in report.stage_ms
    assert set(report.stage_ms) >= {"Advect", "Vorticity", "Diffuse",
                                    "Force", "Pressure", "Project"}
