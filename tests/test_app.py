"""FluidApp frame loop: real-dt stepping, frame emission, timing report."""

import numpy as np

from cudafluidsimulation_tpu import FluidConfig
from cudafluidsimulation_tpu.models.app import FluidApp, orbit_source


def test_app_runs_frames_and_reports():
    cfg = FluidConfig.gpu_reference(nx=64, ny=64, backend="ref",
                                    diffusion_iters=2, pressure_iters=2)
    frames = []
    logs = []
    app = FluidApp(cfg, frame_sink=frames.append, fixed_dt=1 / 60,
                   log=logs.append)
    report = app.run(max_frames=10)
    assert app.frames == 10
    assert len(frames) == 10
    assert frames[0].shape == (64, 64, 4) and frames[0].dtype == np.uint8
    assert report.steps == 10
    assert report.stage_ms["Max frame"] >= report.stage_ms["Min frame"] > 0
    # the orbiting pressed impulse must inject dye
    assert any(f[..., :3].max() > 0 for f in frames)


def test_orbit_source_tracks_last_position():
    cfg = FluidConfig.gpu_reference(nx=64, ny=64)
    src = orbit_source(cfg)
    p1, l1, pressed = src(0.1)
    p2, l2, _ = src(0.2)
    assert pressed
    assert l2 == p1


def test_app_with_native_sink(tmp_path):
    from cudafluidsimulation_tpu.utils.native_sink import FrameSink

    cfg = FluidConfig.gpu_reference(nx=64, ny=64, backend="ref",
                                    diffusion_iters=2, pressure_iters=2)
    with FrameSink(str(tmp_path), 64, 64) as sink:
        app = FluidApp(cfg, frame_sink=lambda f: sink.push(f), fixed_dt=1 / 60)
        app.run(max_frames=5)
        sink.flush()
        assert sink.written + sink.dropped == 5


def test_app_on_frame_hook_periodic_checkpoint(tmp_path):
    """The per-frame hook fires with the live state — the CLI's
    --checkpoint-every wiring for interactive sessions."""
    from cudafluidsimulation_tpu.utils.checkpoint import load_state, save_state

    cfg = FluidConfig.gpu_reference(nx=64, ny=64, backend="ref",
                                    diffusion_iters=2, pressure_iters=2)
    path = str(tmp_path / "ck.npz")
    seen = []

    def on_frame(state, n):
        seen.append(n)
        if n % 2 == 0:
            save_state(path, state)

    app = FluidApp(cfg, fixed_dt=1 / 60)
    app.run(max_frames=5, on_frame=on_frame)
    assert seen == [1, 2, 3, 4, 5]
    st = load_state(path)
    assert int(st.step) == 4  # last periodic save, not the final frame


def test_replay_source_rejects_empty_script():
    from cudafluidsimulation_tpu.models.app import replay_source
    from cudafluidsimulation_tpu.utils.impulse import no_impulse

    import pytest

    with pytest.raises(ValueError, match="empty impulse script"):
        replay_source(no_impulse(0, 1 / 60))


def test_app_pipelined_mode():
    cfg = FluidConfig.gpu_reference(nx=64, ny=64, backend="ref",
                                    diffusion_iters=2, pressure_iters=2)
    frames = []
    app = FluidApp(cfg, frame_sink=frames.append, fixed_dt=1 / 60)
    app.run(max_frames=8, pipelined=True)
    # every stepped frame is eventually emitted (incl. the drained tail)
    assert len(frames) == 8
    assert frames[-1].shape == (64, 64, 4)
    assert any(f[..., :3].max() > 0 for f in frames)
