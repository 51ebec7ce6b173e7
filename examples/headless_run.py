"""Minimal headless simulation: scripted stirring, PNG frames, checkpoint.

    python examples/headless_run.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cudafluidsimulation_tpu import FluidConfig, Simulation
from cudafluidsimulation_tpu.utils.checkpoint import save_state
from cudafluidsimulation_tpu.utils.impulse import orbit_impulse
from cudafluidsimulation_tpu.utils.native_sink import FrameSink


def main():
    cfg = FluidConfig.gpu_reference(nx=512, ny=512)
    sim = Simulation(cfg)
    imp = orbit_impulse(300, cfg.dt, center=(256, 256), radius=64, omega=3.0)

    state, frames = sim.collect_frames(sim.init(), imp, every=10)

    with FrameSink("out_frames", 512, 512) as sink:
        for frame in frames:
            sink.push(frame)
        sink.flush()
        print(f"wrote {sink.written} frames to out_frames/")

    save_state("out_state.npz", state)
    print("checkpoint saved to out_state.npz")


if __name__ == "__main__":
    main()
