"""ANSI terminal viewer rendering."""

import io

import numpy as np

from cudafluidsimulation_tpu.utils.term_view import TermViewer, frame_to_ansi


def test_frame_to_ansi_dimensions():
    frame = np.zeros((64, 64, 4), np.uint8)
    frame[..., 0] = 200  # red field
    text = frame_to_ansi(frame, cols=16, rows=8)
    lines = text.split("\n")
    assert len(lines) == 8
    assert "▀" in lines[0]
    assert "38;2;200;0;0" in lines[0]


def test_viewer_repaints_in_place():
    out = io.StringIO()
    viewer = TermViewer(cols=8, rows=4, stream=out)
    frame = np.zeros((32, 32, 4), np.uint8)
    viewer(frame)
    first = out.getvalue()
    assert "\x1b[4F" not in first  # no cursor-up on first paint
    viewer(frame)
    assert "\x1b[4F" in out.getvalue()
