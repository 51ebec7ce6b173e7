"""TermInput: raw-terminal event parsing + grid mapping (no tty needed)."""

import numpy as np

from cudafluidsimulation_tpu.utils.term_input import TermInput


def make(nx=128, ny=64, cols=64, rows=16):
    return TermInput(nx, ny, cols, rows)


def test_sgr_mouse_press_drag_release():
    t = make()
    t.feed(b"\x1b[<0;32;8M")  # left press at cell (32, 8)
    assert t.pressed
    px, py = t.pos
    # cell 32 of 64 -> center-ish x; cell 8 of 16 (top-down) -> center-ish y
    assert abs(px - (31.5 * 128 / 64)) < 1e-6
    assert abs(py - 64 * (1 - 7.5 / 16)) < 1e-6
    t.feed(b"\x1b[<32;33;8M")  # drag (motion with button bit)
    assert t.pressed and t.pos[0] > px
    t.feed(b"\x1b[<0;33;8m")  # release
    assert not t.pressed


def test_mouse_maps_viewer_corners():
    t = make()
    t.feed(b"\x1b[<0;1;1M")  # top-left cell -> grid top-left (y up: high y)
    assert t.pos[0] < 2 and t.pos[1] > 60
    t.feed(b"\x1b[<0;64;16M")  # bottom-right cell -> low y
    assert t.pos[0] > 125 and t.pos[1] < 3


def test_keys_move_and_toggle_and_quit():
    t = make()
    x0, y0 = t.pos
    t.feed(b"d")
    assert t.pos[0] > x0
    t.feed(b"\x1b[A")  # up arrow
    assert t.pos[1] > y0
    assert not t.pressed
    t.feed(b" ")
    assert t.pressed
    t.feed(b" ")
    assert not t.pressed
    t.feed(b"q")
    assert t.quit


def test_incomplete_escape_buffers_across_feeds():
    t = make()
    t.feed(b"\x1b[<0;10")  # split SGR sequence
    t.feed(b";10M")
    assert t.pressed
    assert t.pos[0] > 0


def test_scroll_wheel_ignored():
    t = make()
    p0, pr0 = t.pos, t.pressed
    t.feed(b"\x1b[<64;5;5M")  # wheel up
    assert t.pos == p0 and t.pressed == pr0


def test_source_tracks_last_position():
    t = make()
    src = t.source()
    p1, l1, _ = src(0.0)
    t.feed(b"dd")
    p2, l2, _ = src(0.1)
    assert l2 == p1
    assert p2[0] > p1[0]


def test_cursor_clamped_to_grid():
    t = make()
    for _ in range(500):
        t.feed(b"a")
    assert t.pos[0] == 0.0
    for _ in range(500):
        t.feed(b"\x1b[B")
    assert t.pos[1] == 0.0


def test_app_integration_with_scripted_bytes():
    """Full loop: TermInput source drives FluidApp; dye lands at the pressed
    cursor position."""
    from cudafluidsimulation_tpu import FluidConfig
    from cudafluidsimulation_tpu.models.app import FluidApp

    cfg = FluidConfig.gpu_reference(nx=64, ny=64, backend="ref",
                                    diffusion_iters=2, pressure_iters=2)
    t = TermInput(64, 64, 32, 16)
    t.feed(b"\x1b[<0;16;8M")  # press near the middle
    app = FluidApp(cfg, input_source=t.source(), fixed_dt=1 / 60)
    app.run(max_frames=5, stop_when=lambda: t.quit)
    dye = np.asarray(app.state.dye)
    assert dye.max() > 0.1
    # quit stops the loop immediately
    t.feed(b"q")
    frames_before = app.frames
    app.run(max_frames=50, stop_when=lambda: t.quit)
    assert app.frames == frames_before


def test_unknown_csi_consumed_through_final_byte():
    """Unrecognized CSI sequences (ctrl-arrows, terminal replies) must be
    swallowed whole — their parameter/final bytes must not replay as WASD
    moves or quit keys."""
    t = make()
    p0 = t.pos
    t.feed(b"\x1b[1;5D")  # ctrl-left: 'D' is the CSI final, NOT a nudge
    assert t.pos == p0 and not t.quit
    t.feed(b"\x1b[0q")  # DECLL reply: 'q' is the CSI final, NOT quit
    assert not t.quit
    t.feed(b"\x1b[6n")  # cursor-position query echo
    assert t.pos == p0 and not t.quit and not t.pressed
    t.feed(b"q")  # a REAL quit keypress still works afterwards
    assert t.quit


def test_x10_mouse_reports_parsed_not_replayed():
    """Legacy X10 reports (mode 1002 without SGR 1006) are parsed — and
    their raw payload bytes must never leak into the key handler: column 81
    encodes as 'q' (quit!), column 0 as space (press toggle)."""
    t = make()
    t.feed(b"\x1b[M" + bytes([0 + 32, 81 + 32, 8 + 32]))  # press at col 81
    assert t.pressed and not t.quit
    assert t.pos[0] == 127.0  # col 81 of a 64-col viewer clamps to nx-1
    t.feed(b"\x1b[M" + bytes([3 + 32, 81 + 32, 8 + 32]))  # release (btn=3)
    assert not t.pressed and not t.quit
    # incomplete report buffers across feeds
    t.feed(b"\x1b[M" + bytes([32]))
    assert not t.pressed
    t.feed(bytes([40 + 32, 8 + 32]))
    assert t.pressed


def test_ss3_arrows_and_alt_keys():
    t = make()
    y0 = t.pos[1]
    t.feed(b"\x1bOA")  # SS3 up-arrow (application cursor mode)
    assert t.pos[1] > y0
    t.feed(b"\x1bq")  # alt-q: swallowed as an escape pair, not quit
    assert not t.quit


def test_unterminated_sgr_prefix_resyncs():
    """Garbage starting with the SGR prefix (e.g. a bracketed paste) must not
    wedge the parser: later keys and real mouse events still work."""
    t = make()
    t.feed(b"\x1b[<" + b"1;" * 20)  # no M/m terminator within 24 bytes
    t.feed(b"q")
    assert t.quit
    t.quit = False
    t.feed(b"\x1b[<0;10;10M")
    assert t.pressed
