"""HTTP live-view server: native C++ backend + pure-Python fallback."""

import threading
import urllib.request

import numpy as np
import pytest

from cudafluidsimulation_tpu.utils.http_view import HttpViewer, native_available


def _frame(h=16, w=24, seed=0):
    return np.random.default_rng(seed).integers(0, 255, (h, w, 4),
                                                dtype=np.uint8)


def _get(url, timeout=5):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, r.headers, r.read()


@pytest.mark.parametrize("force_python",
                         [False, True] if native_available() else [True])
def test_page_frame_and_stream(force_python):
    with HttpViewer(width=24, height=16, force_python=force_python) as hv:
        assert hv.port > 0
        fr = _frame()
        hv.push(fr)
        hv.push(_frame(seed=1))
        assert hv.frames == 2

        status, _, body = _get(hv.url)
        assert status == 200 and b"/stream" in body

        status, headers, png = _get(hv.url + "frame")
        assert status == 200
        assert headers["Content-Type"] == "image/png"
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

        # stream: read the first multipart part (headers + PNG signature)
        import http.client

        conn = http.client.HTTPConnection("localhost", hv.port, timeout=5)
        conn.request("GET", "/stream")
        resp = conn.getresponse()
        assert resp.status == 200
        assert "multipart/x-mixed-replace" in resp.headers["Content-Type"]
        hv.push(_frame(seed=2))  # ensure a part is emitted post-connect
        chunk = resp.fp.read(256)
        assert b"--frame" in chunk or b"PNG" in chunk
        # stream codec: the native server sends MJPEG parts (cheap encode),
        # the Python fallback sends PNG parts
        want = b"image/png" if force_python else b"image/jpeg"
        assert want in chunk
        conn.close()


@pytest.mark.parametrize("force_python",
                         [False, True] if native_available() else [True])
def test_both_backends_serve_the_canonical_page(force_python):
    """ONE page definition (http_view.PAGE_HTML) serves '/' on both the
    native server (via hv_set_page) and the Python fallback — no drift."""
    from cudafluidsimulation_tpu.utils.http_view import PAGE_HTML

    with HttpViewer(width=8, height=8, force_python=force_python) as hv:
        _, _, body = _get(hv.url)
        assert body == PAGE_HTML


@pytest.mark.parametrize("force_python",
                         [False, True] if native_available() else [True])
def test_input_route_and_source(force_python):
    """Browser pointer input: /input updates poll_input(), the InputSource
    maps image pixels to (y-flipped) grid coords, q requests quit."""
    with HttpViewer(width=24, height=16, force_python=force_python) as hv:
        assert hv.poll_input() == (0, 0.0, 0.0, 0)
        assert not hv.quit_requested
        _, _, body = _get(hv.url)
        assert b"/input" in body  # the page carries the pointer script

        src = hv.input_source(24, 16)
        pos0, last0, pressed0 = src(0.0)
        assert pos0 == (12.0, 8.0) and not pressed0  # center until input

        _get(hv.url + "input?x=10.5&y=3.25&p=1")
        seq, x, y, p = hv.poll_input()
        assert (seq, p) == (1, 1)
        assert x == pytest.approx(10.5) and y == pytest.approx(3.25)
        pos, last, pressed = src(0.1)
        assert pressed and last == pos0
        assert pos[0] == pytest.approx(10.5)
        assert pos[1] == pytest.approx(16 - 1 - 3.25)  # image row 0 = top

        _get(hv.url + "input?x=999&y=-5&p=0")  # out of range: clamped
        pos2, last2, pressed2 = src(0.2)
        assert not pressed2 and last2 == pos
        assert pos2 == (23.0, 15.0)

        assert not hv.quit_requested
        _get(hv.url + "input?x=0&y=0&p=0&q=1")
        assert hv.quit_requested


def test_input_source_releases_stale_press():
    """A press whose keepalives stop (browser closed mid-drag) is treated
    as released after the timeout instead of splatting forever."""
    import time

    with HttpViewer(width=24, height=16, force_python=True) as hv:
        src = hv.input_source(24, 16, press_timeout=0.05)
        _get(hv.url + "input?x=5&y=5&p=1")
        _, _, pressed = src(0.0)
        assert pressed
        time.sleep(0.12)  # no further /input arrives
        _, _, pressed = src(0.1)
        assert not pressed
        # a fresh press re-arms it
        _get(hv.url + "input?x=6&y=5&p=1")
        _, _, pressed = src(0.2)
        assert pressed


def test_interactive_app_via_http_input():
    """End-to-end: input posted to the server steers a FluidApp frame loop
    (the CLI's --view http --interactive wiring)."""
    from cudafluidsimulation_tpu import FluidConfig
    from cudafluidsimulation_tpu.models.app import FluidApp

    cfg = FluidConfig.gpu_reference(nx=64, ny=64, backend="ref",
                                    diffusion_iters=2, pressure_iters=2,
                                    force_scale=500.0, vorticity=0.5)
    with HttpViewer(width=64, height=64) as hv:
        _get(hv.url + "input?x=32&y=32&p=1")  # press at the center
        app = FluidApp(cfg, input_source=hv.input_source(64, 64),
                       frame_sink=hv, fixed_dt=1 / 60,
                       log=lambda s: None)
        app.run(max_frames=4, stop_when=lambda: hv.quit_requested)
        assert app.frames == 4
        dye = np.asarray(app.state.dye)
        assert np.isfinite(dye).all() and dye.sum() > 0  # the splat landed

        _get(hv.url + "input?x=0&y=0&p=0&q=1")  # browser 'q'
        app.run(max_frames=100, stop_when=lambda: hv.quit_requested)
        assert app.frames == 4  # quit observed before any further frame


def test_push_before_dimensions_lazy_open():
    hv = HttpViewer(force_python=True)
    try:
        hv.push(_frame())
        assert hv.port > 0
        status, _, png = _get(hv.url + "frame")
        assert status == 200 and png[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        hv.close()


def test_frame_before_any_push_is_503():
    with HttpViewer(width=8, height=8, force_python=True) as hv:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _get(hv.url + "frame")
        assert exc.value.code == 503


@pytest.mark.skipif(not native_available(), reason="no native toolchain")
def test_native_close_with_connected_stream_client():
    """close() must not hang while a stream client is connected."""
    import http.client

    hv = HttpViewer(width=8, height=8)
    hv.push(_frame(8, 8))
    conn = http.client.HTTPConnection("localhost", hv.port, timeout=5)
    conn.request("GET", "/stream")
    resp = conn.getresponse()
    assert resp.status == 200
    done = threading.Event()

    def closer():
        hv.close()
        done.set()

    t = threading.Thread(target=closer)
    t.start()
    t.join(timeout=10)
    assert done.is_set(), "hv_close hung with a connected client"
    conn.close()


def test_app_integration():
    """FluidApp drives the HTTP sink; the served frame is a real render."""
    from cudafluidsimulation_tpu import FluidConfig
    from cudafluidsimulation_tpu.models.app import FluidApp

    cfg = FluidConfig.gpu_reference(nx=64, ny=64, backend="ref",
                                    diffusion_iters=2, pressure_iters=2)
    with HttpViewer(width=64, height=64) as hv:
        app = FluidApp(cfg, frame_sink=hv, fixed_dt=1 / 60)
        app.run(max_frames=4)
        assert hv.frames == 4
        _, _, png = _get(hv.url + "frame")
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
