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
        chunk = resp.fp.read(64)
        assert b"--frame" in chunk or b"PNG" in chunk
        conn.close()


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
