"""Native C++ frame sink: build, push, flush, PNG round trip, drop behavior."""

import zlib

import numpy as np
import pytest

from cudafluidsimulation_tpu.utils.native_sink import FrameSink, native_available


def _decode_png_rgba(path, h, w):
    data = open(path, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    idat_off = data.index(b"IDAT") + 4
    idat_len = int.from_bytes(data[idat_off - 8 : idat_off - 4], "big")
    raw = zlib.decompress(data[idat_off : idat_off + idat_len])
    rows = np.frombuffer(raw, np.uint8).reshape(h, 1 + w * 4)
    assert (rows[:, 0] == 0).all()
    return rows[:, 1:].reshape(h, w, 4)


def test_native_library_builds():
    assert native_available(), "native framesink failed to build/load"


def test_push_flush_roundtrip(tmp_path, rng):
    h, w = 24, 32
    frames = [rng.integers(0, 255, (h, w, 4), dtype=np.uint8) for _ in range(5)]
    with FrameSink(str(tmp_path), w, h) as sink:
        for f in frames:
            assert sink.push(f)
        sink.flush()
        assert sink.written == 5
        assert sink.dropped == 0
    for i, f in enumerate(frames):
        got = _decode_png_rgba(str(tmp_path / f"frame_{i:08d}.png"), h, w)
        np.testing.assert_array_equal(got, f)


def test_capacity_drops_oldest(tmp_path):
    h, w = 512, 512
    n = 200
    with FrameSink(str(tmp_path), w, h, capacity=2) as sink:
        for i in range(n):
            frame = np.full((h, w, 4), i % 251, np.uint8)  # tag content by index
            sink.push(frame)
        sink.flush()
        # every frame is either written or evicted-as-oldest
        assert sink.written + sink.dropped == n
        written = sink.written
    # drop-oldest: the newest frame always survives as the last file written
    last = _decode_png_rgba(str(tmp_path / f"frame_{written - 1:08d}.png"), h, w)
    assert int(last[0, 0, 0]) == (n - 1) % 251


def test_python_fallback(tmp_path, rng):
    h, w = 16, 16
    frame = rng.integers(0, 255, (h, w, 4), dtype=np.uint8)
    sink = FrameSink(str(tmp_path), w, h, force_python=True)
    assert sink.push(frame)
    got = _decode_png_rgba(str(tmp_path / "frame_00000000.png"), h, w)
    np.testing.assert_array_equal(got, frame)


def test_shape_validation(tmp_path):
    sink = FrameSink(str(tmp_path), 16, 16, force_python=True)
    with pytest.raises(ValueError):
        sink.push(np.zeros((8, 8, 4), np.uint8))
