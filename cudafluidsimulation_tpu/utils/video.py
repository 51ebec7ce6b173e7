"""Dependency-free video muxing: uncompressed RGB AVI.

The reference renders into an OpenGL window (Main.cpp:166-180); headless
runs here dump frames instead.  ``write_apng`` (utils.png) covers
browser-friendly animation; this module adds a REAL video container —
RIFF/AVI with the 'DIB ' (BI_RGB) codec — that VLC, mpv, ffmpeg, and
QuickTime all open, with zero external dependencies.  Uncompressed video is
large (w*h*3 bytes/frame) but the writer streams frames straight to disk,
so memory stays flat; pipe through ffmpeg for mp4 when available:

    ffmpeg -i run.avi -c:v libx264 -pix_fmt yuv420p run.mp4
"""

from __future__ import annotations

import struct
from typing import Sequence

import numpy as np


def _fourcc(s: str) -> bytes:
    return s.encode("ascii")


class AviWriter:
    """Streaming uncompressed-AVI writer.

    Frames are (H, W, 3|4) uint8 RGB(A), y-down (image convention — what
    ``Simulation.frame_image`` returns).  AVI 'DIB ' stores bottom-up BGR
    rows padded to 4 bytes; the conversion happens per frame at add() time.
    """

    def __init__(self, path: str, width: int, height: int, fps: float = 30.0):
        self.w, self.h = int(width), int(height)
        self.fps = float(fps)
        self._stride = (self.w * 3 + 3) & ~3  # rows pad to 4-byte multiples
        self._frame_bytes = self._stride * self.h
        self._offsets = []  # movi-relative chunk offsets for idx1
        self._f = open(path, "wb")
        self._write_header(n_frames=0)  # placeholder counts, fixed in close()
        self._movi_start = self._f.tell() - 4  # position of 'movi' fourcc

    # -- container plumbing --------------------------------------------------

    def _write_header(self, n_frames: int) -> None:
        f = self._f
        f.seek(0)
        usec = int(round(1_000_000 / self.fps))
        rate = int(round(self.fps * 1000))
        scale = 1000

        strf = struct.pack("<IiiHHIIiiII", 40, self.w, self.h, 1, 24, 0,
                           self._frame_bytes, 0, 0, 0, 0)
        strh = (
            _fourcc("vids") + _fourcc("DIB ")
            + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, scale, rate, 0,
                          n_frames, self._frame_bytes, -1, 0)
            + struct.pack("<hhhh", 0, 0, self.w, self.h)
        )
        strl = (
            _fourcc("LIST")
            + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf))
            + _fourcc("strl")
            + _fourcc("strh") + struct.pack("<I", len(strh)) + strh
            + _fourcc("strf") + struct.pack("<I", len(strf)) + strf
        )
        avih = struct.pack(
            "<IIIIIIIIIIIIII",
            usec, self._frame_bytes * max(1, int(self.fps)), 0,
            0x10,  # AVIF_HASINDEX
            n_frames, 0, 1, self._frame_bytes, self.w, self.h, 0, 0, 0, 0,
        )
        hdrl = (
            _fourcc("LIST")
            + struct.pack("<I", 4 + 8 + len(avih) + len(strl))
            + _fourcc("hdrl")
            + _fourcc("avih") + struct.pack("<I", len(avih)) + avih
            + strl
        )
        riff_head = _fourcc("RIFF") + struct.pack("<I", 0) + _fourcc("AVI ")
        f.write(riff_head + hdrl)
        f.write(_fourcc("LIST") + struct.pack("<I", 0) + _fourcc("movi"))

    def add(self, frame: np.ndarray) -> None:
        frame = np.asarray(frame)
        if frame.dtype != np.uint8 or frame.ndim != 3:
            raise ValueError("frame must be (H, W, 3|4) uint8")
        if frame.shape[:2] != (self.h, self.w):
            raise ValueError(
                f"frame is {frame.shape[1]}x{frame.shape[0]}, "
                f"writer is {self.w}x{self.h}")
        bgr = frame[::-1, :, 2::-1]  # bottom-up rows, RGB -> BGR
        rows = np.zeros((self.h, self._stride), np.uint8)
        rows[:, : self.w * 3] = bgr.reshape(self.h, self.w * 3)
        self._offsets.append(self._f.tell() - self._movi_start)
        self._f.write(_fourcc("00db") + struct.pack("<I", self._frame_bytes))
        self._f.write(rows.tobytes())

    def close(self) -> None:
        if self._f.closed:
            return
        f = self._f
        movi_end = f.tell()
        # idx1: one keyframe entry per chunk, offsets relative to 'movi'
        f.write(_fourcc("idx1"))
        f.write(struct.pack("<I", 16 * len(self._offsets)))
        for off in self._offsets:
            f.write(_fourcc("00db")
                    + struct.pack("<III", 0x10, off, self._frame_bytes))
        riff_end = f.tell()

        # fix up the deferred sizes + frame counts (header rewrite first —
        # it re-zeroes the RIFF/movi size placeholders it contains)
        self._write_header(n_frames=len(self._offsets))
        f.seek(4)
        f.write(struct.pack("<I", riff_end - 8))
        f.seek(self._movi_start - 4)
        f.write(struct.pack("<I", movi_end - self._movi_start))
        f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def write_avi(path: str, frames: Sequence[np.ndarray], fps: float = 30.0) -> None:
    """Write (N, H, W, 3|4) uint8 frames as an uncompressed RGB AVI."""
    frames = list(frames)
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    with AviWriter(path, w, h, fps) as av:
        for fr in frames:
            av.add(fr)
