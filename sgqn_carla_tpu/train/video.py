"""Eval-rollout video recorder (reference: src/video.py).

Records 448×448 frames through the env's own render path — the mode's
distraction (video background, colors) is re-applied exactly as the
reference re-greenscreens eval frames (video.py:18-31). Output: mp4 via
imageio when available, else a PNG sequence (dependency-free writer) plus
a raw ``.npy``.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np


def _write_png(path, arr):
    h, w, _ = arr.shape
    raw = b"".join(b"\x00" + arr[i].tobytes() for i in range(h))

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data))

    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b""))


class VideoRecorder:
    def __init__(self, dir_name, height: int = 448, width: int = 448,
                 fps: int = 25, enabled: bool = True):
        self.dir_name = dir_name
        self.height = height
        self.width = width
        self.fps = fps
        self.enabled = enabled and dir_name is not None
        self.frames = []
        if self.enabled:
            os.makedirs(dir_name, exist_ok=True)

    def init(self, enabled: bool = True):
        self.frames = []
        self.enabled = self.enabled and enabled

    def record(self, env, state):
        """env: DMCPixelEnv-like with render_eval(state, size)."""
        if self.enabled:
            self.frames.append(np.asarray(env.render_eval(state, self.height)))

    def record_frames(self, frames):
        """Append a (T, H, W, 3) uint8 batch rendered on-device by a fused
        eval rollout (one host pull for the whole episode instead of one
        dispatch per step)."""
        if self.enabled:
            self.frames.extend(np.asarray(frames))

    def save(self, file_name: str):
        if not self.enabled or not self.frames:
            return
        base = os.path.join(self.dir_name, file_name)
        frames = np.stack(self.frames)
        try:
            import imageio

            imageio.mimsave(base if base.endswith(".mp4") else base + ".mp4",
                            list(frames), fps=self.fps)
        except Exception:
            stem = base.rsplit(".", 1)[0]
            np.save(stem + ".npy", frames)
            idxs = list(range(0, len(frames), max(1, len(frames) // 8)))
            paths = [f"{stem}_f{i:04d}.png" for i in idxs]
            from sgqn_carla_tpu.core import native

            if not native.png_write_batch(frames[idxs], paths):
                for i, p in zip(idxs, paths):
                    _write_png(p, frames[i])
