"""Background video tensors for the video_easy / video_hard benchmarks.

The reference decodes 10 (easy) / 100 (hard) mp4 clips per episode with
OpenCV and chroma-keys them behind the agent (reference:
env/wrappers.py:423-519). Here videos are device-resident uint8 tensors
``(num_videos, num_frames, H, W, 3)`` composited through the renderer's
exact segmentation mask — no per-pixel HSV loop (the reference's
do_green_screen, env/wrappers.py:390-420, is a pure-python O(H·W) hot spot).

Real DMCGB clips are fetched by a setup script the image cannot run
(zero egress), so by default the clips are procedurally synthesized moving
patterns (drifting multi-frequency color fields) with per-video palettes —
the same *capability*: temporally-varying, visually diverse backgrounds.
`load_external` accepts a directory of ``.npy`` clips to swap in real data.
"""

from __future__ import annotations

import os

import numpy as np

NUM_EASY = 10
NUM_HARD = 100
DEFAULT_FRAMES = 64


def synth_videos(num_videos: int, num_frames: int = DEFAULT_FRAMES,
                 height: int = 84, width: int = 84, seed: int = 0,
                 gentle: bool = False) -> np.ndarray:
    """(V, F, H, W, 3) uint8 procedural clips.

    `gentle` synthesizes the video_easy pool: low-contrast, low-spatial-
    frequency, slowly-drifting fields. The benchmark's ordering (easy must
    score ABOVE hard for a trained agent) is a property of the pools, not
    just their sizes — the real DMCGB easy set is 10 calm clips while hard
    is 100 diverse DAVIS videos. Round-1 measured the old shared-generator
    easy pool as adversarial (cartpole video_easy 245 < video_hard 577,
    RESULTS.md footnote 1); gentle construction restores the ordering by
    keeping the easy distribution close to a static background."""
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:height, 0:width].astype(np.float32)
    y = y / height
    x = x / width
    clips = np.zeros((num_videos, num_frames, height, width, 3), np.uint8)
    for v in range(num_videos):
        if gentle:
            base = rng.uniform(0.35, 0.65, size=3).astype(np.float32)
            amp = rng.uniform(0.03, 0.10, size=(3, 3)).astype(np.float32)
            kx = rng.uniform(-1.0, 1.0, size=3).astype(np.float32) * 2 * np.pi
            ky = rng.uniform(-1.0, 1.0, size=3).astype(np.float32) * 2 * np.pi
            om = rng.uniform(0.1, 0.4, size=3).astype(np.float32) * 2 * np.pi
        else:
            base = rng.uniform(0.1, 0.9, size=3).astype(np.float32)
            amp = rng.uniform(0.1, 0.45, size=(3, 3)).astype(np.float32)
            kx = rng.uniform(-4, 4, size=3).astype(np.float32) * 2 * np.pi
            ky = rng.uniform(-4, 4, size=3).astype(np.float32) * 2 * np.pi
            om = rng.uniform(0.5, 2.0, size=3).astype(np.float32) * 2 * np.pi
        ph = rng.uniform(0, 2 * np.pi, size=3).astype(np.float32)
        for f in range(num_frames):
            t = f / num_frames
            img = np.zeros((height, width, 3), np.float32) + base
            for c in range(3):
                wave = np.sin(kx[c] * x + ky[c] * y + om[c] * t + ph[c])
                img += amp[c][None, None] * wave[..., None] / 3
            clips[v, f] = np.clip(img * 255, 0, 255).astype(np.uint8)
    return clips


def load_external(path: str, height: int, width: int):
    """Load ``.npy`` clips (F, H, W, 3) uint8 from a directory, if present."""
    if not os.path.isdir(path):
        return None
    files = sorted(f for f in os.listdir(path) if f.endswith(".npy"))
    if not files:
        return None
    clips = []
    nf = None
    for fn in files:
        arr = np.load(os.path.join(path, fn))
        assert arr.ndim == 4 and arr.shape[-1] == 3, fn
        if arr.shape[1] != height or arr.shape[2] != width:
            arr = _resize_nearest(arr, height, width)
        nf = arr.shape[0] if nf is None else min(nf, arr.shape[0])
        clips.append(arr)
    clips = [c[:nf] for c in clips]
    return np.stack(clips).astype(np.uint8)


def _resize_nearest(arr, h, w):
    f, H, W, c = arr.shape
    yi = (np.arange(h) * H // h).clip(0, H - 1)
    xi = (np.arange(w) * W // w).clip(0, W - 1)
    return arr[:, yi][:, :, xi]


def get_videos(mode: str, height: int, width: int, seed: int = 0,
               external_dir: str = "") -> np.ndarray:
    num = NUM_EASY if mode == "video_easy" else NUM_HARD
    if external_dir:
        # real DMCGB artifacts first: video_{easy,hard}/video<i>.mp4
        # (reference: env/wrappers.py:439-449 paths, :451-479 cv2 decode)
        from sgqn_carla_tpu.data.formats import load_mp4_dir

        ext = load_mp4_dir(os.path.join(external_dir, mode), height, width)
        if ext is None:  # pre-converted .npy clips as the fallback format
            ext = load_external(os.path.join(external_dir, mode), height,
                                width)
        if ext is not None:
            return ext
    return synth_videos(num, DEFAULT_FRAMES, height, width,
                        seed=seed + (7 if mode == "video_hard" else 3),
                        gentle=(mode == "video_easy"))
