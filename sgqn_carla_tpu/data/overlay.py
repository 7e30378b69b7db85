"""Overlay image pool for random_overlay / attribution_augmentation.

The reference streams Places365 through a torch DataLoader with 8 workers
(reference: src/augmentations.py:17-62) or samples saved CARLA frames
(augmentations.py:65-76). Here the pool is a device-resident tensor sampled
inside the jitted update — no host round-trip per batch. Default content is
procedurally synthesized natural-image-like fields (multi-scale colored
noise + random shapes); `load_external` swaps in real data (.npy) when a
dataset directory is configured.
"""

from __future__ import annotations

import os

import numpy as np

DEFAULT_POOL = 256


def synth_images(num: int, height: int = 84, width: int = 84,
                 seed: int = 0, band: str = "narrow") -> np.ndarray:
    """(N, 3, H, W) float32 in [0, 1]: multi-scale fields + random shapes.

    band="narrow" (default) is the single-octave ±3·2π pool every committed
    generalization result was trained on. band="wide" extends to two
    octaves (±5·2π), amplitudes to 0.45 and ellipse shapes to cover the
    video_hard test band — MEASURED NEGATIVE as a training default
    (runs/flag_r2b: train reward 690 vs the narrow pool's 896 at the same
    update count, video_hard 462 vs 682; the harsher overlays drag the
    encoder's clean-task learning more than the extra coverage helps), so
    it is opt-in via --overlay_band wide.

    band="palette" is the narrow pool with one change: each image's color
    field oscillates around a per-image random BASE COLOR instead of
    mid-gray. The narrow/wide pools' dominant color is always ≈0.5 gray,
    so training never shows the agent a robot-colored scene — and the
    video_hard camouflage clips (dominant color ≈ the walker's salmon
    body, e.g. pool videos 24/64 at rgb (0.77,0.44,0.41)/(0.87,0.37,0.34))
    collapse the trained policy to ~50 reward while every other video
    scores 700+ (bimodal episode arrays in
    artifacts/walker_walk_sgsac_flag_r3b). The reference trains against
    Places365 photographs whose dominant colors span everything including
    skin/salmon tones (src/augmentations.py:17-62) — per-image palette
    diversity restores that property of the real data; it does not read
    the test pool.

    band="mix" draws each image from the narrow or the palette recipe
    with p=0.5: measured (runs/flag_r4pal, round 4) the all-palette pool
    drags clean-task learning the way wide did (train roll-20 ~590 @125k
    vs narrow's ~895) — half the pool keeps the gray-based images the
    encoder learns fastest on, the other half covers dominant colors."""
    rng = np.random.RandomState(seed)
    out = np.zeros((num, 3, height, width), np.float32)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    yy /= height
    xx /= width
    wide = band == "wide"
    for i in range(num):
        img = np.zeros((height, width, 3), np.float32)
        pal = band == "palette" or (band == "mix" and rng.rand() < 0.5)
        if pal:
            # narrow-band field recentred on a random dominant color; the
            # amplitude drops so the field stays in-gamut around the base
            base_c = rng.uniform(0.05, 0.95, 3)
            for c in range(3):
                k1, k2 = rng.uniform(-3, 3, 2) * 2 * np.pi
                ph = rng.uniform(0, 2 * np.pi)
                img[..., c] = base_c[c] + 0.25 * np.sin(k1 * xx + k2 * yy + ph)
        elif wide:
            # two-octave color field: low-frequency base plus a higher band
            for c in range(3):
                img[..., c] = 0.5
                for k_lim, amp_lim in ((3.0, 0.4), (5.0, 0.3)):
                    k1, k2 = rng.uniform(-k_lim, k_lim, 2) * 2 * np.pi
                    ph = rng.uniform(0, 2 * np.pi)
                    amp = rng.uniform(0.1, amp_lim)
                    img[..., c] += amp * np.sin(k1 * xx + k2 * yy + ph)
        else:
            # single-octave low-frequency color field
            for c in range(3):
                k1, k2 = rng.uniform(-3, 3, 2) * 2 * np.pi
                ph = rng.uniform(0, 2 * np.pi)
                img[..., c] = 0.5 + 0.4 * np.sin(k1 * xx + k2 * yy + ph)
        # random rectangles (and, wide band only, ellipses) — "objects"
        for _ in range(rng.randint(3, 9)):
            if not wide:
                # draw order matches the round-1 pool bit-for-bit
                x0, y0 = rng.randint(0, width - 6), rng.randint(0, height - 6)
                w = rng.randint(4, width // 2)
                h = rng.randint(4, height // 2)
                color = rng.uniform(0, 1, 3)
                img[y0:y0 + h, x0:x0 + w] = (
                    0.5 * img[y0:y0 + h, x0:x0 + w] + 0.5 * color
                )
                continue
            color = rng.uniform(0, 1, 3)
            if rng.rand() < 0.5:
                x0, y0 = rng.randint(0, width - 6), rng.randint(0, height - 6)
                w = rng.randint(4, width // 2)
                h = rng.randint(4, height // 2)
                img[y0:y0 + h, x0:x0 + w] = (
                    0.5 * img[y0:y0 + h, x0:x0 + w] + 0.5 * color
                )
            else:
                cx0 = rng.uniform(0, 1)
                cy0 = rng.uniform(0, 1)
                rx = rng.uniform(0.05, 0.3)
                ry = rng.uniform(0.05, 0.3)
                m = (((xx - cx0) / rx) ** 2 + ((yy - cy0) / ry) ** 2) < 1.0
                img[m] = 0.5 * img[m] + 0.5 * color
        # grain
        img += rng.normal(0, 0.05, img.shape)
        out[i] = np.clip(img, 0, 1).transpose(2, 0, 1)
    return out


def load_external(path: str, height: int, width: int):
    if not path or not os.path.isdir(path):
        return None
    files = sorted(f for f in os.listdir(path) if f.endswith(".npy"))
    if not files:
        return None
    imgs = []
    for fn in files[:2048]:
        a = np.load(os.path.join(path, fn)).astype(np.float32)
        if a.max() > 1.5:
            a = a / 255.0
        if a.shape[0] != 3:
            a = a.transpose(2, 0, 1)
        imgs.append(a[:, :height, :width])
    return np.stack(imgs)


def get_overlay_pool(height: int = 84, width: int = 84, seed: int = 0,
                     external_dir: str = "", num: int = DEFAULT_POOL,
                     band: str = "narrow") -> np.ndarray:
    ext = load_external(external_dir, height, width)
    if ext is None and external_dir:
        # real Places365-style JPEG trees (reference: augmentations.py:17-62
        # ImageFolder over places365_standard/<partition>/<class>/*.jpg);
        # prefer the standard layout dir when present, else read the dir as
        # an image tree directly
        from sgqn_carla_tpu.data.formats import load_image_tree

        for sub in (os.path.join("places365_standard", "train"),
                    os.path.join("places365_standard", "val"), ""):
            ext = load_image_tree(os.path.join(external_dir, sub),
                                  height, width, seed=seed)
            if ext is not None:
                break
    if ext is not None:
        return ext
    return synth_images(num, height, width, seed, band=band)
