"""Synthesize a complete DMCGB-format dataset tree (round-4 verdict item #7).

Writes, under the target directory, every external-data artifact format the
framework's loaders consume — the exact on-disk layouts the reference's
setup scripts fetch (reference: setup/prepare_dm_control_xp.sh:1-8,
env/wrappers.py:117-123 color .pt pickles, :439-479 video<i>.mp4 pools,
augmentations.py:17-62 places365_standard JPEG tree):

  * ``color_easy.pt`` / ``color_hard.pt`` — torch pickles of per-color
    setting_kwargs dicts (the framework's procedural tables exported into
    the reference format, so statistics match the procedural benchmark);
  * ``video_easy/video<i>.mp4`` (10) / ``video_hard/video<i>.mp4`` (100)
    — the procedural clip pools (dmcgb band) encoded as real mp4;
  * ``places365_standard/train/<class>/*.jpg`` — overlay images.

Running one eval battery with ``--external_data_dir <target>`` then
exercises the full external-data pipeline — torch-pickle decode, cv2 mp4
decode, JPEG tree walk — end-to-end instead of only unit tests
(tests/test_external_data.py).

Usage: python scripts/gen_dmcgb_tree.py [target_dir] [seed]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(target: str, seed: int = 0):
    import cv2
    import torch

    from sgqn_carla_tpu.data import colors as colors_mod
    from sgqn_carla_tpu.data.colors import make_color_table
    from sgqn_carla_tpu.data.overlay import synth_images
    from sgqn_carla_tpu.data.videos import NUM_EASY, NUM_HARD, synth_videos

    os.makedirs(target, exist_ok=True)

    # ---- color tables: procedural → reference torch-pickle format
    for mode in ("color_easy", "color_hard"):
        table = make_color_table(mode, seed=seed)  # {field: (N, 3) arrays}
        n = int(next(iter(table.values())).shape[0])
        rows = [{f: np.asarray(table[f][i], np.float64) for f in table}
                for i in range(n)]
        torch.save(rows, os.path.join(target, f"{mode}.pt"))
        print(f"{mode}.pt: {n} rows, fields={sorted(table)}")

    # ---- video pools: procedural clips → real mp4 (BGR for cv2)
    for mode, num in (("video_easy", NUM_EASY), ("video_hard", NUM_HARD)):
        vd = os.path.join(target, mode)
        os.makedirs(vd, exist_ok=True)
        clips = synth_videos(num, num_frames=64, height=256, width=256,
                             seed=seed + (7 if mode == "video_hard" else 3),
                             gentle=(mode == "video_easy"))
        for i in range(num):
            w = cv2.VideoWriter(os.path.join(vd, f"video{i}.mp4"),
                                cv2.VideoWriter_fourcc(*"mp4v"), 25,
                                (256, 256))
            for f in range(clips.shape[1]):
                w.write(clips[i, f, :, :, ::-1])  # RGB → BGR
            w.release()
        print(f"{mode}: {num} mp4 clips @256x256x{clips.shape[1]}")

    # ---- places365_standard JPEG tree (overlay pool source)
    imgs = synth_images(128, 256, 256, seed=seed)  # (N, 3, H, W) [0,1]
    for i in range(imgs.shape[0]):
        cls = f"class{i % 8}"
        jd = os.path.join(target, "places365_standard", "train", cls)
        os.makedirs(jd, exist_ok=True)
        bgr = (imgs[i].transpose(1, 2, 0)[:, :, ::-1] * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(jd, f"{i:08d}.jpg"), bgr)
    print(f"places365_standard: {imgs.shape[0]} JPEGs in 8 classes")
    print(f"DMCGB-format tree complete under {target}")


if __name__ == "__main__":
    tgt = sys.argv[1] if len(sys.argv) > 1 else "runs/dmcgb_synth"
    sd = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    main(tgt, sd)
