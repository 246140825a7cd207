#!/usr/bin/env python
"""Tanks & Temples (NSVF layout) → transforms.json converter.

TPU-native equivalent of the reference's ``scripts/tanks2nerf.py``:
reads ``intrinsics.txt`` plus per-image ``pose/*.txt`` (4x4 cam2world)
from the NSVF-style TanksAndTemple release and writes per-split
``transforms_{train,val,test}.json`` (split by filename prefix 0_=train,
1_=val, 2_=test, the NSVF convention).
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("path", help="scene dir with intrinsics.txt, pose/, rgb/")
    args = parser.parse_args()

    intr = np.loadtxt(os.path.join(args.path, "intrinsics.txt")).reshape(-1)
    # NSVF intrinsics.txt: fx cx cy 0 / 0 0 0 ... (first 3 values used)
    fx = float(intr[0])
    cx = float(intr[2]) if intr.size >= 3 else None
    cy = float(intr[5 if intr.size >= 6 else 2]) if intr.size >= 6 else None

    pose_files = sorted(glob.glob(os.path.join(args.path, "pose", "*.txt")))
    splits = {"train": [], "val": [], "test": []}
    prefix_map = {"0": "train", "1": "val", "2": "test"}
    W = H = None
    for pf in pose_files:
        name = os.path.splitext(os.path.basename(pf))[0]
        split = prefix_map.get(name.split("_")[0], "train")
        c2w = np.loadtxt(pf).reshape(4, 4)
        # NSVF poses are OpenCV-style (+y down +z forward): flip to nerf
        c2w[:3, 1] *= -1
        c2w[:3, 2] *= -1
        img = None
        for ext in (".png", ".jpg"):
            cand = os.path.join(args.path, "rgb", name + ext)
            if os.path.exists(cand):
                img = cand
                break
        if img is None:
            continue
        if W is None:
            import cv2

            im = cv2.imread(img)
            H, W = im.shape[:2]
        splits[split].append(
            {
                "file_path": os.path.relpath(img, args.path),
                "transform_matrix": c2w.tolist(),
            }
        )

    for split, frames in splits.items():
        if not frames:
            continue
        meta = {
            "camera_angle_x": 2 * math.atan(W / (2 * fx)),
            "fl_x": fx, "fl_y": fx,
            "cx": cx if cx else W / 2, "cy": cy if cy else H / 2,
            "w": W, "h": H,
            "frames": frames,
        }
        out = os.path.join(args.path, f"transforms_{split}.json")
        with open(out, "w") as f:
            json.dump(meta, f, indent=2)
        print(f"wrote {out} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
