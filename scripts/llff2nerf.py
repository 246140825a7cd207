#!/usr/bin/env python
"""LLFF → transforms.json converter.

TPU-native equivalent of the reference's ``scripts/llff2nerf.py``:
reads ``poses_bounds.npy`` ([N, 17]: 3x5 pose+hwf, 2 depth bounds),
converts LLFF's (down, right, backwards) axes to nerf convention and
writes transforms.json.
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
    parser.add_argument("path", help="LLFF scene dir containing poses_bounds.npy")
    parser.add_argument("--images", default="images")
    parser.add_argument("--downscale", type=int, default=1)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    pb = np.load(os.path.join(args.path, "poses_bounds.npy"))  # [N, 17]
    poses_hwf = pb[:, :15].reshape(-1, 3, 5)
    h, w, focal = poses_hwf[0, :, 4]
    h, w, focal = h / args.downscale, w / args.downscale, focal / args.downscale

    img_dir = args.images if args.downscale == 1 else f"{args.images}_{args.downscale}"
    files = sorted(
        glob.glob(os.path.join(args.path, img_dir, "*"))
    )
    files = [f for f in files if f.lower().endswith((".jpg", ".jpeg", ".png"))]
    if len(files) != len(pb):
        raise RuntimeError(f"{len(files)} images vs {len(pb)} poses")

    frames = []
    for i in range(len(pb)):
        m = poses_hwf[i, :, :4]  # [3, 4] llff (down, right, backwards)
        # llff -> nerf: [right, up, backwards] = [m[:,1], -m[:,0], m[:,2]]
        c2w = np.eye(4)
        c2w[:3, 0] = m[:, 1]
        c2w[:3, 1] = -m[:, 0]
        c2w[:3, 2] = m[:, 2]
        c2w[:3, 3] = m[:, 3]
        frames.append(
            {
                "file_path": os.path.relpath(files[i], args.path),
                "transform_matrix": c2w.tolist(),
            }
        )

    meta = {
        "camera_angle_x": 2 * math.atan(w / (2 * focal)),
        "fl_x": focal, "fl_y": focal, "cx": w / 2, "cy": h / 2,
        "w": int(w), "h": int(h),
        "frames": frames,
    }
    out = args.out or os.path.join(args.path, "transforms.json")
    with open(out, "w") as f:
        json.dump(meta, f, indent=2)
    print(f"wrote {out} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
