#!/usr/bin/env python
"""HyperNeRF capture → transforms.json converter.

TPU-native equivalent of the reference's ``scripts/hyper2nerf.py``:
reads the HyperNeRF/Nerfies capture layout (``dataset.json``,
``scene.json``, per-frame ``camera/*.json``, ``metadata.json``) and
writes ``transforms_{train,val}.json`` with per-frame times for the
dynamic (D-NeRF) pipeline.
"""

from __future__ import annotations

import argparse
import json
import math
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("path", help="HyperNeRF capture root")
    parser.add_argument("--downscale", type=int, default=2)
    args = parser.parse_args()

    with open(os.path.join(args.path, "dataset.json")) as f:
        dataset = json.load(f)
    with open(os.path.join(args.path, "scene.json")) as f:
        scene = json.load(f)
    with open(os.path.join(args.path, "metadata.json")) as f:
        metadata = json.load(f)

    center = np.asarray(scene.get("center", [0, 0, 0]))
    scale = float(scene.get("scale", 1.0))
    ids = dataset["ids"]
    train_ids = set(dataset.get("train_ids", ids))
    val_ids = set(dataset.get("val_ids", []))

    # times from warp/time ids, normalized
    all_tids = [metadata[i].get("warp_id", metadata[i].get("time_id", k)) for k, i in enumerate(ids)]
    tmax = max(all_tids) or 1

    splits = {"train": [], "val": []}
    cam_meta = {}
    for k, img_id in enumerate(ids):
        with open(os.path.join(args.path, "camera", f"{img_id}.json")) as f:
            cam = json.load(f)
        orientation = np.asarray(cam["orientation"])  # world2cam rotation
        position = np.asarray(cam["position"])
        focal = cam["focal_length"] / args.downscale
        pp = np.asarray(cam["principal_point"]) / args.downscale
        w = int(cam["image_size"][0] // args.downscale)
        h = int(cam["image_size"][1] // args.downscale)
        cam_meta = {"fl_x": focal, "fl_y": focal, "cx": float(pp[0]), "cy": float(pp[1]), "w": w, "h": h}

        c2w = np.eye(4)
        c2w[:3, :3] = orientation.T
        c2w[:3, 3] = (position - center) * scale
        # nerfies cameras are OpenCV-convention: flip y/z to nerf
        c2w[:3, 1] *= -1
        c2w[:3, 2] *= -1

        frame = {
            "file_path": f"rgb/{args.downscale}x/{img_id}.png",
            "transform_matrix": c2w.tolist(),
            "time": all_tids[k] / tmax,
        }
        if img_id in val_ids:
            splits["val"].append(frame)
        else:
            splits["train"].append(frame)

    for split, frames in splits.items():
        if not frames:
            continue
        meta = {
            "camera_angle_x": 2 * math.atan(cam_meta["w"] / (2 * cam_meta["fl_x"])),
            **cam_meta,
            "frames": frames,
        }
        out = os.path.join(args.path, f"transforms_{split}.json")
        with open(out, "w") as f:
            json.dump(meta, f, indent=2)
        print(f"wrote {out} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
