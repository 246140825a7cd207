#!/usr/bin/env python
"""COLMAP → transforms.json converter.

TPU-native equivalent of the reference's ``scripts/colmap2nerf.py``:
parses a COLMAP sparse reconstruction (text or binary model) into the
instant-ngp ``transforms.json`` layout, with the same centering and
scaling conventions (centroid of pairwise closest-approach points,
``--dynamic`` per-frame times). Video-to-frames (ffmpeg) and the COLMAP
run itself are external binaries; they are invoked only when present
on PATH and requested — the parser works on any existing model.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import struct
import subprocess
import sys

import numpy as np


def qvec2rotmat(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
            [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w],
            [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y],
        ]
    )


def read_cameras_text(path):
    cams = {}
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            parts = line.split()
            cam_id, model = int(parts[0]), parts[1]
            w, h = int(parts[2]), int(parts[3])
            params = [float(p) for p in parts[4:]]
            cams[cam_id] = (model, w, h, params)
    return cams


def read_images_text(path):
    images = {}
    with open(path) as f:
        lines = [l for l in f if not l.startswith("#") and l.strip()]
    for i in range(0, len(lines), 2):  # every image has a 2nd 2D-points line
        parts = lines[i].split()
        img_id = int(parts[0])
        q = [float(v) for v in parts[1:5]]
        t = [float(v) for v in parts[5:8]]
        cam_id = int(parts[8])
        name = parts[9]
        images[img_id] = (q, t, cam_id, name)
    return images


def read_cameras_binary(path):
    model_num_params = {0: 3, 1: 4, 2: 4, 3: 5, 4: 8, 5: 8, 6: 12, 7: 5, 8: 4, 9: 5, 10: 12}
    model_names = {0: "SIMPLE_PINHOLE", 1: "PINHOLE", 2: "SIMPLE_RADIAL", 3: "RADIAL",
                   4: "OPENCV", 5: "OPENCV_FISHEYE", 6: "FULL_OPENCV", 7: "FOV",
                   8: "SIMPLE_RADIAL_FISHEYE", 9: "RADIAL_FISHEYE", 10: "THIN_PRISM_FISHEYE"}
    cams = {}
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        for _ in range(n):
            cam_id, model_id, w, h = struct.unpack("<iiQQ", f.read(24))
            k = model_num_params[model_id]
            params = struct.unpack(f"<{k}d", f.read(8 * k))
            cams[cam_id] = (model_names[model_id], w, h, list(params))
    return cams


def read_images_binary(path):
    images = {}
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        for _ in range(n):
            img_id = struct.unpack("<i", f.read(4))[0]
            q = struct.unpack("<4d", f.read(32))
            t = struct.unpack("<3d", f.read(24))
            cam_id = struct.unpack("<i", f.read(4))[0]
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (n2d,) = struct.unpack("<Q", f.read(8))
            f.read(24 * n2d)
            images[img_id] = (list(q), list(t), cam_id, name.decode())
    return images


def intrinsics_from_camera(model, w, h, params):
    if model == "SIMPLE_PINHOLE":
        f, cx, cy = params[:3]
        return f, f, cx, cy
    if model in ("PINHOLE", "OPENCV", "FULL_OPENCV"):
        fx, fy, cx, cy = params[:4]
        return fx, fy, cx, cy
    if model in ("SIMPLE_RADIAL", "RADIAL", "SIMPLE_RADIAL_FISHEYE", "RADIAL_FISHEYE"):
        f, cx, cy = params[:3]
        return f, f, cx, cy
    raise ValueError(f"unsupported camera model {model}")


def closest_point_pair(oa, da, ob, db):
    """Closest-approach point between two rays (used for scene centering,
    same idea as the reference's central_point)."""
    da = da / np.linalg.norm(da)
    db = db / np.linalg.norm(db)
    c = np.cross(da, db)
    denom = np.linalg.norm(c) ** 2
    if denom < 1e-10:
        return None, 0.0
    t = ob - oa
    ta = np.linalg.det([t, db, c]) / denom
    tb = np.linalg.det([t, da, c]) / denom
    if ta <= 0 or tb <= 0:
        return None, 0.0
    return (oa + ta * da + ob + tb * db) * 0.5, 1.0


def convert(model_dir: str, out_path: str, image_dir: str = "images", aabb_scale: int = 4,
            keep_colmap_coords: bool = False, dynamic: bool = False):
    if os.path.exists(os.path.join(model_dir, "cameras.txt")):
        cams = read_cameras_text(os.path.join(model_dir, "cameras.txt"))
        images = read_images_text(os.path.join(model_dir, "images.txt"))
    elif os.path.exists(os.path.join(model_dir, "cameras.bin")):
        cams = read_cameras_binary(os.path.join(model_dir, "cameras.bin"))
        images = read_images_binary(os.path.join(model_dir, "images.bin"))
    else:
        raise FileNotFoundError(f"no COLMAP model under {model_dir}")

    cam0 = next(iter(cams.values()))
    model, w, h, params = cam0
    fx, fy, cx, cy = intrinsics_from_camera(model, w, h, params)

    frames = []
    names = []
    for img_id in sorted(images.keys()):
        q, t, cam_id, name = images[img_id]
        R = qvec2rotmat(q)
        tvec = np.asarray(t)
        # world2cam -> cam2world
        c2w = np.eye(4)
        c2w[:3, :3] = R.T
        c2w[:3, 3] = -R.T @ tvec
        if not keep_colmap_coords:
            # colmap: +z forward, -y up; nerf: -z forward... flip y/z axes
            c2w[0:3, 1] *= -1
            c2w[0:3, 2] *= -1
        frames.append(c2w)
        names.append(name)

    poses = np.stack(frames)
    if not keep_colmap_coords:
        # center on the average closest-approach point of view rays
        centers = []
        for i in range(len(poses)):
            for j in range(i + 1, min(i + 6, len(poses))):
                p, wgt = closest_point_pair(
                    poses[i][:3, 3], poses[i][:3, 2] * -1,
                    poses[j][:3, 3], poses[j][:3, 2] * -1,
                )
                if p is not None:
                    centers.append(p)
        if centers:
            center = np.mean(centers, axis=0)
            poses[:, :3, 3] -= center
        avg_dist = np.mean(np.linalg.norm(poses[:, :3, 3], axis=-1))
        if avg_dist > 0:
            poses[:, :3, 3] *= 4.0 / avg_dist  # ~radius 4 like the reference

    out_frames = []
    n = len(poses)
    for i, (pose, name) in enumerate(zip(poses, names)):
        frame = {
            "file_path": os.path.join(image_dir, name),
            "transform_matrix": pose.tolist(),
        }
        if dynamic:
            frame["time"] = i / max(n - 1, 1)
        out_frames.append(frame)

    meta = {
        "camera_angle_x": 2 * math.atan(w / (2 * fx)),
        "camera_angle_y": 2 * math.atan(h / (2 * fy)),
        "fl_x": fx, "fl_y": fy, "cx": cx, "cy": cy,
        "w": w, "h": h, "aabb_scale": aabb_scale,
        "frames": out_frames,
    }
    with open(out_path, "w") as f:
        json.dump(meta, f, indent=2)
    print(f"wrote {out_path} ({len(out_frames)} frames)")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--video", default="", help="input video (needs ffmpeg on PATH)")
    parser.add_argument("--images", default="images")
    parser.add_argument("--run_colmap", action="store_true", help="run COLMAP (needs colmap on PATH)")
    parser.add_argument("--colmap_model", default="colmap_sparse/0", help="existing COLMAP model dir")
    parser.add_argument("--out", default="transforms.json")
    parser.add_argument("--aabb_scale", type=int, default=4)
    parser.add_argument("--keep_colmap_coords", action="store_true")
    parser.add_argument("--dynamic", action="store_true", help="add per-frame time values")
    parser.add_argument("--video_fps", type=int, default=3)
    args = parser.parse_args()

    if args.video:
        if shutil.which("ffmpeg") is None:
            sys.exit("ffmpeg not found on PATH (required for --video)")
        os.makedirs(args.images, exist_ok=True)
        subprocess.run(
            ["ffmpeg", "-i", args.video, "-qscale:v", "1", "-qmin", "1",
             "-vf", f"fps={args.video_fps}", os.path.join(args.images, "%04d.jpg")],
            check=True,
        )
    if args.run_colmap:
        if shutil.which("colmap") is None:
            sys.exit("colmap not found on PATH (required for --run_colmap)")
        db = "colmap.db"
        subprocess.run(["colmap", "feature_extractor", "--database_path", db, "--image_path", args.images], check=True)
        subprocess.run(["colmap", "exhaustive_matcher", "--database_path", db], check=True)
        os.makedirs("colmap_sparse", exist_ok=True)
        subprocess.run(["colmap", "mapper", "--database_path", db, "--image_path", args.images, "--output_path", "colmap_sparse"], check=True)

    convert(args.colmap_model, args.out, args.images, args.aabb_scale,
            args.keep_colmap_coords, args.dynamic)


if __name__ == "__main__":
    main()
