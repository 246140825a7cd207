"""NeRF dataset provider: transforms.json loading (colmap + blender).

TPU-native equivalent of the reference's ``nerf/provider.py``
(`NeRFDataset`): auto-detects colmap (single ``transforms.json``,
first frame = val, slerp-interpolated test path) vs blender
(``transforms_{split}.json``) layouts; `nerf_matrix_to_ngp` pose
conversion; intrinsics from fl_x/fl_y or camera_angle_x; cv2 image
loading with BGR(A)→RGB(A), downscale, [0, 1] floats.

TPU-first design: instead of a DataLoader whose collate does GPU ray
sampling per step, the dataset exposes the whole split as stacked
device arrays (poses [N,4,4], images [N,H,W,C], error_map) — a lego
train split at 800x800 RGBA fp16 is ~410 MB, well within HBM — and the
jitted train step samples rays directly from them
(:mod:`ngp_tpu.data.raysampler`). The "loader" is just an index
iterator.
"""

from __future__ import annotations

import glob
import json
import os
from typing import List, Optional

import numpy as np

from ngp_tpu.data.raysampler import ERROR_MAP_SIZE


def nerf_matrix_to_ngp(pose: np.ndarray, scale: float = 0.33, offset=(0, 0, 0)) -> np.ndarray:
    """NeRF→ngp axis permutation + scene scaling (provider.py:19-27)."""
    return np.array(
        [
            [pose[1, 0], -pose[1, 1], -pose[1, 2], pose[1, 3] * scale + offset[0]],
            [pose[2, 0], -pose[2, 1], -pose[2, 2], pose[2, 3] * scale + offset[1]],
            [pose[0, 0], -pose[0, 1], -pose[0, 2], pose[0, 3] * scale + offset[2]],
            [0, 0, 0, 1],
        ],
        dtype=np.float32,
    )


def rand_poses(
    rng: np.random.Generator,
    size: int,
    radius: float = 1.0,
    theta_range=(np.pi / 3, 2 * np.pi / 3),
    phi_range=(0, 2 * np.pi),
) -> np.ndarray:
    """Random orbit-camera poses (provider.py:57-91), y-up lookat."""
    thetas = rng.uniform(theta_range[0], theta_range[1], size)
    phis = rng.uniform(phi_range[0], phi_range[1], size)
    centers = np.stack(
        [
            radius * np.sin(thetas) * np.sin(phis),
            radius * np.cos(thetas),
            radius * np.sin(thetas) * np.cos(phis),
        ],
        axis=-1,
    )

    def normalize(v):
        return v / (np.linalg.norm(v, axis=-1, keepdims=True) + 1e-10)

    forward = -normalize(centers)
    up = np.broadcast_to(np.array([0.0, -1.0, 0.0]), centers.shape)
    right = normalize(np.cross(forward, up))
    up = normalize(np.cross(right, forward))
    poses = np.broadcast_to(np.eye(4, dtype=np.float32), (size, 4, 4)).copy()
    poses[:, :3, :3] = np.stack([right, up, forward], axis=-1)
    poses[:, :3, 3] = centers
    return poses.astype(np.float32)


def _slerp(r0: np.ndarray, r1: np.ndarray, t: float) -> np.ndarray:
    """Rotation-matrix slerp via scipy (provider.py:169-173)."""
    from scipy.spatial.transform import Rotation, Slerp

    rots = Rotation.from_matrix(np.stack([r0, r1]))
    return Slerp([0, 1], rots)(t).as_matrix()


class NeRFDataset:
    def __init__(
        self,
        path: str,
        split: str = "train",
        downscale: int = 1,
        scale: float = 0.33,
        offset=(0, 0, 0),
        n_test: int = 10,
        error_map: bool = False,
        seed: int = 0,
        color_space: str = "srgb",
    ):
        import cv2

        self.root_path = path
        self.split = split
        self.training = split in ("train", "all", "trainval")
        rng = np.random.default_rng(seed)

        if os.path.exists(os.path.join(path, "transforms.json")):
            self.mode = "colmap"
            with open(os.path.join(path, "transforms.json")) as f:
                transform = json.load(f)
        elif os.path.exists(os.path.join(path, "transforms_train.json")):
            self.mode = "blender"
            if split == "all":
                transform = None
                for p in sorted(glob.glob(os.path.join(path, "*.json"))):
                    with open(p) as f:
                        t = json.load(f)
                    if transform is None:
                        transform = t
                    else:
                        transform["frames"].extend(t["frames"])
            elif split == "trainval":
                with open(os.path.join(path, "transforms_train.json")) as f:
                    transform = json.load(f)
                with open(os.path.join(path, "transforms_val.json")) as f:
                    transform["frames"].extend(json.load(f)["frames"])
            else:
                with open(os.path.join(path, f"transforms_{split}.json")) as f:
                    transform = json.load(f)
        else:
            raise FileNotFoundError(f"no transforms*.json under {path}")

        if "h" in transform and "w" in transform:
            self.H = int(transform["h"]) // downscale
            self.W = int(transform["w"]) // downscale
        else:
            self.H = self.W = None

        frames = transform["frames"]
        poses: List[np.ndarray] = []
        images: Optional[List[np.ndarray]] = []
        times: List[float] = []

        if self.mode == "colmap" and split == "test":
            # interpolate a smooth path between two random frames
            f0, f1 = rng.choice(frames, 2, replace=False)
            p0 = nerf_matrix_to_ngp(np.array(f0["transform_matrix"], np.float32), scale, offset)
            p1 = nerf_matrix_to_ngp(np.array(f1["transform_matrix"], np.float32), scale, offset)
            images = None
            for i in range(n_test + 1):
                ratio = np.sin(((i / n_test) - 0.5) * np.pi) * 0.5 + 0.5
                pose = np.eye(4, dtype=np.float32)
                pose[:3, :3] = _slerp(p0[:3, :3], p1[:3, :3], ratio)
                pose[:3, 3] = (1 - ratio) * p0[:3, 3] + ratio * p1[:3, 3]
                poses.append(pose)
                times.append(i / max(n_test, 1))
            # H/W must come from an existing frame image
            if self.H is None:
                img = cv2.imread(
                    os.path.join(path, frames[0]["file_path"]), cv2.IMREAD_UNCHANGED
                )
                self.H = img.shape[0] // downscale
                self.W = img.shape[1] // downscale
        else:
            if self.mode == "colmap":
                if split == "train":
                    frames = frames[1:]
                elif split == "val":
                    frames = frames[:1]
            for fr in frames:
                f_path = os.path.join(path, fr["file_path"])
                if self.mode == "blender" and "." not in os.path.basename(f_path):
                    f_path += ".png"
                if not os.path.exists(f_path):
                    continue
                pose = nerf_matrix_to_ngp(
                    np.array(fr["transform_matrix"], np.float32), scale, offset
                )
                image = cv2.imread(f_path, cv2.IMREAD_UNCHANGED)
                if self.H is None:
                    self.H = image.shape[0] // downscale
                    self.W = image.shape[1] // downscale
                if image.shape[-1] == 3:
                    image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
                else:
                    image = cv2.cvtColor(image, cv2.COLOR_BGRA2RGBA)
                if image.shape[0] != self.H or image.shape[1] != self.W:
                    image = cv2.resize(image, (self.W, self.H), interpolation=cv2.INTER_AREA)
                poses.append(pose)
                images.append(image.astype(np.float32) / 255.0)
                times.append(float(fr.get("time", len(times))))

        self.poses = np.stack(poses)
        # per-frame times in [0, 1] for dynamic scenes (dnerf/provider.py:
        # 'time' field, or frame index normalized when absent)
        times = np.asarray(times, np.float32)
        if times.size and times.max() > 1.0:
            times = times / max(times.max(), 1.0)
        self.times = times
        self.images = np.stack(images) if images else None
        if self.images is not None and color_space == "linear":
            # train in linear radiance (provider.py color_space handling;
            # export converts back via Trainer._export_color)
            from ngp_tpu.utils.color import srgb_to_linear_np

            self.images[..., :3] = srgb_to_linear_np(self.images[..., :3])
        self.radius = float(np.linalg.norm(self.poses[:, :3, 3], axis=-1).mean())

        self.error_map = (
            np.ones((len(self.poses), ERROR_MAP_SIZE * ERROR_MAP_SIZE), np.float32)
            if (self.training and error_map)
            else None
        )

        # intrinsics (provider.py:259-274)
        if "fl_x" in transform or "fl_y" in transform:
            fl_x = transform.get("fl_x", transform.get("fl_y")) / downscale
            fl_y = transform.get("fl_y", transform.get("fl_x")) / downscale
        elif "camera_angle_x" in transform or "camera_angle_y" in transform:
            fl_x = (
                self.W / (2 * np.tan(transform["camera_angle_x"] / 2))
                if "camera_angle_x" in transform
                else None
            )
            fl_y = (
                self.H / (2 * np.tan(transform["camera_angle_y"] / 2))
                if "camera_angle_y" in transform
                else None
            )
            fl_x = fl_x if fl_x is not None else fl_y
            fl_y = fl_y if fl_y is not None else fl_x
        else:
            raise RuntimeError("cannot determine focal length from transforms.json")
        cx = transform.get("cx", self.W / 2) / (downscale if "cx" in transform else 1)
        cy = transform.get("cy", self.H / 2) / (downscale if "cy" in transform else 1)
        self.intrinsics = np.array([fl_x, fl_y, cx, cy], dtype=np.float32)

    def __len__(self) -> int:
        return len(self.poses)

    @property
    def has_gt(self) -> bool:
        return self.images is not None

    @property
    def num_channels(self) -> int:
        return self.images.shape[-1] if self.images is not None else 3

    def epoch_indices(self, rng: np.random.Generator, rand_pose: int = -1) -> np.ndarray:
        """Shuffled frame indices for one epoch; appends 1/rand_pose
        virtual indices >= len(poses) meaning 'render a random pose'
        (CLIP-guidance mode, provider.py:325-331)."""
        size = len(self.poses)
        if self.training and rand_pose > 0:
            size += size // rand_pose
        idx = rng.permutation(size) if self.training else np.arange(size)
        return idx
