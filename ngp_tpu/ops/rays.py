"""Ray geometry utilities: AABB intersection, background-sphere coords,
camera-ray generation.

TPU-native equivalents of:
- ``raymarching/src/raymarching.cu:92-156`` (`near_far_from_aabb`)
- ``raymarching/src/raymarching.cu:163-209`` (`sph_from_ray`)
- ``nerf/utils.py:53-137`` (`get_rays` — the pixel-sampling variants
  live in ``ngp_tpu.data``; here is the pure geometry).

All pure jnp — per-ray independent vector math, ideal VPU work.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

_BIG = 1e10


def near_far_from_aabb(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    aabb: jnp.ndarray,
    min_near: float = 0.05,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slab-test ray/AABB intersection → per-ray (near, far).

    Args:
      rays_o, rays_d: [..., 3] origins and (not necessarily unit) dirs.
      aabb: [6] = (xmin, ymin, zmin, xmax, ymax, zmax).
      min_near: lower clamp on near.

    Misses produce near == far == 1e10 (the reference uses FLT_MAX;
    a large finite value avoids inf arithmetic downstream).
    """
    o = rays_o.astype(jnp.float32)
    d = rays_d.astype(jnp.float32)
    inv_d = 1.0 / d
    lo = (aabb[:3] - o) * inv_d
    hi = (aabb[3:] - o) * inv_d
    t_near = jnp.minimum(lo, hi)
    t_far = jnp.maximum(lo, hi)
    near = jnp.max(t_near, axis=-1)
    far = jnp.min(t_far, axis=-1)
    miss = near > far
    near = jnp.maximum(near, min_near)
    near = jnp.where(miss, _BIG, near)
    far = jnp.where(miss, _BIG, far)
    return near, far


def sph_from_ray(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, radius: float
) -> jnp.ndarray:
    """Ray ∩ sphere(radius) → (theta, phi) normalized to [-1, 1].

    Mirrors ``raymarching.cu:163-209``: takes the larger quadratic root
    (the far intersection, assuming origins inside the sphere), y is the
    up axis; returns [..., 2] = (2*theta/pi - 1, phi/pi).
    """
    o = rays_o.astype(jnp.float32)
    d = rays_d.astype(jnp.float32)
    a = jnp.sum(d * d, axis=-1)
    b = jnp.sum(o * d, axis=-1)  # actually B/2
    c = jnp.sum(o * o, axis=-1) - radius * radius
    disc = jnp.maximum(b * b - a * c, 0.0)
    t = (-b + jnp.sqrt(disc)) / a
    p = o + t[..., None] * d
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    theta = jnp.arctan2(jnp.sqrt(x * x + z * z), y)  # [0, pi)
    phi = jnp.arctan2(z, x)  # [-pi, pi)
    return jnp.stack([2.0 * theta / jnp.pi - 1.0, phi / jnp.pi], axis=-1)


def rays_from_pixels(
    pixels_xy: jnp.ndarray,
    pose: jnp.ndarray,
    intrinsics: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unproject pixel centers into world-space rays.

    Args:
      pixels_xy: [..., 2] integer or float pixel coords (x=col, y=row);
        0.5 is added internally (pixel centers), as in ``get_rays``.
      pose: [..., 4, 4] or [4, 4] camera-to-world matrix.
      intrinsics: [4] = (fx, fy, cx, cy).

    Returns:
      (rays_o, rays_d): [..., 3] origins and unit directions.
    """
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    x = (pixels_xy[..., 0].astype(jnp.float32) + 0.5 - cx) / fx
    y = (pixels_xy[..., 1].astype(jnp.float32) + 0.5 - cy) / fy
    # camera-space direction, z = +1 convention exactly as the
    # reference's get_rays (nerf/utils.py:117-123); axis conventions are
    # handled upstream by the pose conversion (nerf_matrix_to_ngp).
    dirs_cam = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    rot = pose[..., :3, :3]
    trans = pose[..., :3, 3]
    dirs = jnp.einsum("...ij,...j->...i", rot, dirs_cam)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(trans, dirs.shape)
    return rays_o, dirs
