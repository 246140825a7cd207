"""Bilinear sampling / resizing with explicit corner conventions.

TPU-native replacement for the reference's uses of ``F.grid_sample``
and ``F.interpolate`` in the TensoRF family (tensoRF/network.py:125-126,
:268-272; tensoRF/network_cc.py:158). Gather-based jnp — batched
gathers + lerps fuse well under XLA; no kernel needed.

Conventions implemented exactly:
- ``align_corners=True``: u in [-1, 1] maps to pixel centers
  0 .. W-1 via (u + 1) / 2 * (W - 1)   (torch grid_sample semantics)
- ``align_corners=False``: (u + 1) / 2 * W - 0.5
- zero padding outside the grid (grid_sample padding_mode='zeros')
"""

from __future__ import annotations

import jax.numpy as jnp


def _to_pixel(u: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    u = u.astype(jnp.float32)
    if align_corners:
        return (u + 1.0) / 2.0 * (size - 1)
    return (u + 1.0) / 2.0 * size - 0.5


def sample_1d(
    line: jnp.ndarray, u: jnp.ndarray, align_corners: bool = True
) -> jnp.ndarray:
    """line: [R, D]; u: [N] in [-1, 1] → [R, N] (zero outside)."""
    D = line.shape[-1]
    p = _to_pixel(u, D, align_corners)
    p0 = jnp.floor(p).astype(jnp.int32)
    f = p - p0
    p1 = p0 + 1

    def tap(idx):
        ok = (idx >= 0) & (idx < D)
        v = jnp.take(line, jnp.clip(idx, 0, D - 1), axis=-1)  # [R, N]
        return jnp.where(ok[None, :], v, 0.0)

    return tap(p0) * (1.0 - f)[None, :] + tap(p1) * f[None, :]


def sample_2d(
    plane: jnp.ndarray, uv: jnp.ndarray, align_corners: bool = True
) -> jnp.ndarray:
    """plane: [R, H, W]; uv: [N, 2] with uv[:, 0] = u → x/W axis,
    uv[:, 1] = v → y/H axis (torch grid_sample convention) → [R, N]."""
    R, H, W = plane.shape
    px = _to_pixel(uv[:, 0], W, align_corners)
    py = _to_pixel(uv[:, 1], H, align_corners)
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    fx = px - x0
    fy = py - y0
    flat = plane.reshape(R, H * W)

    def tap(yi, xi):
        ok = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        v = jnp.take(flat, idx, axis=-1)  # [R, N]
        return jnp.where(ok[None, :], v, 0.0)

    return (
        tap(y0, x0) * ((1 - fx) * (1 - fy))[None, :]
        + tap(y0, x0 + 1) * (fx * (1 - fy))[None, :]
        + tap(y0 + 1, x0) * ((1 - fx) * fy)[None, :]
        + tap(y0 + 1, x0 + 1) * (fx * fy)[None, :]
    )


def resize_bilinear(
    img: jnp.ndarray, new_hw, align_corners: bool = True
) -> jnp.ndarray:
    """img: [..., H, W] → [..., H', W'], matching F.interpolate
    (mode='bilinear'). Used by TensoRF upsample_model
    (tensoRF/network.py:268-272)."""
    H, W = img.shape[-2:]
    Hn, Wn = new_hw
    if align_corners:
        ys = jnp.linspace(0.0, H - 1.0, Hn)
        xs = jnp.linspace(0.0, W - 1.0, Wn)
    else:
        ys = (jnp.arange(Hn) + 0.5) * H / Hn - 0.5
        xs = (jnp.arange(Wn) + 0.5) * W / Wn - 0.5

    def interp_axis(a, coords, axis):
        size = a.shape[axis]
        c0 = jnp.clip(jnp.floor(coords).astype(jnp.int32), 0, size - 1)
        c1 = jnp.clip(c0 + 1, 0, size - 1)
        f = jnp.clip(coords - c0, 0.0, 1.0)
        v0 = jnp.take(a, c0, axis=axis)
        v1 = jnp.take(a, c1, axis=axis)
        shape = [1] * a.ndim
        shape[axis] = -1
        f = f.reshape(shape)
        return v0 * (1 - f) + v1 * f

    out = interp_axis(img, ys, img.ndim - 2)
    out = interp_axis(out, xs, out.ndim - 1)
    return out
