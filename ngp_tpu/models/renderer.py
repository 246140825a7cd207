"""Volume rendering — the non-accelerated path.

TPU-native equivalent of ``nerf/renderer.py:125-253`` (`NeRFRenderer.run`):
uniform stratified sampling in [near, far], optional PDF importance
upsampling (`sample_pdf`, renderer.py:12-46), and front-to-back
compositing. Everything is fixed-shape jnp over a dense
[n_rays, n_samples] lattice; compositing uses an exclusive cumulative
product under autodiff (the CUDA analytic composite backward,
raymarching.cu:602-693, is simply ``jax.grad`` of this function).

The accelerated occupancy-grid path lives in
:mod:`ngp_tpu.models.occupancy` + :func:`render_rays_grid`.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ngp_tpu.config import RenderConfig
from ngp_tpu.ops.rays import near_far_from_aabb, sph_from_ray


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    rng: Optional[jax.Array],
) -> jnp.ndarray:
    """Inverse-CDF sampling of new z-values (renderer.py:12-46).

    bins: [B, T] existing z midpoints; weights: [B, T-1]; deterministic
    (midpoint lattice) when ``rng`` is None, stratified-uniform otherwise.
    """
    weights = weights.astype(jnp.float32) + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [B, T]

    if rng is None:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(rng, cdf.shape[:-1] + (n_samples,))

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)
    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bins_b = jnp.take_along_axis(bins, below, axis=-1)
    bins_a = jnp.take_along_axis(bins, above, axis=-1)
    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def composite(
    sigmas: jnp.ndarray,
    rgbs: jnp.ndarray,
    deltas: jnp.ndarray,
    density_scale: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """Front-to-back alpha compositing over the sample axis.

    sigmas: [N, T]; rgbs: [N, T, 3]; deltas: [N, T]. Returns weights
    [N, T], weights_sum [N], and image [N, 3]. alpha = 1 - exp(-sigma *
    delta * scale); T_i = prod_{j<i}(1 - alpha_j) (exclusive), w = alpha*T
    — exactly the reference compositor (renderer.py:206-210 /
    raymarching.cu:501-588).
    """
    sigmas = sigmas.astype(jnp.float32)
    alphas = 1.0 - jnp.exp(-deltas * density_scale * sigmas)  # [N, T]
    # exclusive cumprod of (1 - alpha + eps) — the reference appends a
    # leading 1 and drops the last element.
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[..., :1]), 1.0 - alphas + 1e-15], axis=-1
    )
    transmittance = jnp.cumprod(shifted, axis=-1)[..., :-1]  # [N, T]
    weights = alphas * transmittance
    weights_sum = jnp.sum(weights, axis=-1)
    image = jnp.sum(weights[..., None] * rgbs.astype(jnp.float32), axis=-2)
    return {"weights": weights, "weights_sum": weights_sum, "image": image}


def render_rays(
    density_fn: Callable,
    color_fn: Callable,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    cfg: RenderConfig,
    rng: Optional[jax.Array] = None,
    perturb: bool = False,
    bg_color=None,
    bg_fn: Optional[Callable] = None,
    aabb: Optional[jnp.ndarray] = None,
    num_steps: Optional[int] = None,
    upsample_steps: Optional[int] = None,
) -> Dict[str, jnp.ndarray]:
    """Uniform + PDF-upsampled volume rendering of a ray batch.

    Args:
      density_fn: [..., 3] → (sigma [...], geo_feat [..., G]).
      color_fn: (dirs [..., 3], geo_feat) → rgb [..., 3].
      rays_o, rays_d: [N, 3] (dirs unit-norm).
      rng: PRNG key for stratified perturbation / PDF sampling
        (None → deterministic, eval mode).
      bg_color: scalar/[3]/[N, 3] background (default 1 = white), used
        when ``bg_fn`` is None.
      bg_fn: (sph [N, 2], dirs [N, 3]) → [N, 3] learned background
        (bg_radius > 0).

    Returns dict with image [N, 3], depth [N] (normalized to [0, 1]
    within [near, far]), weights_sum [N], plus weights/z_vals/deltas
    for regularisers.
    """
    T = num_steps or cfg.num_steps
    U = cfg.upsample_steps if upsample_steps is None else upsample_steps
    N = rays_o.shape[0]
    if aabb is None:
        aabb = jnp.asarray(cfg.aabb, dtype=jnp.float32)

    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, cfg.min_near)
    # rays that miss (or exit behind the origin) get an empty interval
    valid = fars > nears
    fars = jnp.where(valid, fars, nears)

    z = jnp.linspace(0.0, 1.0, T)
    z_vals = nears[:, None] + (fars - nears)[:, None] * z[None, :]  # [N, T]
    sample_dist = (fars - nears) / T  # [N]

    if perturb and rng is not None:
        rng, k = jax.random.split(rng)
        z_vals = z_vals + (jax.random.uniform(k, z_vals.shape) - 0.5) * sample_dist[:, None]

    def pts(zv):
        p = rays_o[:, None, :] + rays_d[:, None, :] * zv[..., None]
        return jnp.clip(p, aabb[:3], aabb[3:])

    xyzs = pts(z_vals)
    sigmas, geo = density_fn(xyzs)  # [N, T], [N, T, G]

    if U > 0:
        # importance-sample new z from the coarse weight distribution
        deltas = jnp.diff(z_vals, axis=-1)
        deltas = jnp.concatenate([deltas, sample_dist[:, None]], axis=-1)
        coarse = composite(jax.lax.stop_gradient(sigmas), jnp.zeros((N, T, 3)), deltas, cfg.density_scale)
        z_mid = z_vals[..., :-1] + 0.5 * deltas[..., :-1]
        if rng is not None:
            rng, k = jax.random.split(rng)
        else:
            k = None
        new_z = sample_pdf(z_mid, coarse["weights"][:, 1:-1], U, k)
        new_z = jax.lax.stop_gradient(new_z)
        new_xyzs = pts(new_z)
        new_sigmas, new_geo = density_fn(new_xyzs)

        z_vals = jnp.concatenate([z_vals, new_z], axis=-1)
        order = jnp.argsort(z_vals, axis=-1)
        z_vals = jnp.take_along_axis(z_vals, order, axis=-1)
        sigmas = jnp.take_along_axis(
            jnp.concatenate([sigmas, new_sigmas], axis=-1), order, axis=-1
        )
        geo = jnp.take_along_axis(
            jnp.concatenate([geo, new_geo], axis=-2), order[..., None], axis=-2
        )
        xyzs = jnp.take_along_axis(
            jnp.concatenate([xyzs, new_xyzs], axis=-2), order[..., None], axis=-2
        )

    deltas = jnp.diff(z_vals, axis=-1)
    deltas = jnp.concatenate([deltas, sample_dist[:, None]], axis=-1)

    dirs = jnp.broadcast_to(rays_d[:, None, :], xyzs.shape)
    rgbs = color_fn(dirs, geo)  # [N, T(+U), 3]

    out = composite(sigmas, rgbs, deltas, cfg.density_scale)
    weights, weights_sum, image = out["weights"], out["weights_sum"], out["image"]

    # normalized depth, as the reference (renderer.py:230-232)
    span = jnp.maximum(fars - nears, 1e-10)
    ori_z = jnp.clip((z_vals - nears[:, None]) / span[:, None], 0.0, 1.0)
    depth = jnp.sum(weights * ori_z, axis=-1)

    # background
    if bg_fn is not None and cfg.bg_radius > 0:
        sph = sph_from_ray(rays_o, rays_d, cfg.bg_radius)
        bg = bg_fn(sph, rays_d)
    elif bg_color is None:
        bg = jnp.float32(1.0)
    else:
        bg = bg_color
    image = image + (1.0 - weights_sum)[..., None] * bg

    return {
        "image": image,
        "depth": depth,
        "weights_sum": weights_sum,
        "weights": weights,
        "z_vals": z_vals,
        "ts": z_vals,  # uniform key across render paths (distortion loss)
        "deltas": deltas,
    }
