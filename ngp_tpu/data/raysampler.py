"""Ray generation with pixel-sampling strategies — jit-traceable.

TPU-native equivalent of the reference's ``get_rays``
(nerf/utils.py:53-137). The reference samples pixels on the GPU inside
the DataLoader collate; here the sampler is a pure jnp function called
INSIDE the jitted train step, so the whole data path (index sampling,
error-map multinomial, pixel gather, unprojection) stays on device with
zero host synchronisation.

Sampling modes (same three as the reference):
- uniform random pixels (with replacement, ``randint``)
- error-map weighted: multinomial WITHOUT replacement over a fixed
  128x128 coarse error grid, upscaled with jitter (utils.py:102-114) —
  implemented as Gumbel top-k (the standard XLA-friendly equivalent of
  ``torch.multinomial(replacement=False)``)
- patch-aligned: random top-left corners + dense patch offsets
  (utils.py:79-97)
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

ERROR_MAP_SIZE = 128  # default coarse resolution, as the reference


def sample_ray_indices(
    rng: jax.Array,
    H: int,
    W: int,
    n_rays: int,
    error_map: Optional[jnp.ndarray] = None,
    patch_size: int = 1,
    uniform_frac: float = 0.0,
) -> Dict[str, jnp.ndarray]:
    """Choose ``n_rays`` flat pixel indices in [0, H*W).

    Returns {"inds": [N]} plus {"inds_coarse": [N]} in error-map mode.

    ``uniform_frac`` (error-map mode only): fraction of the batch drawn
    uniformly instead of error-weighted. TPU-specific guard with no
    reference counterpart: the CUDA marcher allocates samples per ray
    DYNAMICALLY (atomics), so a fully error-concentrated batch just
    uses more memory — the TPU march has a static global sample budget
    (cfg.compact_mean_samples), and an all-object batch overflows it,
    truncated rays composite to background, their error stays maximal,
    and the sampler death-spirals onto them (measured: loss floors at
    0.10 and PSNR at ~18 on the hard scene). The uniform share keeps
    cheap background rays in every batch (bounding the batch's mean
    sample need) and keeps exploring cells whose stale error says
    "done". Uniform rays also report their coarse cell so the error
    map stays fresh everywhere.

    The coarse resolution is inferred from ``error_map``'s size (the
    reference hard-codes 128, utils.py:107-111). Without-replacement
    draws degenerate to stratified-uniform once the weighted draw count
    approaches the cell count (at num_rays=16384 a 128^2 map is inert —
    measured +-0.05 dB), so flagship-batch runs should allocate a 256^2
    map (TrainConfig.error_map_size) to restore the reference's
    draws-per-cell ratio.
    """
    out = {}
    if patch_size > 1:
        num_patch = n_rays // (patch_size**2)
        kx, ky = jax.random.split(rng)
        x0 = jax.random.randint(kx, (num_patch,), 0, H - patch_size)
        y0 = jax.random.randint(ky, (num_patch,), 0, W - patch_size)
        pi, pj = jnp.meshgrid(
            jnp.arange(patch_size), jnp.arange(patch_size), indexing="ij"
        )
        offs = jnp.stack([pi.reshape(-1), pj.reshape(-1)], axis=-1)  # [p^2, 2]
        coords = jnp.stack([x0, y0], axis=-1)[:, None, :] + offs[None, :, :]
        coords = coords.reshape(-1, 2)
        out["inds"] = coords[:, 0] * W + coords[:, 1]
    elif error_map is None:
        out["inds"] = jax.random.randint(rng, (n_rays,), 0, H * W)
    else:
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        n_uni = int(round(n_rays * uniform_frac))
        n_w = n_rays - n_uni
        em_flat = error_map.reshape(-1)
        M = int(round(em_flat.shape[0] ** 0.5))  # coarse map resolution
        # Gumbel top-k == multinomial without replacement
        logits = jnp.log(jnp.maximum(em_flat, 1e-12))
        gumbel = -jnp.log(-jnp.log(jax.random.uniform(k1, logits.shape) + 1e-10) + 1e-10)
        _, inds_coarse = jax.lax.top_k(logits + gumbel, n_w)
        cx = inds_coarse // M
        cy = inds_coarse % M
        sx = H / M
        sy = W / M
        jx = jax.random.uniform(k2, (n_w,))
        jy = jax.random.uniform(k3, (n_w,))
        ix = jnp.clip((cx * sx + jx * sx).astype(jnp.int32), 0, H - 1)
        iy = jnp.clip((cy * sy + jy * sy).astype(jnp.int32), 0, W - 1)
        inds = ix * W + iy
        if n_uni:
            inds_u = jax.random.randint(k4, (n_uni,), 0, H * W)
            # uniform rays' coarse cells: invert the jittered upscale so
            # their error-map entries refresh too
            cu_x = jnp.clip((inds_u // W).astype(jnp.float32) / sx,
                            0, M - 1).astype(jnp.int32)
            cu_y = jnp.clip((inds_u % W).astype(jnp.float32) / sy,
                            0, M - 1).astype(jnp.int32)
            inds = jnp.concatenate([inds, inds_u])
            inds_coarse = jnp.concatenate(
                [inds_coarse, cu_x * M + cu_y]
            )
        out["inds"] = inds
        out["inds_coarse"] = inds_coarse
    return out


def rays_from_indices(
    pose: jnp.ndarray,
    intrinsics: jnp.ndarray,
    H: int,
    W: int,
    inds: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Unproject flat pixel indices into world rays (utils.py:117-133).

    pose: [4, 4] cam2world; intrinsics: [4] (fx, fy, cx, cy);
    inds: [N] flat indices (row-major, x = inds // W is the row).
    """
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    row = (inds // W).astype(jnp.float32) + 0.5
    col = (inds % W).astype(jnp.float32) + 0.5
    # reference convention: i (x) runs over width, j (y) over height
    xs = (col - cx) / fx
    ys = (row - cy) / fy
    dirs = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_d = dirs @ pose[:3, :3].T
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return {"rays_o": rays_o, "rays_d": rays_d}


def rays_from_frame_indices(
    poses: jnp.ndarray,
    intrinsics: jnp.ndarray,
    H: int,
    W: int,
    inds: jnp.ndarray,
    fids: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Multi-frame variant of :func:`rays_from_indices`: each ray
    unprojects through its own frame's pose.

    poses: [F, 4, 4] cam2world; fids: [N] frame index per ray. The
    per-ray pose fetch is a one-hot matmul (F is small; a row gather
    costs ~15 ns/row on TPU while [N, F] @ [F, 16] rides the MXU) —
    this is what lets eval render MANY validation frames in ONE device
    dispatch instead of paying a tunnel round trip per frame.
    """
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    row = (inds // W).astype(jnp.float32) + 0.5
    col = (inds % W).astype(jnp.float32) + 0.5
    xs = (col - cx) / fx
    ys = (row - cy) / fy
    dirs = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    F = poses.shape[0]
    oh = jax.nn.one_hot(fids, F, dtype=jnp.float32)
    prow = oh @ poses[:, :3, :].reshape(F, 12)  # [N, 12] row-major [R|t]
    rot = prow.reshape(-1, 3, 4)[:, :, :3]
    rays_d = jnp.einsum("nij,nj->ni", rot, dirs)
    rays_o = prow.reshape(-1, 3, 4)[:, :, 3]
    return {"rays_o": rays_o, "rays_d": rays_d}


def full_frame_rays(
    pose: jnp.ndarray, intrinsics: jnp.ndarray, H: int, W: int
) -> Dict[str, jnp.ndarray]:
    """All H*W rays of a frame, row-major."""
    inds = jnp.arange(H * W)
    return rays_from_indices(pose, intrinsics, H, W, inds)


def full_frame_rays_np(pose, intrinsics, H: int, W: int):
    """Numpy variant of :func:`full_frame_rays` for HOST-side staging
    code (eager jnp ops pay per-op dispatch/compile latency on the
    remote-TPU tunnel; frame-prep outside jit should stay in numpy)."""
    import numpy as np

    pose = np.asarray(pose, np.float32)
    fx, fy, cx, cy = np.asarray(intrinsics, np.float32)
    inds = np.arange(H * W)
    row = (inds // W).astype(np.float32) + 0.5
    col = (inds % W).astype(np.float32) + 0.5
    xs = (col - cx) / fx
    ys = (row - cy) / fy
    dirs = np.stack([xs, ys, np.ones_like(xs)], axis=-1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_d = dirs @ pose[:3, :3].T
    rays_o = np.broadcast_to(pose[:3, 3], rays_d.shape).copy()
    return {"rays_o": rays_o, "rays_d": rays_d.astype(np.float32)}
