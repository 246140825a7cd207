"""Pixel-sampling strategy tests (reference get_rays, nerf/utils.py:53-137).

The error-map path is the subtle one: Gumbel top-k must match
torch.multinomial(replacement=False) in distribution, the jittered
coarse->fine upscale must be unbiased, and the TPU-specific uniform mix
(sample_ray_indices uniform_frac) must keep exploring zero-weight cells
while reporting correct coarse cells for the error-map EMA update.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ngp_tpu.data.raysampler import (
    ERROR_MAP_SIZE,
    rays_from_indices,
    sample_ray_indices,
)


def test_uniform_and_patch_modes():
    H = W = 64
    out = sample_ray_indices(jax.random.PRNGKey(0), H, W, 256)
    inds = np.asarray(out["inds"])
    assert inds.shape == (256,) and inds.min() >= 0 and inds.max() < H * W
    assert "inds_coarse" not in out

    out = sample_ray_indices(jax.random.PRNGKey(1), H, W, 256, patch_size=8)
    inds = np.asarray(out["inds"])
    assert inds.shape == (256,)
    rows, cols = inds // W, inds % W
    # each 64-ray block is one dense 8x8 patch
    for p in range(4):
        r, c = rows[64 * p: 64 * (p + 1)], cols[64 * p: 64 * (p + 1)]
        assert r.max() - r.min() == 7 and c.max() - c.min() == 7
        assert len(set(zip(r.tolist(), c.tolist()))) == 64


def test_error_map_concentrates_on_high_error_cells():
    """With a map that is ~zero except one hot block, weighted samples
    land (almost) exclusively in the hot block's pixels
    (utils.py:102-114 multinomial semantics)."""
    H = W = 256
    M = ERROR_MAP_SIZE
    em = np.full((M * M,), 1e-12, np.float32)
    hot = np.zeros((M, M), bool)
    hot[32:64, 32:64] = True  # 1024 hot cells
    em[hot.reshape(-1)] = 1.0
    out = sample_ray_indices(
        jax.random.PRNGKey(2), H, W, 512, error_map=jnp.asarray(em)
    )
    ic = np.asarray(out["inds_coarse"])
    assert hot.reshape(-1)[ic].mean() > 0.99
    # without replacement: coarse cells are distinct
    assert len(np.unique(ic)) == ic.size
    # fine pixels live inside the hot block's pixel footprint (2x scale)
    inds = np.asarray(out["inds"])
    rows, cols = inds // W, inds % W
    assert rows.min() >= 64 and rows.max() < 128
    assert cols.min() >= 64 and cols.max() < 128


def test_error_map_uniform_mix_explores_zero_cells():
    """uniform_frac=0.5: half the batch ignores the map (explores
    zero-error cells) and reports the TRUE coarse cell of each uniform
    pixel so the EMA update refreshes those entries."""
    H = W = 256
    M = ERROR_MAP_SIZE
    em = np.full((M * M,), 1e-12, np.float32)
    em[: 8 * M] = 1.0  # hot: first 8 coarse rows (1024 cells >= n_w)
    out = sample_ray_indices(
        jax.random.PRNGKey(3), H, W, 1024, error_map=jnp.asarray(em),
        uniform_frac=0.5,
    )
    inds = np.asarray(out["inds"])
    ic = np.asarray(out["inds_coarse"])
    assert inds.shape == (1024,) and ic.shape == (1024,)
    # weighted half: all in the hot rows' pixels (rows 0..15 at 2x scale)
    assert (inds[:512] // W).max() <= 15
    # uniform half: spread over the frame
    u_rows = inds[512:] // W
    assert u_rows.max() > H // 2 and len(np.unique(u_rows)) > 50
    # uniform rays' coarse ids match their pixels' coarse cells
    cu_x = np.clip((inds[512:] // W) / (H / M), 0, M - 1).astype(int)
    cu_y = np.clip((inds[512:] % W) / (W / M), 0, M - 1).astype(int)
    np.testing.assert_array_equal(ic[512:], cu_x * M + cu_y)


def test_error_map_jitter_upscale_unbiased():
    """Every fine pixel of a hot coarse cell is reachable and roughly
    uniform (the reference's rand()*sx jitter, utils.py:109-111)."""
    H = W = 512  # 4x4 pixels per coarse cell
    M = ERROR_MAP_SIZE
    em = np.full((M * M,), 1e-12, np.float32)
    cell = 40 * M + 80
    em[cell] = 1.0
    hits = np.zeros((4, 4), int)
    for s in range(256):
        out = sample_ray_indices(
            jax.random.PRNGKey(100 + s), H, W, 4, error_map=jnp.asarray(em)
        )
        inds = np.asarray(out["inds"])
        keep = np.asarray(out["inds_coarse"]) == cell
        rows, cols = inds[keep] // W, inds[keep] % W
        assert np.all(rows // 4 == 40) and np.all(cols // 4 == 80)
        for r, c in zip(rows % 4, cols % 4):
            hits[r, c] += 1
    assert (hits > 0).all(), hits  # all 16 fine pixels reachable


def test_error_map_256_effective_at_flagship_batch():
    """At num_rays=16384 a 128^2 map is inert (the without-replacement
    draw selects EVERY cell), but a 256^2 map keeps real weighting: the
    map resolution is inferred from the array (TrainConfig
    error_map_size), and weighted draws concentrate on hot cells."""
    H = W = 800
    n_rays = 16384
    # 128^2: all cells drawn regardless of weights -> provably inert
    M0 = 128
    em0 = np.full((M0 * M0,), 1e-12, np.float32)
    em0[: M0 * M0 // 4] = 1.0
    out0 = sample_ray_indices(
        jax.random.PRNGKey(7), H, W, n_rays, error_map=jnp.asarray(em0),
        uniform_frac=0.0,
    )
    ic0 = np.asarray(out0["inds_coarse"])
    assert len(np.unique(ic0)) == M0 * M0  # every cell selected

    # 256^2 with the same hot-quadrant weights: weighted draws land in
    # hot cells (modulo Gumbel tail mass on the 1e-12 cells)
    M = 256
    em = np.full((M * M,), 1e-12, np.float32)
    hot = np.zeros((M * M,), bool)
    hot[: M * M // 4] = True
    em[hot] = 1.0
    out = sample_ray_indices(
        jax.random.PRNGKey(8), H, W, n_rays, error_map=jnp.asarray(em),
        uniform_frac=0.0,
    )
    ic = np.asarray(out["inds_coarse"])
    assert hot[ic].mean() > 0.99
    assert len(np.unique(ic)) == ic.size  # still without replacement
    # fine pixels live in the hot rows' footprint (first M/4 coarse rows
    # -> first H/4 pixel rows)
    inds = np.asarray(out["inds"])
    assert (inds // W).max() < H // 4 + 4


def test_rays_unit_norm_and_camera_convention():
    H = W = 32
    pose = np.eye(4, dtype=np.float32)
    intr = jnp.asarray([30.0, 30.0, 16.0, 16.0])
    inds = jnp.asarray([16 * W + 16])  # center pixel
    rays = rays_from_indices(jnp.asarray(pose), intr, H, W, inds)
    rd = np.asarray(rays["rays_d"])[0]
    assert abs(np.linalg.norm(rd) - 1.0) < 1e-5
    assert rd[2] > 0.99  # looks along +z at the principal point
