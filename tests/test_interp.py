"""Parity of bilinear sampling/resizing against torch (the semantics
the TensoRF family depends on)."""

import numpy as np
import jax.numpy as jnp

import torch
import torch.nn.functional as F

from ngp_tpu.ops.interp import resize_bilinear, sample_1d, sample_2d


def test_sample_2d_matches_grid_sample():
    rng = np.random.default_rng(0)
    plane = rng.normal(size=(1, 6, 17, 23)).astype(np.float32)  # [1, R, H, W]
    uv = rng.uniform(-1.3, 1.3, size=(400, 2)).astype(np.float32)  # incl. OOB
    for ac in (True, False):
        ref = F.grid_sample(
            torch.from_numpy(plane),
            torch.from_numpy(uv).view(1, -1, 1, 2),
            align_corners=ac,
            padding_mode="zeros",
            mode="bilinear",
        ).numpy().reshape(6, -1)
        got = np.asarray(sample_2d(jnp.asarray(plane[0]), jnp.asarray(uv), align_corners=ac))
        np.testing.assert_allclose(got, ref, atol=2e-5, err_msg=f"align_corners={ac}")


def test_sample_1d_matches_grid_sample_fake2d():
    rng = np.random.default_rng(1)
    line = rng.normal(size=(1, 5, 13, 1)).astype(np.float32)  # [1, R, D, 1]
    u = rng.uniform(-1.2, 1.2, size=(200,)).astype(np.float32)
    coords = np.stack([np.zeros_like(u), u], axis=-1)  # fake 2d (x=0, y=u)
    ref = F.grid_sample(
        torch.from_numpy(line),
        torch.from_numpy(coords).view(1, -1, 1, 2),
        align_corners=True,
    ).numpy().reshape(5, -1)
    got = np.asarray(sample_1d(jnp.asarray(line[0, :, :, 0]), jnp.asarray(u)))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_resize_matches_interpolate():
    rng = np.random.default_rng(2)
    img = rng.normal(size=(1, 4, 9, 11)).astype(np.float32)
    for ac in (True, False):
        ref = F.interpolate(
            torch.from_numpy(img), size=(21, 17), mode="bilinear", align_corners=ac
        ).numpy()
        got = np.asarray(resize_bilinear(jnp.asarray(img), (21, 17), align_corners=ac))
        np.testing.assert_allclose(got, ref, atol=2e-5, err_msg=f"align_corners={ac}")
