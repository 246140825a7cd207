"""Converter script tests: synthesize tiny COLMAP / LLFF inputs, run
the converters, and load the result through NeRFDataset."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_image(path, H=8, W=8):
    import cv2

    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, np.zeros((H, W, 3), np.uint8))


def test_colmap2nerf_text_model(tmp_path):
    scene = tmp_path / "scene"
    model = scene / "colmap_sparse" / "0"
    model.mkdir(parents=True)
    (model / "cameras.txt").write_text(
        "# comment\n1 PINHOLE 8 8 10.0 10.0 4.0 4.0\n"
    )
    lines = []
    for i in range(3):
        # identity-ish quaternions, varied translations; dummy 2D-points line
        lines.append(f"{i+1} 1 0 0 0 {0.1*i} 0 -4 1 img_{i}.png")
        lines.append("0 0 -1")
    (model / "images.txt").write_text("\n".join(lines) + "\n")
    for i in range(3):
        _write_image(str(scene / "images" / f"img_{i}.png"))

    out = scene / "transforms.json"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "colmap2nerf.py"),
         "--colmap_model", str(model), "--out", str(out), "--images", "images"],
        capture_output=True, text=True, cwd=str(scene),
    )
    assert r.returncode == 0, r.stderr
    meta = json.loads(out.read_text())
    assert len(meta["frames"]) == 3
    assert "camera_angle_x" in meta and meta["w"] == 8

    from ngp_tpu.data.nerf_dataset import NeRFDataset

    ds = NeRFDataset(str(scene), split="train", scale=0.33)
    assert len(ds) == 2  # colmap mode: frame 0 is the val split
    assert ds.images.shape[1:] == (8, 8, 3)


def test_llff2nerf(tmp_path):
    scene = tmp_path / "llff"
    (scene / "images").mkdir(parents=True)
    n = 4
    poses = np.zeros((n, 3, 5), np.float32)
    for i in range(n):
        poses[i, :, :4] = np.eye(3, 4)
        poses[i, :, 4] = [8, 8, 10.0]  # h, w, focal
    pb = np.concatenate([poses.reshape(n, 15), np.tile([[2.0, 6.0]], (n, 1))], axis=1)
    np.save(scene / "poses_bounds.npy", pb)
    for i in range(n):
        _write_image(str(scene / "images" / f"{i:03d}.png"))

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "llff2nerf.py"), str(scene)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    meta = json.loads((scene / "transforms.json").read_text())
    assert len(meta["frames"]) == n
    assert abs(meta["fl_x"] - 10.0) < 1e-6


def test_hard_synthetic_variant(tmp_path):
    """The hard procedural scene generates a loadable blender dataset
    with thin structures present in the rendered frames."""
    import numpy as np

    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.data.synthetic import make_synthetic_dataset

    root = str(tmp_path / "hard")
    make_synthetic_dataset(
        root, n_train=2, n_val=1, n_test=1, H=48, W=48, num_steps=128,
        variant="hard",
    )
    ds = NeRFDataset(root, split="train", scale=0.8)
    assert len(ds) == 2 and ds.images.shape == (2, 48, 48, 4)
    # the scene is mostly empty but not trivial: some opacity, varied color
    alpha = ds.images[..., 3]
    assert 0.02 < alpha.mean() < 0.9
    rgb = ds.images[..., :3][alpha > 0.5]
    assert rgb.std() > 0.1  # textured emission, not flat colors
