"""Viewer tests: orbit camera math and the interactive session's
adaptive train/render loop (headless, CPU)."""

import numpy as np

from ngp_tpu.viewer import InteractiveSession, OrbitCamera


def test_orbit_camera_pose_orthonormal():
    cam = OrbitCamera(64, 64, r=2.0, fovy=50)
    p0 = cam.pose
    # camera starts at distance r looking at the center
    np.testing.assert_allclose(np.linalg.norm(p0[:3, 3]), 2.0, rtol=1e-5)
    cam.orbit(40, -25)
    cam.scale(1)
    cam.pan(5, -3)
    p = cam.pose
    R = p[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    # radius shrank by one zoom step
    np.testing.assert_allclose(
        np.linalg.norm(p[:3, 3] - cam.center), 2.0 / 1.1, rtol=1e-5
    )
    intr = cam.intrinsics
    assert intr.shape == (4,) and intr[0] > 0


def test_interactive_session_train_render(tmp_path):
    from ngp_tpu.config import NetworkConfig, RenderConfig, TrainConfig
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.data.synthetic import make_synthetic_dataset
    from ngp_tpu.models.nerf import NeRFNetwork
    from ngp_tpu.training.nerf_grid import GridNeRFTrainer

    root = str(tmp_path / "synth")
    make_synthetic_dataset(root, n_train=3, n_val=1, n_test=1, H=40, W=40, num_steps=128)
    ds = NeRFDataset(root, split="train", scale=0.8)
    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=64,
        max_samples_per_ray=32, grid_size=16, density_thresh=10.0,
    )
    net_cfg = NetworkConfig(num_levels=4, log2_hashmap_size=12, use_bf16=False)
    train_cfg = TrainConfig(iters=100, num_rays=256, workspace=str(tmp_path / "ws"))
    model = NeRFNetwork(cfg=net_cfg, render=render_cfg)
    trainer = GridNeRFTrainer(model, render_cfg, train_cfg, log_every=10**9, use_tensorboard=False)

    sess = InteractiveSession(trainer, ds, train_budget_ms=200, render_budget_ms=100)
    m = sess.train_steps()
    assert "loss" in m and np.isfinite(m["loss"])
    step0 = trainer.global_step
    assert step0 > 0

    cam = OrbitCamera(32, 32, r=2.0)
    img1 = sess.render_view(cam)
    assert img1.shape == (32, 32, 3)
    assert sess.spp == 1
    img2 = sess.render_view(cam)  # same pose -> accumulates
    assert sess.spp == 2
    cam.orbit(30, 0)
    sess.render_view(cam)  # new pose -> reset
    assert sess.spp == 1


def test_trainer_test_video_export(tmp_path):
    """trainer.test(): renders a split and writes a video (MJPG AVI
    fallback when no ffmpeg backend) or PNG frames."""
    import os

    from ngp_tpu.config import NetworkConfig, RenderConfig, TrainConfig
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.data.synthetic import make_synthetic_dataset
    from ngp_tpu.models.nerf import NeRFNetwork
    from ngp_tpu.training.nerf_grid import GridNeRFTrainer

    root = str(tmp_path / "synth")
    make_synthetic_dataset(root, n_train=2, n_val=1, n_test=2, H=32, W=32, num_steps=64)
    ds = NeRFDataset(root, split="test", scale=0.8)
    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=32,
        max_samples_per_ray=16, grid_size=16, density_thresh=10.0,
    )
    net_cfg = NetworkConfig(num_levels=2, log2_hashmap_size=10, use_bf16=False)
    train_cfg = TrainConfig(iters=10, num_rays=128, workspace=str(tmp_path / "ws"))
    trainer = GridNeRFTrainer(
        NeRFNetwork(cfg=net_cfg, render=render_cfg), render_cfg, train_cfg,
        log_every=10**9, use_tensorboard=False,
    )
    trainer.ensure_initialized()
    out_dir = trainer.test(ds, write_video=True)
    pngs = [f for f in os.listdir(out_dir) if f.endswith(".png")]
    assert len(pngs) == 2
    videos = [f for f in os.listdir(out_dir) if f.endswith((".mp4", ".avi"))]
    assert videos, "expected an mp4 or the MJPG AVI fallback"


def test_widget_surface_aabb_and_requests(tmp_path):
    """GUI widget parity (nerf/gui.py:302-338): live aabb_infer crop
    changes the render (cropped region -> background), and queued
    button requests execute on the main loop."""
    from ngp_tpu.config import NetworkConfig, RenderConfig, TrainConfig
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.data.synthetic import make_synthetic_dataset
    from ngp_tpu.models.nerf import NeRFNetwork
    from ngp_tpu.training.nerf_grid import GridNeRFTrainer

    root = str(tmp_path / "synth")
    make_synthetic_dataset(root, n_train=3, n_val=1, n_test=1, H=32, W=32, num_steps=96)
    ds = NeRFDataset(root, split="train", scale=0.8)
    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=64,
        max_samples_per_ray=16, grid_size=16, density_thresh=10.0,
    )
    net_cfg = NetworkConfig(num_levels=4, log2_hashmap_size=12, use_bf16=False)
    train_cfg = TrainConfig(iters=40, num_rays=256, workspace=str(tmp_path / "ws"))
    model = NeRFNetwork(cfg=net_cfg, render=render_cfg)
    trainer = GridNeRFTrainer(model, render_cfg, train_cfg, log_every=10**9, use_tensorboard=False)
    sess = InteractiveSession(trainer, ds, train_budget_ms=100, render_budget_ms=100)
    for _ in range(3):
        sess.train_steps()

    pose = ds.poses[0]
    full, _ = trainer.render_frame(pose, ds.intrinsics, 32, 32)
    # crop everything away: whole frame becomes background (1.0)
    sess.set_aabb_axis(0, 0.99)  # xmin -> just under xmax
    assert trainer.aabb_infer is not None
    assert trainer.aabb_infer[0] < trainer.aabb_infer[3]
    sess.set_aabb_axis(3, -0.99)  # xmax clamped above xmin: box stays valid
    assert trainer.aabb_infer[0] < trainer.aabb_infer[3]
    cropped, _ = trainer.render_frame(pose, ds.intrinsics, 32, 32)
    assert np.abs(cropped - 1.0).mean() < np.abs(full - 1.0).mean()
    # restore: full crop renders like no crop
    trainer.aabb_infer = None
    again, _ = trainer.render_frame(pose, ds.intrinsics, 32, 32)
    np.testing.assert_allclose(again, full, atol=1e-6)

    # queued button requests run in service_requests (main thread)
    sess.request("save_ckpt")
    sess.request("reset")
    sess.request("max_samples", 8)
    sess.request("mean_samples", 6)
    sess.service_requests()
    assert trainer.eval_max_samples == 8
    assert trainer.eval_mean_samples == 6
    sess.request("mean_samples", 0)  # 0 = no budget (full render)
    sess.service_requests()
    assert trainer.eval_mean_samples is None
    import os

    ckpts = os.listdir(os.path.join(str(tmp_path / "ws"), "checkpoints"))
    assert any(f.endswith(".ckpt") for f in ckpts)
    # train toggle flips
    was = sess.training
    sess.request("train")
    sess.service_requests()
    assert sess.training != was


def test_viewer_web_http_endpoints():
    """HTTP smoke: page, frame, stats, and /ctl ops drive the camera
    and session through a real server (stub session, no trainer)."""
    import json
    import threading
    import urllib.request

    from ngp_tpu.viewer import OrbitCamera
    from ngp_tpu.viewer_web import make_server

    class StubSession:
        def __init__(self):
            self.mode = "rgb"
            self.aabb_calls = []
            self.requests = []

        def set_aabb_axis(self, axis, frac):
            self.aabb_calls.append((axis, frac))

        def request(self, op, arg=None):
            self.requests.append((op, arg))

    sess = StubSession()
    cam = OrbitCamera(64, 64, r=2.0)
    state = {"frame": np.zeros((64, 64, 3), np.uint8), "stats": {"step": 7},
             "lock": threading.Lock()}
    server = make_server(sess, cam, state, 64, 64, 0)  # port 0 = ephemeral
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        get = lambda p: urllib.request.urlopen(f"http://127.0.0.1:{port}{p}", timeout=10)
        assert b"ngp_tpu viewer" in get("/").read()
        assert get("/frame").read()[:2] == b"\xff\xd8"  # JPEG magic
        assert json.loads(get("/stats").read())["step"] == 7
        r0 = cam.radius
        get("/ctl?op=scale&dx=1").read()
        assert cam.radius < r0
        get("/ctl?op=fov&dx=80").read()
        assert cam.fovy == 80.0
        get("/ctl?op=aabb&axis=2&dx=-50").read()
        assert sess.aabb_calls == [(2, -0.5)]
        get("/ctl?op=save_ckpt").read()
        get("/ctl?op=max_samples&dx=16").read()
        assert ("save_ckpt", None) in sess.requests
        assert ("max_samples", 16) in sess.requests
        get("/ctl?op=mode").read()
        assert sess.mode == "depth"
        import urllib.error
        try:
            get("/nope")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()
