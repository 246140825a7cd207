"""Random-pose guidance (CLIP-mode) training path test: loaders emit
guidance batches for virtual indices and the guidance step updates
params with the stand-in jnp image loss."""

import numpy as np
import jax

from ngp_tpu.config import NetworkConfig, RenderConfig, TrainConfig
from ngp_tpu.data.nerf_dataset import NeRFDataset
from ngp_tpu.data.synthetic import make_synthetic_dataset
from ngp_tpu.models.nerf import NeRFNetwork
from ngp_tpu.training.clip_guidance import GradientImageLoss
from ngp_tpu.training.nerf_grid import GridNeRFTrainer


def test_guidance_batches_and_step(tmp_path):
    root = str(tmp_path / "synth")
    make_synthetic_dataset(root, n_train=4, n_val=1, n_test=1, H=40, W=40, num_steps=96)
    ds = NeRFDataset(root, split="train", scale=0.8)

    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=64,
        max_samples_per_ray=32, grid_size=16, density_thresh=10.0,
    )
    net_cfg = NetworkConfig(num_levels=4, log2_hashmap_size=12, use_bf16=False)
    # rand_pose=2: one virtual (guidance) index per 2 real frames
    train_cfg = TrainConfig(
        iters=100, num_rays=256, workspace=str(tmp_path / "ws"), rand_pose=2,
    )
    model = NeRFNetwork(cfg=net_cfg, render=render_cfg)
    trainer = GridNeRFTrainer(
        model, render_cfg, train_cfg, log_every=10**9, use_tensorboard=False
    )
    trainer.guidance_loss = GradientImageLoss("a colorful object")
    trainer.ensure_initialized()

    batches = list(trainer.make_loader(ds)())
    kinds = ["guidance" in b for b in batches]
    assert sum(kinds) == 2  # 4 frames + 4//2 virtual
    assert len(batches) == 6

    params_before = jax.device_get(
        jax.tree_util.tree_leaves(trainer.state.params)[0]
    ).copy()
    trainer.train_on_dataset(ds, valid_ds=None, max_epochs=1)
    params_after = jax.device_get(jax.tree_util.tree_leaves(trainer.state.params)[0])
    assert trainer.global_step == 6  # all batches consumed (4 mse + 2 guidance)
    assert np.abs(params_before - params_after).max() > 0


# ---- flax CLIP (differentiable guidance) ----------------------------------


def _tiny_clip():
    import jax.numpy as jnp
    from ngp_tpu.models.clip import CLIP, CLIPConfig

    cfg = CLIPConfig.tiny()
    model = CLIP(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
        jnp.zeros((1, 8), jnp.int32),
    )
    return cfg, model, params


def test_clip_towers_shapes_and_grad():
    import jax.numpy as jnp
    from ngp_tpu.models.clip import CLIP

    cfg, model, params = _tiny_clip()
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.random((2, cfg.image_size, cfg.image_size, 3), np.float32))
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 8)).astype(np.int32))
    ie = model.apply(params, px, method=CLIP.encode_image)
    te = model.apply(params, ids, method=CLIP.encode_text)
    assert ie.shape == (2, cfg.embed_dim) and te.shape == (2, cfg.embed_dim)
    # gradients flow back to the PIXELS (what guidance training needs)
    g = jax.grad(
        lambda x: jnp.sum(model.apply(params, x, method=CLIP.encode_image))
    )(px)
    assert float(jnp.abs(g).sum()) > 0


def test_clip_loss_differentiable_in_jit():
    import jax.numpy as jnp
    from ngp_tpu.training.clip_guidance import CLIPLoss

    cfg, model, params = _tiny_clip()
    ids = np.array([[1, 5, 9, 63, 0, 0, 0, 0]], np.int32)  # 63 = EOT (max id)
    loss = CLIPLoss("tiny", clip_cfg=cfg, params=params, token_ids=ids)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((1, 40, 40, 3), np.float32))
    val_and_grad = jax.jit(jax.value_and_grad(lambda x: loss(x)))
    v, g = val_and_grad(img)
    assert np.isfinite(float(v)) and -1.0 <= float(v) <= 1.0
    assert float(jnp.abs(g).sum()) > 0


def test_clip_matches_hf_reference(tmp_path):
    """Parity against a randomly initialized HuggingFace CLIPModel of
    the same tiny architecture — verifies layer mapping exactly
    (offline: no pretrained download needed)."""
    import pytest
    transformers = pytest.importorskip("transformers")
    import torch
    import jax.numpy as jnp
    from ngp_tpu.models.clip import CLIP, load_hf_clip, preprocess

    # eos_token_id must be the vocab's top id: HF pools the text tower
    # at the eos position, our tower at argmax(ids) — identical for a
    # real CLIP vocab (EOT is the highest id), so make the tiny vocab
    # satisfy the same invariant
    tc = transformers.CLIPTextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=16, hidden_act="quick_gelu",
        eos_token_id=63, bos_token_id=62,
    )
    vc = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8,
        hidden_act="quick_gelu",
    )
    hf_cfg = transformers.CLIPConfig.from_text_vision_configs(
        tc, vc, projection_dim=16
    )
    hf = transformers.CLIPModel(hf_cfg).eval()
    path = str(tmp_path / "hf_clip")
    hf.save_pretrained(path)

    cfg, params = load_hf_clip(path)
    model = CLIP(cfg)
    rng = np.random.default_rng(0)
    px = rng.random((2, 32, 32, 3)).astype(np.float32)
    ids = rng.integers(1, 60, (2, 12)).astype(np.int64)
    ids[:, -1] = 63

    with torch.no_grad():
        ref_i = hf.get_image_features(
            pixel_values=torch.tensor(px.transpose(0, 3, 1, 2))
        ).numpy()
        ref_t = hf.get_text_features(input_ids=torch.tensor(ids)).numpy()
    got_i = np.asarray(model.apply(params, jnp.asarray(px), method=CLIP.encode_image))
    got_t = np.asarray(
        model.apply(params, jnp.asarray(ids.astype(np.int32)), method=CLIP.encode_text)
    )
    np.testing.assert_allclose(got_i, ref_i, atol=1e-3)
    np.testing.assert_allclose(got_t, ref_t, atol=1e-3)
