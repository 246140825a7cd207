"""Fused-MLP Pallas kernel parity vs plain jnp (interpret mode on CPU,
mirroring the reference's torch-reference-vs-CUDA pattern,
testing/test_ffmlp.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from ngp_tpu.ops.pallas.fused_mlp import fused_mlp


def _ref_mlp(x, weights):
    h = x.astype(jnp.float32)
    for i, w in enumerate(weights):
        h = h @ w.astype(jnp.float32)
        if i != len(weights) - 1:
            h = jnp.maximum(h, 0.0)
    return h


def test_fused_mlp_matches_reference():
    rng = np.random.default_rng(0)
    B, dims = 300, [32, 64, 64, 16]  # odd batch, non-128 dims (padding path)
    x = jnp.asarray(rng.normal(size=(B, dims[0])).astype(np.float32))
    ws = [
        jnp.asarray(rng.normal(size=(dims[i], dims[i + 1])).astype(np.float32) * 0.2)
        for i in range(len(dims) - 1)
    ]
    got = fused_mlp(x, ws, tile=128, interpret=True)
    ref = _ref_mlp(x.astype(jnp.bfloat16), [w.astype(jnp.bfloat16) for w in ws])
    assert got.shape == (B, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0.05, atol=0.05)


def test_fused_mlp_shape_validation():
    x = jnp.zeros((8, 32))
    ws = [jnp.zeros((16, 64))]  # wrong in-dim
    try:
        fused_mlp(x, ws, interpret=True)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "weight 0" in str(e)
