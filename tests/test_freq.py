"""Frequency (positional) encoding: the double-angle recursion must
match the direct [x, sin(2^i x), cos(2^i x)] formula
(freqencoder/src/freqencoder.cu:30-60) to fp32 accuracy, including
gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu.ops.freq import freq_encode, freq_encode_dim


def direct(x, degree):
    outs = [x]
    for i in range(degree):
        xi = x * (2.0**i)
        outs.append(jnp.sin(xi))
        outs.append(jnp.cos(xi))
    return jnp.concatenate(outs, axis=-1)


@pytest.mark.parametrize("degree", [0, 1, 4, 6, 8])
def test_parity_vs_direct(degree):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, size=(257, 3)).astype(np.float32))
    out = freq_encode(x, degree)
    ref = direct(x, degree)
    assert out.shape == (257, freq_encode_dim(3, degree))
    # double-angle drift doubles per octave: <= ~2^(degree-1) ULP
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-5 * max(1, 2 ** (degree - 1))
    )


def test_gradients_match_direct():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, size=(64, 3)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(64, freq_encode_dim(3, 6))).astype(np.float32))
    ga = jax.grad(lambda v: jnp.sum(freq_encode(v, 6) * g))(x)
    gb = jax.grad(lambda v: jnp.sum(direct(v, 6) * g))(x)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-2, rtol=1e-3)
