"""SH encoder tests: convention anchored to the reference's hard-coded
constants (shencoder.cu:50-75) and to scipy's complex spherical
harmonics for every degree up to 8."""

import numpy as np
import jax.numpy as jnp
import pytest

from ngp_tpu.ops import sh_encode


def _unit_dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    return (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)


def test_degree_leq3_matches_reference_constants():
    d = _unit_dirs(64)
    x, y, z = d[:, 0], d[:, 1], d[:, 2]
    out = np.asarray(sh_encode(jnp.asarray(d), degree=3))
    expected = np.stack(
        [
            np.full_like(x, 0.28209479177387814),
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
            1.0925484305920792 * x * y,
            -1.0925484305920792 * y * z,
            0.94617469575755997 * z * z - 0.31539156525251999,
            -1.0925484305920792 * x * z,
            0.54627421529603959 * (x * x - y * y),
        ],
        axis=-1,
    )
    np.testing.assert_allclose(out, expected, atol=1e-5)


@pytest.mark.parametrize("degree", [1, 2, 3, 4, 5, 6, 7, 8])
def test_matches_scipy(degree):
    import scipy.special as sp

    d = _unit_dirs(32, seed=degree)
    x, y, z = d[:, 0], d[:, 1], d[:, 2]
    theta = np.arccos(np.clip(z, -1, 1))  # polar
    phi = np.arctan2(y, x)  # azimuth
    out = np.asarray(sh_encode(jnp.asarray(d), degree=degree))

    def complex_sh(l, m):
        if hasattr(sp, "sph_harm_y"):
            return sp.sph_harm_y(l, m, theta, phi)
        return sp.sph_harm(m, l, phi, theta)

    for l in range(degree):
        for m in range(-l, l + 1):
            ylm = complex_sh(l, abs(m))
            if m == 0:
                expected = ylm.real
            elif m > 0:
                # tcnn convention = (-1)^m * wiki-real = sqrt(2) Re(Y_l^m)
                expected = np.sqrt(2.0) * ylm.real
            else:
                expected = np.sqrt(2.0) * ylm.imag
            np.testing.assert_allclose(
                out[:, l * l + l + m], expected, atol=2e-4,
                err_msg=f"l={l} m={m}",
            )
