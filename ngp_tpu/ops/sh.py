"""Real spherical-harmonics basis evaluation (degrees 1..8).

TPU-native equivalent of the reference's ``shencoder/src/shencoder.cu``
(hard-coded Cartesian polynomials, degree 1-8, output dim = degree^2).
Instead of 64 hand-written polynomials, the basis is generated at trace
time by the Sloan recurrence ("Efficient Spherical Harmonic
Evaluation"): sin/cos(m phi)*sin^m(theta) via the complex-product
recurrence on (x, y), associated Legendre values via the standard
three-term recurrence in z. All coefficients are Python floats folded
into the XLA graph — the runtime cost is pure VPU polynomial math and
autodiff provides the exact Jacobian (the reference writes a manual
``dy_dx`` backward; unnecessary here).

Convention check (matches ``shencoder.cu:50-57``): the reference keeps
the Condon-Shortley phase, i.e. component (l, m) = (-1)^m * (Wikipedia
real SH), ordered l^2 + l + m. Verified against the reference's printed
constants in tests/test_sh.py.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def sh_basis_dim(degree: int) -> int:
    return degree * degree


def sh_encode(dirs: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Evaluate the real SH basis at unit directions.

    Args:
      dirs: [..., 3] unit direction vectors (x, y, z).
      degree: number of SH bands (1..8 supported, like the reference);
        output has degree**2 components.

    Returns:
      [..., degree**2] basis values, same dtype as ``dirs``.
    """
    if not (1 <= degree <= 8):
        raise ValueError(f"sh_encode degree must be in [1, 8], got {degree}")
    x = dirs[..., 0]
    y = dirs[..., 1]
    z = dirs[..., 2]

    out = [None] * (degree * degree)

    # P~[m][l] : associated Legendre P_l^m(z) with the sin^m(theta)
    # factor and the Condon-Shortley (-1)^m removed (both re-applied
    # explicitly below).
    # A_m = cos(m phi) sin^m(theta), B_m = sin(m phi) sin^m(theta):
    #   A_0 = 1, B_0 = 0, A_m = x A_{m-1} - y B_{m-1}, B_m = x B_{m-1} + y A_{m-1}
    one = jnp.ones_like(x)
    A, B = one, jnp.zeros_like(x)
    for m in range(degree):
        # P~_mm = (2m-1)!!
        p_prev = one * float(_double_factorial(2 * m - 1))  # P~_{m,m}
        p_curr = None  # P~_{m+1,m}
        for l in range(m, degree):
            if l == m:
                p = p_prev
            elif l == m + 1:
                p = (2 * m + 1) * z * p_prev
                p_curr = p
            else:
                p = ((2 * l - 1) * z * p_curr - (l + m - 1) * p_prev) / (l - m)
                p_prev, p_curr = p_curr, p
            # normalization
            k = math.sqrt(
                (2 * l + 1)
                / (4.0 * math.pi)
                * math.factorial(l - m)
                / math.factorial(l + m)
            )
            if m == 0:
                out[l * l + l] = k * p
            else:
                c = ((-1.0) ** m) * math.sqrt(2.0) * k
                out[l * l + l + m] = (c * p) * A
                out[l * l + l - m] = (c * p) * B
        # advance sin/cos recurrence for next m
        A, B = x * A - y * B, x * B + y * A

    return jnp.stack(out, axis=-1).astype(dirs.dtype)


def _double_factorial(n: int) -> int:
    if n <= 0:
        return 1
    result = 1
    while n > 1:
        result *= n
        n -= 2
    return result
