"""Regularized discrete delta (dirac) kernels, jnp-vectorized.

Parity: /root/reference/src/domain/immersed_body.py:398-421
(threeGrid / linear / fourGrid). r is |distance|/h; kernels satisfy the
discrete mass (sum = 1) and first-moment (sum r = 0) conditions on a
uniform grid — gated in tests to 1e-10 like the reference
(test_ibm.py:67-89).
"""

import jax.numpy as jnp


def four_grid(r):
    """Peskin 4-point kernel; support |r| < 2."""
    r = jnp.abs(r)
    inner = (3.0 - 2.0 * r + jnp.sqrt(jnp.maximum(1.0 + 4.0 * r - 4.0 * r * r, 0.0))) / 8.0
    outer = (5.0 - 2.0 * r - jnp.sqrt(jnp.maximum(-7.0 + 12.0 * r - 4.0 * r * r, 0.0))) / 8.0
    return jnp.where(r <= 1.0, inner, jnp.where(r <= 2.0, outer, 0.0))


def three_grid(r):
    """3-point kernel; support |r| < 1.5."""
    r = jnp.abs(r)
    inner = (1.0 + jnp.sqrt(jnp.maximum(-3.0 * r * r + 1.0, 0.0))) / 3.0
    outer = (5.0 - 3.0 * r - jnp.sqrt(jnp.maximum(-3.0 * (1.0 - r) ** 2 + 1.0, 0.0))) / 6.0
    return jnp.where(r <= 0.5, inner, jnp.where(r <= 1.5, outer, 0.0))


def linear(r):
    """Hat kernel; support |r| < 1."""
    r = jnp.abs(r)
    return jnp.where(r < 1.0, 1.0 - r, 0.0)


KERNELS = {"fourGrid": four_grid, "threeGrid": three_grid, "linear": linear}
# support radius in grid cells (window half-width)
SUPPORT = {"fourGrid": 2.0, "threeGrid": 1.5, "linear": 1.0}
