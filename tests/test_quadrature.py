"""Closed-form quadrature checks.

Mirrors the reference's hand-computed point/weight assertions
(/root/reference/src/tests/test_element.py:181-229).
"""

import numpy as np
import pytest

from pynama_tpu.elements.quadrature import gauss_points, lobatto_points


def test_gauss_2():
    x, w = gauss_points(2)
    np.testing.assert_allclose(x, [-1 / np.sqrt(3), 1 / np.sqrt(3)], atol=1e-14)
    np.testing.assert_allclose(w, [1.0, 1.0], atol=1e-14)


def test_gauss_3():
    x, w = gauss_points(3)
    np.testing.assert_allclose(x, [-np.sqrt(3 / 5), 0.0, np.sqrt(3 / 5)], atol=1e-14)
    np.testing.assert_allclose(w, [5 / 9, 8 / 9, 5 / 9], atol=1e-14)


def test_lobatto_3():
    x, w = lobatto_points(3)
    np.testing.assert_allclose(x, [-1.0, 0.0, 1.0], atol=1e-14)
    np.testing.assert_allclose(w, [1 / 3, 4 / 3, 1 / 3], atol=1e-14)


def test_lobatto_4():
    x, w = lobatto_points(4)
    np.testing.assert_allclose(
        x, [-1.0, -1 / np.sqrt(5), 1 / np.sqrt(5), 1.0], atol=1e-14
    )
    np.testing.assert_allclose(w, [1 / 6, 5 / 6, 5 / 6, 1 / 6], atol=1e-14)


@pytest.mark.parametrize("n", range(2, 15))
def test_exactness(n):
    # Gauss(n) integrates x^(2n-1) exactly; GLL(n) integrates x^(2n-3).
    xg, wg = gauss_points(n)
    for deg in range(2 * n):
        exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
        np.testing.assert_allclose(np.sum(wg * xg**deg), exact, atol=1e-12)
    xl, wl = lobatto_points(n)
    for deg in range(2 * n - 2):
        exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
        np.testing.assert_allclose(np.sum(wl * xl**deg), exact, atol=1e-12)
