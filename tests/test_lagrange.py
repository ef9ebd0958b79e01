import numpy as np
import pytest

from pynama_tpu.elements.lagrange import lagrange_basis
from pynama_tpu.elements.quadrature import lobatto_points


@pytest.mark.parametrize("n", [2, 3, 5, 8])
def test_cardinal_property(n):
    nodes, _ = lobatto_points(n)
    h, _ = lagrange_basis(nodes, nodes)
    np.testing.assert_allclose(h, np.eye(n), atol=1e-12)


@pytest.mark.parametrize("n", [2, 3, 5, 8])
def test_partition_of_unity(n):
    nodes, _ = lobatto_points(n)
    pts = np.linspace(-1, 1, 17)
    h, dh = lagrange_basis(nodes, pts)
    np.testing.assert_allclose(h.sum(axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose(dh.sum(axis=1), 0.0, atol=1e-11)


def test_derivative_exact_for_polynomials():
    nodes, _ = lobatto_points(5)
    pts = np.linspace(-1, 1, 9)
    h, dh = lagrange_basis(nodes, pts)
    # interpolate f(x) = x^3: derivative must be exact (degree <= 4 basis)
    f = nodes**3
    np.testing.assert_allclose(dh @ f, 3 * pts**2, atol=1e-12)
    np.testing.assert_allclose(h @ f, pts**3, atol=1e-12)
