"""Elemental matrix sanity + exactness checks.

The reference validates its element against a legacy oracle
(/root/reference/src/tests/test_element.py); we validate against
mathematical identities instead (orderings differ by design).
"""

import numpy as np
import pytest

from pynama_tpu.elements.spectral import SpectralElement, geometry


def square_corners(dim, h=1.0):
    if dim == 2:
        return np.array([[0, 0], [h, 0], [0, h], [h, h]], dtype=float)
    c = []
    for z in (0, h):
        for y in (0, h):
            for x in (0, h):
                c.append([x, y, z])
    return np.array(c, dtype=float)


@pytest.mark.parametrize("dim,ngl", [(2, 2), (2, 3), (2, 5), (3, 2), (3, 3)])
def test_K_symmetric_and_annihilates_constants(dim, ngl):
    elem = SpectralElement(ngl, dim)
    K, Rw, Rd = elem.kle_matrices(square_corners(dim))
    np.testing.assert_allclose(K, K.T, atol=1e-10)
    const = np.tile(np.arange(1, dim + 1, dtype=float), elem.nnode)
    np.testing.assert_allclose(K @ const, 0.0, atol=1e-9)
    # K is PSD
    eigs = np.linalg.eigvalsh(K)
    assert eigs.min() > -1e-9


@pytest.mark.parametrize("dim,ngl", [(2, 3), (2, 4), (3, 3)])
def test_jacobian_volume(dim, ngl):
    elem = SpectralElement(ngl, dim)
    corners = square_corners(dim, h=0.5)
    _, wdet = geometry(elem.full, corners)
    np.testing.assert_allclose(wdet.sum(), 0.5**dim, atol=1e-12)


@pytest.mark.parametrize("dim,ngl", [(2, 3), (2, 6), (3, 3)])
def test_lumped_weights_sum_to_volume(dim, ngl):
    elem = SpectralElement(ngl, dim)
    _, _, _, wvec = elem.kle_operators(square_corners(dim))
    np.testing.assert_allclose(wvec.sum(), 1.0, atol=1e-12)
    assert (wvec > 0).all()


@pytest.mark.parametrize("dim,ngl", [(2, 3), (2, 5), (3, 3)])
def test_curl_operator_exact_on_linear_field(dim, ngl):
    """Projected curl of u=(y,0,...) is exactly -1 (z-component)."""
    elem = SpectralElement(ngl, dim)
    corners = square_corners(dim)
    SrT, Div, Curl, wvec = elem.kle_operators(corners)
    pts = elem.nodal_points  # reference coords in [-1,1]^dim -> map to [0,1]
    xy = (pts + 1.0) / 2.0
    u = np.zeros((elem.nnode, dim))
    u[:, 0] = xy[:, 1]  # u = (y, 0)
    curl_w = Curl @ u.reshape(-1)
    # un-lump: nodal curl = scattered / weights (single element: just divide)
    w = np.repeat(wvec, elem.dim_w)
    curl_nodal = curl_w / w
    if dim == 2:
        np.testing.assert_allclose(curl_nodal, -1.0, atol=1e-10)
    else:
        c = curl_nodal.reshape(-1, 3)
        np.testing.assert_allclose(c[:, 2], -1.0, atol=1e-10)
        np.testing.assert_allclose(c[:, :2], 0.0, atol=1e-10)


@pytest.mark.parametrize("dim", [2, 3])
def test_strain_rate_exact_on_linear_field(dim):
    """u = (x, -y[, 0]): reference srt comps s0=(u_x - v_y)/2 = 1, s1=0,..."""
    elem = SpectralElement(3, dim)
    corners = square_corners(dim)
    SrT, Div, Curl, wvec = elem.kle_operators(corners)
    pts = (elem.nodal_points + 1.0) / 2.0
    u = np.zeros((elem.nnode, dim))
    u[:, 0] = pts[:, 0]
    u[:, 1] = -pts[:, 1]
    s = (SrT @ u.reshape(-1)) / np.repeat(wvec, elem.dim_s)
    s = s.reshape(-1, elem.dim_s)
    if dim == 2:
        # s0=(u_x - v_y)/2 = 1; s1=(u_y+v_x)/2 = 0; s2=(v_y-u_x)/2 = -1
        np.testing.assert_allclose(s[:, 0], 1.0, atol=1e-10)
        np.testing.assert_allclose(s[:, 1], 0.0, atol=1e-10)
        np.testing.assert_allclose(s[:, 2], -1.0, atol=1e-10)
    else:
        # s0=(u_x-v_y-w_z)/2=1, s2=(v_y-u_x-w_z)/2=-1, s4=(w_z-u_x-v_y)/2=0
        np.testing.assert_allclose(s[:, 0], 1.0, atol=1e-10)
        np.testing.assert_allclose(s[:, 2], -1.0, atol=1e-10)
        np.testing.assert_allclose(s[:, 4], 0.0, atol=1e-10)
