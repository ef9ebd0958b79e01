"""Structured mesh topology tests.

Mirrors the reference's tiny-box-mesh checks: boundary node counts as
closed-form functions of ngl (/root/reference/src/tests/test_domain.py:
52-78,138-171), corner coordinates, connectivity shapes.
"""

import numpy as np
import pytest

from pynama_tpu.mesh.structured import BoxMesh


@pytest.mark.parametrize("ngl", [2, 3, 5])
def test_counts_2d(ngl):
    m = BoxMesh(nelem=(2, 3), lower=(0, 0), upper=(1, 1.5), ngl=ngl)
    npx, npy = 2 * (ngl - 1) + 1, 3 * (ngl - 1) + 1
    assert m.n_nodes == npx * npy
    assert m.n_cells == 6
    assert m.cell2node.shape == (6, ngl**2)
    assert len(m.face_nodes["down"]) == npx
    assert len(m.face_nodes["left"]) == npy
    assert len(m.boundary_nodes) == 2 * npx + 2 * npy - 4


@pytest.mark.parametrize("ngl", [2, 3])
def test_counts_3d(ngl):
    m = BoxMesh(nelem=(2, 2, 2), lower=(0, 0, 0), upper=(1, 1, 1), ngl=ngl)
    npx = 2 * (ngl - 1) + 1
    assert m.n_nodes == npx**3
    assert m.cell2node.shape == (8, ngl**3)
    assert len(m.face_nodes["back"]) == npx**2
    assert len(m.boundary_nodes) == npx**3 - (npx - 2) ** 3


def test_coords_and_corners_2d():
    m = BoxMesh(nelem=(2, 2), lower=(0, 0), upper=(1, 1), ngl=3)
    # fine grid coords for ngl=3 on 2 elems: [0, .25, .5, .75, 1]
    np.testing.assert_allclose(m.axis_coords[0], [0, 0.25, 0.5, 0.75, 1.0])
    assert m.coords.shape == (25, 2)
    np.testing.assert_allclose(m.coords[0], [0, 0])
    np.testing.assert_allclose(m.coords[-1], [1, 1])
    # cell 3 (upper right) corners lexicographic
    np.testing.assert_allclose(
        m.cell_corners[3],
        [[0.5, 0.5], [1.0, 0.5], [0.5, 1.0], [1.0, 1.0]],
    )


def test_connectivity_shared_nodes():
    m = BoxMesh(nelem=(2, 1), lower=(0, 0), upper=(2, 1), ngl=3)
    c0, c1 = m.cell2node[0], m.cell2node[1]
    # right edge of cell0 == left edge of cell1
    assert set(c0[[2, 5, 8]]) == set(c1[[0, 3, 6]])


def test_face_normal_axes():
    m = BoxMesh(nelem=(2, 2), lower=(0, 0), upper=(1, 1), ngl=3)
    assert m.face_normal_axis["left"] == 0
    assert m.face_normal_axis["up"] == 1
    coords = m.coords
    assert np.all(coords[m.face_nodes["up"], 1] == 1.0)
    assert np.all(coords[m.face_nodes["right"], 0] == 1.0)


def test_nodes_over_line():
    m = BoxMesh(nelem=(2, 2), lower=(0, 0), upper=(1, 1), ngl=3)
    nodes, ys = m.nodes_over_line("x", 0.5)
    assert len(nodes) == 5
    np.testing.assert_allclose(m.coords[nodes, 0], 0.5)
    assert np.all(np.diff(ys) > 0)
