"""Unstructured quad mesh + Gmsh import + native meshcore tests.

Parity targets: DMPlex gmsh path (dmplex.py:22-23) + Section numbering
(indices.py) — here: the native C++ numbering and its Python mirror must
agree; a distorted unstructured mesh must still reproduce constant fields
exactly (patch test) and converge spectrally on Taylor-Green.
"""

import os
import textwrap

import jax.numpy as jnp
import numpy as np
import pytest

from pynama_tpu.elements.spectral import SpectralElement
from pynama_tpu.kle import build_kle_system
from pynama_tpu.mesh.native import have_native, quad_highorder_numbering
from pynama_tpu.mesh.structured import BoxMesh
from pynama_tpu.mesh.unstructured import UnstructuredQuadMesh


def box_corner_mesh(nx, ny, distort=0.0, seed=0):
    """Corner points + ccw quads of an nx x ny unit box."""
    xs = np.linspace(0, 1, nx + 1)
    ys = np.linspace(0, 1, ny + 1)
    X, Y = np.meshgrid(xs, ys, indexing="xy")
    pts = np.stack([X.reshape(-1), Y.reshape(-1)], axis=1)
    if distort:
        rng = np.random.default_rng(seed)
        interior = (
            (pts[:, 0] > 0) & (pts[:, 0] < 1) & (pts[:, 1] > 0) & (pts[:, 1] < 1)
        )
        pts[interior] += rng.uniform(-distort, distort, (interior.sum(), 2))
    quads = []
    W = nx + 1
    for ey in range(ny):
        for ex in range(nx):
            v0 = ey * W + ex
            quads.append([v0, v0 + 1, v0 + 1 + W, v0 + W])  # ccw
    return pts, np.asarray(quads, dtype=np.int64)


def test_native_matches_python_numbering():
    pts, quads = box_corner_mesh(4, 3)
    lex = quads[:, [0, 1, 3, 2]]
    c1, n1, p1 = quad_highorder_numbering(lex, len(pts), 4, force_python=True)
    if not have_native():
        pytest.skip("native meshcore not built")
    c2, n2, p2 = quad_highorder_numbering(lex, len(pts), 4, force_python=False)
    assert n1 == n2
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(p1, p2)


def test_matches_structured_counts():
    pts, quads = box_corner_mesh(3, 2)
    m = UnstructuredQuadMesh(pts, quads, ngl=4)
    b = BoxMesh(nelem=(3, 2), lower=(0, 0), upper=(1, 1), ngl=4)
    assert m.n_nodes == b.n_nodes
    assert m.n_cells == b.n_cells
    assert len(m.boundary_nodes) == len(b.boundary_nodes)
    # shared-edge consistency: each interior edge's nodes appear in 2 cells
    counts = np.zeros(m.n_nodes, dtype=int)
    for cell in m.cell2node:
        counts[cell] += 1
    assert counts.max() <= 4 and counts.min() == 1


def test_uniform_flow_on_distorted_mesh():
    """Patch test: constant velocity is exact on ANY (bilinear) quad mesh."""
    pts, quads = box_corner_mesh(5, 5, distort=0.04)
    m = UnstructuredQuadMesh(pts, quads, ngl=3)
    elem = SpectralElement(3, 2)
    sys_ = build_kle_system(m, elem)
    assert not m.uniform and sys_.K.A.ndim == 3  # batched elemental path

    mask = np.ones(m.n_nodes * 2)
    mask[m.node_dofs(m.boundary_nodes, 2)] = 0.0
    u_bc = np.zeros(m.n_nodes * 2)
    u_bc[0::2] = 1.0
    res = sys_.solve(jnp.zeros(m.n_nodes), jnp.asarray(u_bc),
                     jnp.asarray(mask), rtol=1e-14, maxiter=20000)
    exact = np.zeros(m.n_nodes * 2)
    exact[0::2] = 1.0
    err = np.linalg.norm(np.asarray(res.x) - exact)
    assert err < 1e-11, err


def test_taylor_green_converges_on_distorted_mesh():
    from tests.test_kle_solve import taylor_green_2d

    errs = []
    for ngl in (3, 6):
        pts, quads = box_corner_mesh(3, 3, distort=0.02)
        m = UnstructuredQuadMesh(pts, quads, ngl=ngl)
        elem = SpectralElement(ngl, 2)
        sys_ = build_kle_system(m, elem)
        mask = np.ones(m.n_nodes * 2)
        mask[m.node_dofs(m.boundary_nodes, 2)] = 0.0
        vel_e, vort_e = taylor_green_2d(m.coords, nu=0.02, t=0.0)
        res = sys_.solve(jnp.asarray(vort_e), jnp.asarray(vel_e.reshape(-1)),
                         jnp.asarray(mask), rtol=1e-13, maxiter=30000)
        errs.append(np.linalg.norm(np.asarray(res.x) - vel_e.reshape(-1)))
    assert errs[1] < 1e-2 * errs[0], errs


MSH22 = textwrap.dedent("""\
    $MeshFormat
    2.2 0 8
    $EndMeshFormat
    $PhysicalNames
    2
    1 10 "inlet"
    2 20 "fluid"
    $EndPhysicalNames
    $Nodes
    6
    1 0 0 0
    2 1 0 0
    3 2 0 0
    4 0 1 0
    5 1 1 0
    6 2 1 0
    $EndNodes
    $Elements
    4
    1 3 2 20 1 1 2 5 4
    2 3 2 20 1 2 3 6 5
    3 1 2 10 2 1 4
    4 1 2 10 2 4 5
    $EndElements
    """)


def test_gmsh_v22_parse_and_mesh(tmp_path):
    p = tmp_path / "two-quads.msh"
    p.write_text(MSH22)
    m = UnstructuredQuadMesh.from_gmsh(str(p), ngl=3)
    assert m.n_cells == 2
    # 6 corners + 7 edges * 1 + 2 interiors = 15 nodes
    assert m.n_nodes == 15
    assert "inlet" in m.face_nodes
    # inlet = left edge (1,4) + its GLL node, plus line (4,5)
    inlet = set(m.face_nodes["inlet"].tolist())
    assert {0, 3} <= inlet
    # interior = the shared vertical edge's node + 2 cell centers
    assert len(m.boundary_nodes) == 12
