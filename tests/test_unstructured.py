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


# ----------------------------------------------------------------------
# 3D hexahedral meshes
# ----------------------------------------------------------------------
from pynama_tpu.mesh.native import hex_highorder_numbering  # noqa: E402
from pynama_tpu.mesh.unstructured import UnstructuredHexMesh  # noqa: E402


def box_hex_mesh(nx, ny, nz, distort=0.0, seed=0):
    """Corner points + gmsh-ordered hexes of an nx x ny x nz unit box."""
    xs = np.linspace(0, 1, nx + 1)
    ys = np.linspace(0, 1, ny + 1)
    zs = np.linspace(0, 1, nz + 1)
    pts = np.array([[x, y, z] for z in zs for y in ys for x in xs])
    if distort:
        rng = np.random.default_rng(seed)
        interior = np.all((pts > 0) & (pts < 1), axis=1)
        pts[interior] += rng.uniform(-distort, distort, (interior.sum(), 3))
    W, H = nx + 1, (nx + 1) * (ny + 1)
    hexes = []
    for ez in range(nz):
        for ey in range(ny):
            for ex in range(nx):
                v0 = ez * H + ey * W + ex
                hexes.append([v0, v0 + 1, v0 + 1 + W, v0 + W,
                              v0 + H, v0 + 1 + H, v0 + 1 + W + H, v0 + W + H])
    return pts, np.asarray(hexes, dtype=np.int64)


def test_native_matches_python_hex_numbering():
    pts, hexes = box_hex_mesh(3, 2, 4)
    lex = hexes[:, [0, 1, 3, 2, 4, 5, 7, 6]]
    c1, n1, p1, q1 = hex_highorder_numbering(lex, len(pts), 4,
                                             force_python=True)
    if not have_native():
        pytest.skip("native meshcore not built")
    c2, n2, p2, q2 = hex_highorder_numbering(lex, len(pts), 4,
                                             force_python=False)
    assert n1 == n2
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(q1, q2)


@pytest.mark.parametrize("ngl", [2, 3, 4])
def test_hex_matches_structured(ngl):
    pts, hexes = box_hex_mesh(3, 2, 2)
    m = UnstructuredHexMesh(pts, hexes, ngl=ngl)
    b = BoxMesh(nelem=(3, 2, 2), lower=(0, 0, 0), upper=(1, 1, 1), ngl=ngl)
    assert m.n_nodes == b.n_nodes
    assert m.n_cells == b.n_cells
    assert len(m.boundary_nodes) == len(b.boundary_nodes)
    # same GLL point cloud as the structured mesh (set comparison)
    ca = np.sort(np.round(m.coords, 12).view("f8,f8,f8"), axis=0)
    cb = np.sort(np.round(np.asarray(b.coords), 12).view("f8,f8,f8"), axis=0)
    np.testing.assert_array_equal(ca, cb)


def test_hex_cell_geometry_consistency():
    """coords[cell2node] must equal each cell's own trilinear GLL map —
    catches shared-face/edge orientation mistakes on distorted meshes."""
    from pynama_tpu.elements.quadrature import lobatto_points

    ngl = 4
    pts, hexes = box_hex_mesh(3, 3, 2, distort=0.05)
    m = UnstructuredHexMesh(pts, hexes, ngl=ngl)
    gll, _ = lobatto_points(ngl)
    t = (gll + 1) / 2
    N = ngl
    tx = np.tile(t, N * N)
    ty = np.tile(np.repeat(t, N), N)
    tz = np.repeat(t, N * N)
    w = np.empty((8, N**3))
    for k in range(8):
        bx, by, bz = k & 1, (k >> 1) & 1, (k >> 2) & 1
        w[k] = ((tx if bx else 1 - tx) * (ty if by else 1 - ty)
                * (tz if bz else 1 - tz))
    expected = np.einsum("kp,ckd->cpd", w, m.cell_corners)
    np.testing.assert_allclose(m.coords[m.cell2node], expected, atol=1e-13)


def test_hex_patch_test_distorted():
    """Constant velocity is exact on any (trilinear) hex mesh."""
    ngl = 3
    pts, hexes = box_hex_mesh(3, 3, 2, distort=0.04)
    m = UnstructuredHexMesh(pts, hexes, ngl=ngl)
    elem = SpectralElement(ngl, 3)
    sys_ = build_kle_system(m, elem)
    assert not m.uniform and sys_.K.A.ndim == 3
    mask = np.ones(m.n_nodes * 3)
    mask[m.node_dofs(m.boundary_nodes, 3)] = 0.0
    u_bc = np.zeros(m.n_nodes * 3)
    u_bc[0::3] = 1.0
    u_bc[1::3] = -0.5
    res = sys_.solve(jnp.zeros(m.n_nodes * 3), jnp.asarray(u_bc),
                     jnp.asarray(mask), rtol=1e-13, maxiter=20000)
    exact = np.asarray(u_bc)
    err = np.abs(np.asarray(res.x) - exact).max()
    assert err < 1e-9, err


def test_tg3d_converges_on_distorted_hex():
    from pynama_tpu.cases.analytic_fields import (
        taylor_green_vel_3d,
        taylor_green_vort_3d,
    )

    errs = []
    for ngl in (3, 5):
        pts, hexes = box_hex_mesh(2, 2, 2, distort=0.02)
        m = UnstructuredHexMesh(pts, hexes, ngl=ngl)
        elem = SpectralElement(ngl, 3)
        sys_ = build_kle_system(m, elem)
        mask = np.ones(m.n_nodes * 3)
        mask[m.node_dofs(m.boundary_nodes, 3)] = 0.0
        vel_e = np.asarray(taylor_green_vel_3d(jnp.asarray(m.coords), 0.02,
                                               0.0)).reshape(-1)
        vort_e = np.asarray(taylor_green_vort_3d(jnp.asarray(m.coords), 0.02,
                                                 0.0)).reshape(-1)
        res = sys_.solve(jnp.asarray(vort_e), jnp.asarray(vel_e),
                         jnp.asarray(mask), rtol=1e-12, maxiter=30000)
        errs.append(np.linalg.norm(np.asarray(res.x) - vel_e)
                    / np.linalg.norm(vel_e))
    # measured: 1.1e-1 (ngl 3) -> 2.7e-3 (ngl 5) — spectral p-convergence
    assert errs[1] < 0.05 * errs[0], errs


def _write_hex_msh(path, nx, ny, nz, distort=0.0):
    """Gmsh v2.2 hex mesh of the unit box with named boundary quads."""
    pts, hexes = box_hex_mesh(nx, ny, nz, distort=distort)
    W, H = nx + 1, (nx + 1) * (ny + 1)
    walls = []  # (name_tag, quad corners) on x=0 plane as sample surface
    for ez in range(nz):
        for ey in range(ny):
            v0 = ez * H + ey * W
            walls.append([v0, v0 + W, v0 + W + H, v0 + H])
    with open(path, "w") as f:
        f.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n")
        f.write('$PhysicalNames\n2\n2 10 "left"\n3 20 "fluid"\n'
                "$EndPhysicalNames\n")
        f.write(f"$Nodes\n{len(pts)}\n")
        for i, p in enumerate(pts):
            f.write(f"{i+1} {p[0]:.17g} {p[1]:.17g} {p[2]:.17g}\n")
        f.write("$EndNodes\n")
        ne = len(hexes) + len(walls)
        f.write(f"$Elements\n{ne}\n")
        eid = 1
        for h in hexes:
            f.write(f"{eid} 5 2 20 1 " + " ".join(str(v + 1) for v in h)
                    + "\n")
            eid += 1
        for q in walls:
            f.write(f"{eid} 3 2 10 2 " + " ".join(str(v + 1) for v in q)
                    + "\n")
            eid += 1
        f.write("$EndElements\n")


def test_gmsh_hex_case_transient(tmp_path):
    """Full NS transient through the case layer on a distorted Gmsh hex
    mesh — exercises the generic ElementOp path end to end (cf. the
    reference running any Gmsh mesh through DMPlex, dmplex.py:16-23)."""
    from pynama_tpu.cases.analytic import CustomFuncProblem

    msh = tmp_path / "tg3d.msh"
    _write_hex_msh(str(msh), 3, 3, 3, distort=0.03)
    cfg = {
        "name": "tg3d-gmsh",
        "material-properties": {"rho": 1.0, "mu": 0.01},
        "domain": {"ngl": 4, "gmsh-file": str(msh)},
        "time-solver": {"start-time": 0.0, "end-time": 0.02, "max-steps": 20},
        "kle-rtol": 1e-11,
    }
    p = CustomFuncProblem(cfg, case="taylor-green").setup()
    assert p.dim == 3 and not p._blocked
    assert "left" in p.mesh.face_nodes and len(p.mesh.face_nodes["left"])
    w, t, n = p.run()
    vel_e, _ = p.exact_fields(t)
    ev = np.linalg.norm(np.asarray(p.vel) - np.asarray(vel_e).reshape(-1)) \
        / np.linalg.norm(np.asarray(vel_e))
    assert abs(t - 0.02) < 1e-12
    assert ev < 0.05, ev


def test_gmsh_quad_case_transient(tmp_path):
    """2D NS transient on a distorted unstructured quad mesh through the
    case layer (generic assembly path, not the structured fast lane)."""
    from pynama_tpu.cases.analytic import CustomFuncProblem

    pts, quads = box_corner_mesh(4, 4, distort=0.03)
    msh = tmp_path / "tg2d.msh"
    with open(msh, "w") as f:
        f.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n")
        f.write(f"$Nodes\n{len(pts)}\n")
        for i, p in enumerate(pts):
            f.write(f"{i+1} {p[0]:.17g} {p[1]:.17g} 0\n")
        f.write("$EndNodes\n")
        f.write(f"$Elements\n{len(quads)}\n")
        for i, q in enumerate(quads):
            f.write(f"{i+1} 3 2 1 1 " + " ".join(str(v + 1) for v in q)
                    + "\n")
        f.write("$EndElements\n")
    cfg = {
        "name": "tg2d-gmsh",
        "material-properties": {"rho": 1.0, "mu": 0.01},
        "domain": {"ngl": 4, "gmsh-file": str(msh)},
        "time-solver": {"start-time": 0.0, "end-time": 0.05, "max-steps": 30},
        "kle-rtol": 1e-11,
    }
    p = CustomFuncProblem(cfg, case="taylor-green").setup()
    assert p.dim == 2 and not p._blocked
    w, t, n = p.run()
    vel_e, _ = p.exact_fields(t)
    ev = np.linalg.norm(np.asarray(p.vel) - np.asarray(vel_e).reshape(-1)) \
        / np.linalg.norm(np.asarray(vel_e))
    assert abs(t - 0.05) < 1e-12
    assert ev < 0.02, ev


def _write_msh22_quads(path, pts, quads, blines=None, phys=None):
    """Minimal ASCII v2.2 writer: quads (+ optional named boundary lines)."""
    with open(path, "w") as f:
        f.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n")
        if phys:
            f.write("$PhysicalNames\n%d\n" % len(phys))
            for tag, (dim, name) in phys.items():
                f.write('%d %d "%s"\n' % (dim, tag, name))
            f.write("$EndPhysicalNames\n")
        f.write("$Nodes\n%d\n" % len(pts))
        for i, p in enumerate(pts):
            f.write("%d %.16g %.16g 0\n" % (i + 1, p[0], p[1]))
        f.write("$EndNodes\n")
        elems = []
        for q in quads:
            elems.append((3, 0, [v + 1 for v in q]))
        for tag, pairs in (blines or {}).items():
            for a, b in pairs:
                elems.append((1, tag, [a + 1, b + 1]))
        f.write("$Elements\n%d\n" % len(elems))
        for i, (et, tag, nodes) in enumerate(elems):
            f.write("%d %d 2 %d 0 %s\n"
                    % (i + 1, et, tag, " ".join(map(str, nodes))))
        f.write("$EndElements\n")


def test_geometric_wall_fallback_unnamed_box(tmp_path):
    """A gmsh box mesh with NO named boundaries still exposes the
    standard wall groups (geometric fallback; reference labels borders
    from mesh metadata, dmplex.py:113-131)."""
    pts, quads = box_corner_mesh(3, 2)
    path = str(tmp_path / "box.msh")
    _write_msh22_quads(path, pts, quads)
    m = UnstructuredQuadMesh.from_gmsh(path, ngl=3)
    b = BoxMesh(nelem=(3, 2), lower=(0, 0), upper=(1, 1), ngl=3)
    for wall in ("left", "right", "down", "up"):
        assert wall in m.face_nodes, m.face_nodes.keys()
        assert len(m.face_nodes[wall]) == len(b.face_nodes[wall])
        # same geometric node set (compare coordinates)
        got = np.sort(m.coords[m.face_nodes[wall]], axis=0)
        want = np.sort(b.coords[b.face_nodes[wall]], axis=0)
        np.testing.assert_allclose(got, want, atol=1e-12)


def test_physical_names_win_over_geometry(tmp_path):
    """Physical wall names disable the geometric fallback entirely."""
    pts, quads = box_corner_mesh(2, 2)
    # name ONLY the y=1 wall 'up' (physical tag 7)
    top = [(i, i + 1) for i in range(6, 8)]
    path = str(tmp_path / "named.msh")
    _write_msh22_quads(path, pts, quads, blines={7: top},
                       phys={7: (1, "up")})
    m = UnstructuredQuadMesh.from_gmsh(path, ngl=3)
    assert "up" in m.face_nodes
    assert "left" not in m.face_nodes  # no fallback once 'up' is named


def test_cavity_on_gmsh_box_mesh(tmp_path):
    """Named-wall cavity runs on an unnamed gmsh box mesh end-to-end."""
    from pynama_tpu.cases.cavity import CavityProblem

    pts, quads = box_corner_mesh(5, 5)
    path = str(tmp_path / "cavity.msh")
    _write_msh22_quads(path, pts, quads)
    cfg = {
        "name": "gmsh-cavity",
        "material-properties": {"rho": 1.0, "mu": 0.1},
        "domain": {"ngl": 3, "gmsh-file": path},
        "boundary-conditions": {"no-slip": {"up": [1.0, 0.0]}},
        "time-solver": {"start-time": 0, "end-time": 0.2, "max-steps": 3},
        "kle-rtol": 1e-10,
    }
    p = CavityProblem(cfg).setup()
    vort, t, n = p.run()
    assert n >= 1 and np.isfinite(np.asarray(p.vel)).all()
    # the lid drags fluid: nonzero interior velocity
    assert float(np.abs(np.asarray(p.vel)).max()) > 1e-3


def test_schwarz_preconditioner_unstructured():
    """Two-level vertex-star Schwarz on gather/scatter meshes.

    The reference's LU solves any mesh equally (ksp_solver.py:12-19);
    parity means not degrading on gmsh input. Gates: >=3x fewer CG
    iterations than Jacobi at both sizes, and slower iteration growth
    under mesh refinement. Records the measurement in
    run-artifacts/unstructured_pc.json (VERDICT r4 item 7).
    """
    import json
    import time

    from tests.test_kle_solve import taylor_green_2d
    from pynama_tpu.solvers.schwarz import build_element_schwarz

    record = {}
    iters = {}
    for n in (16, 32):
        pts, quads = box_corner_mesh(n, n, distort=0.15 / n, seed=1)
        m = UnstructuredQuadMesh(pts, quads, ngl=3)
        sys_ = build_kle_system(m, SpectralElement(3, 2))
        mask = np.ones(m.n_nodes * 2)
        mask[m.node_dofs(m.boundary_nodes, 2)] = 0.0
        vel_e, vort_e = taylor_green_2d(m.coords, nu=0.02, t=0.0)
        t0 = time.perf_counter()
        minv = build_element_schwarz(m, sys_.K.A, mask)
        setup_s = time.perf_counter() - t0
        for tag, pc in (("jacobi", None), ("schwarz", minv)):
            res = sys_.solve(
                jnp.asarray(vort_e), jnp.asarray(vel_e.reshape(-1)),
                jnp.asarray(mask), rtol=1e-10, maxiter=20000,
                m_inv=pc, restarts=1)
            err = float(np.linalg.norm(np.asarray(res.x)
                                       - vel_e.reshape(-1)))
            iters[(tag, n)] = int(res.iters)
            record[f"{tag}_n{n}"] = {"iters": int(res.iters), "err": err}
        record[f"schwarz_n{n}"]["setup_s"] = round(setup_s, 2)
        # same solution quality
        assert abs(record[f"jacobi_n{n}"]["err"]
                   - record[f"schwarz_n{n}"]["err"]) < 1e-6
    for n in (16, 32):
        assert iters[("schwarz", n)] * 3 <= iters[("jacobi", n)], iters
    growth_j = iters[("jacobi", 32)] / iters[("jacobi", 16)]
    growth_s = iters[("schwarz", 32)] / iters[("schwarz", 16)]
    assert growth_s < growth_j, (growth_s, growth_j)
    path = os.path.join(os.path.dirname(__file__), "..",
                        "run-artifacts", "unstructured_pc.json")
    data = {}
    if os.path.exists(path):
        data = json.load(open(path))
    data["taylor_green_ngl3_rtol1e-10"] = record
    json.dump(data, open(path, "w"), indent=1, sort_keys=True)
