"""IBM tests: discrete delta conditions, coupling behavior, short runs.

Parity gates from /root/reference/src/tests/test_ibm.py:
  * every interpolation row sums to 1 (mass conservation, :67-72)
  * first moment = 0 (momentum conservation, :74-89)
both to 1e-10 on a regular grid.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pynama_tpu.ibm.bodies import BodiesContainer, Circle
from pynama_tpu.ibm.coupling import IBMCoupling
from pynama_tpu.ibm.diracs import KERNELS
from pynama_tpu.mesh.structured import BoxMesh


def make_coupling(nelem=24, ngl=3, half=3.0):
    mesh = BoxMesh(
        nelem=(nelem, nelem), lower=(-half, -half), upper=(half, half), ngl=ngl
    )
    h = 2 * half / nelem / (ngl - 1)
    return mesh, IBMCoupling(mesh, dl=h, kernel="fourGrid"), h


@pytest.mark.parametrize("name", ["fourGrid", "threeGrid", "linear"])
def test_kernel_1d_conditions(name):
    phi = KERNELS[name]
    # shifted samples on the integer grid: sum phi(x - i) == 1, moment == 0
    for shift in (0.0, 0.3, 0.5, 0.77):
        pts = jnp.arange(-4, 5, dtype=jnp.float64) - shift
        w = phi(pts)
        np.testing.assert_allclose(float(w.sum()), 1.0, atol=1e-10)
        if name != "linear":  # linear hat satisfies moment only at nodes
            mom = float((w * pts).sum())
            np.testing.assert_allclose(mom, 0.0, atol=1e-10)


def test_window_rows_sum_to_one_and_moment_zero():
    mesh, cpl, h = make_coupling()
    body = Circle(center=np.zeros(2), radius=0.5).generate(h)
    X = jnp.asarray(body.coords_at(0.0))
    nodes, weights = cpl.windows(X)
    np.testing.assert_allclose(np.asarray(weights.sum(axis=1)), 1.0, atol=1e-10)
    # first moment: sum_e w_le (x_e - X_l) == 0
    coords = jnp.asarray(mesh.coords)[nodes]      # (L, K, 2)
    mom = (weights[:, :, None] * (coords - X[:, None, :])).sum(axis=1)
    np.testing.assert_allclose(np.asarray(mom), 0.0, atol=1e-10)


def test_interp_exact_on_linear_field():
    mesh, cpl, h = make_coupling()
    body = Circle(center=np.zeros(2), radius=0.5).generate(h)
    X = jnp.asarray(body.coords_at(0.0))
    nodes, weights = cpl.windows(X)
    coords = mesh.coords
    u = np.stack([2.0 + 3.0 * coords[:, 0], -1.0 + 0.5 * coords[:, 1]], axis=1)
    vals = cpl.interp(jnp.asarray(u.reshape(-1)), nodes, weights)
    exact = np.stack([2.0 + 3.0 * np.asarray(X)[:, 0],
                      -1.0 + 0.5 * np.asarray(X)[:, 1]], axis=1)
    np.testing.assert_allclose(np.asarray(vals), exact, atol=1e-10)


def test_correction_enforces_body_velocity():
    """After the flux solve, interpolated fluid velocity == body velocity."""
    mesh, cpl, h = make_coupling()
    body = Circle(center=np.zeros(2), radius=0.5).generate(h)
    X = jnp.asarray(body.coords_at(0.0))
    nodes, weights = cpl.windows(X)
    u = jnp.asarray(np.tile([1.0, 0.0], mesh.n_nodes))  # free stream
    Ub = jnp.zeros((body.n_nodes, 2))                   # static body
    u2, q = cpl.solve_correction(u, Ub, nodes, weights, rtol=1e-12, maxiter=2000)
    slip = np.asarray(cpl.interp(u2, nodes, weights))
    assert np.abs(slip).max() < 1e-8, np.abs(slip).max()


def ibm_config(nelem=30, re=20.0):
    return {
        "name": "ibm-test",
        "material-properties": {"rho": 0.5, "mu": 0.01},
        "domain": {
            "ngl": 3,
            "box-mesh": {"nelem": [nelem, nelem], "lower": [-3, -3], "upper": [3, 3]},
        },
        "time-solver": {"start-time": 0, "end-time": 1.0, "max-steps": 100,
                        "dt0": 0.01},
        "boundary-conditions": {"constant": {"re": re, "direction": 0,
                                             "longRef": "1"}},
        "bodies": [
            {"type": "circle", "vel": "static", "radius": 0.5, "center": [0, 0]}
        ],
        "kle-rtol": 1e-10,
    }


def test_static_cylinder_short_run():
    from pynama_tpu.cases.immersed import ImmersedBoundaryProblem

    p = ImmersedBoundaryProblem(ibm_config()).setup()
    vort, t, n = p.run(max_steps=3)
    assert np.isfinite(np.asarray(vort)).all()
    # no-slip enforced on the body at the end of each step
    X = jnp.asarray(p.body.coords_at(t), dtype=p.dtype)
    nodes, weights = p.coupling.windows(X)
    slip = np.asarray(p.coupling.interp(p.vel, nodes, weights))
    assert np.abs(slip).max() < 1e-6, np.abs(slip).max()
    # positive drag on a cylinder in a free stream
    assert p.cd_history and p.cd_history[-1][0] > 0


def test_dynamic_body_moves():
    from pynama_tpu.cases.immersed import ImmersedBoundaryDynamicProblem

    cfg = ibm_config()
    cfg["bodies"][0]["vel"] = "dynamic"
    p = ImmersedBoundaryDynamicProblem(cfg).setup()
    vort, t, n = p.run(max_steps=2)
    assert np.isfinite(np.asarray(vort)).all()
    d0, v0 = p.body.bodies[0].state_at(0.0)
    d1, v1 = p.body.bodies[0].state_at(t)
    assert not np.allclose(d0, d1)  # the body actually moved
    # slip measured against the moving-body velocity
    X = jnp.asarray(p.body.coords_at(t), dtype=p.dtype)
    Ub = np.asarray(p.body.velocity_at(t))
    nodes, weights = p.coupling.windows(X)
    slip = np.asarray(p.coupling.interp(p.vel, nodes, weights)) - Ub
    assert np.abs(slip).max() < 1e-6, np.abs(slip).max()


# ----------------------------------------------------------------------
# IBM on unstructured (gmsh) domains: UnstructuredIBMCoupling
# ----------------------------------------------------------------------
def test_unstructured_coupling_matches_box():
    """UnstructuredIBMCoupling on the SAME uniform geometry expressed as
    an unstructured quad mesh must reproduce the box-mesh coupling:
    interpolated velocities and flux solutions agree at the Lagrange
    points (node orderings differ; Lagrange-point quantities are
    ordering-invariant)."""
    from pynama_tpu.ibm.coupling import UnstructuredIBMCoupling
    from pynama_tpu.mesh.unstructured import UnstructuredQuadMesh
    from tests.test_unstructured import box_corner_mesh

    ngl = 3
    box = BoxMesh(nelem=(16, 16), lower=(-1, -1), upper=(1, 1), ngl=ngl)
    h = 2.0 / 16 / (ngl - 1)
    pts, quads = box_corner_mesh(16, 16)
    um = UnstructuredQuadMesh(pts * 2.0 - 1.0, quads, ngl=ngl)

    body = Circle(center=np.zeros(2), radius=0.45).generate(h)
    X = np.asarray(body.coords_at(0.0))
    cb = IBMCoupling(box, body.dl)
    cu = UnstructuredIBMCoupling(um, body.dl, h_min=h)
    nb, wb = cb.windows(jnp.asarray(X))
    nu_, wu = cu.windows_host(X)
    np.testing.assert_allclose(np.asarray(wu.sum(axis=1)), 1.0, atol=1e-10)

    def field(coords):
        return np.stack([np.sin(coords[:, 0]) * np.cos(coords[:, 1]),
                         coords[:, 0] * coords[:, 1]], axis=1)

    ub = jnp.asarray(field(np.asarray(box.coords)).reshape(-1))
    uu = jnp.asarray(field(np.asarray(um.coords)[:, :2]).reshape(-1))
    np.testing.assert_allclose(np.asarray(cu.interp(uu, nu_, wu)),
                               np.asarray(cb.interp(ub, nb, wb)),
                               atol=1e-10)

    Ub = jnp.zeros((body.n_nodes, 2))
    _, qb = cb.solve_correction(ub, Ub, nb, wb, rtol=1e-12, maxiter=2000)
    _, qu = cu.solve_correction(uu, Ub, nu_, wu, rtol=1e-12, maxiter=2000)
    np.testing.assert_allclose(np.asarray(qu), np.asarray(qb), atol=1e-7)


def test_unstructured_coupling_rejects_nonuniform():
    """The Peskin delta identities need local uniformity; a distorted
    mesh must be rejected with a clear error, not silently mis-coupled."""
    from pynama_tpu.ibm.coupling import UnstructuredIBMCoupling
    from pynama_tpu.mesh.unstructured import UnstructuredQuadMesh
    from tests.test_unstructured import box_corner_mesh

    pts, quads = box_corner_mesh(16, 16, distort=0.25, seed=1)
    um = UnstructuredQuadMesh(pts * 2.0 - 1.0, quads, ngl=3)
    h = 2.0 / 16 / 2
    body = Circle(center=np.zeros(2), radius=0.45).generate(h)
    cu = UnstructuredIBMCoupling(um, body.dl, h_min=h)
    with pytest.raises(ValueError, match="locally uniform"):
        cu.windows_host(np.asarray(body.coords_at(0.0)))


def test_lattice_coupling_matches_box_moving():
    """LatticeIBMCoupling (moving bodies on gmsh) on the SAME uniform
    geometry expressed as an unstructured mesh must reproduce the
    box-mesh on-device window path at EVERY body position: windows are
    computed per-step from a host-built lattice->node table, so nodes,
    weights, interpolants, and flux solves all agree."""
    from pynama_tpu.ibm.coupling import LatticeIBMCoupling
    from pynama_tpu.mesh.unstructured import UnstructuredQuadMesh
    from tests.test_unstructured import box_corner_mesh

    ngl = 3
    box = BoxMesh(nelem=(16, 16), lower=(-1, -1), upper=(1, 1), ngl=ngl)
    h = 2.0 / 16 / (ngl - 1)
    pts, quads = box_corner_mesh(16, 16)
    um = UnstructuredQuadMesh(pts * 2.0 - 1.0, quads, ngl=ngl)

    body = Circle(center=np.zeros(2), radius=0.3).generate(h)
    body.is_moving = True
    ts = np.linspace(0.0, 1.0, 33)
    env = np.concatenate([body.coords_at(float(t)) for t in ts])
    cb = IBMCoupling(box, body.dl)
    cl = LatticeIBMCoupling(um, body.dl, h_min=h,
                            envelope=(env.min(axis=0), env.max(axis=0)))

    # unstructured node ordering differs from the box's: build the
    # permutation so fields and window node-ids can be compared directly
    bc = np.asarray(box.coords)
    uc = np.asarray(um.coords)[:, :2]
    key_b = np.round((bc - bc.min(axis=0)) / h).astype(np.int64)
    key_u = np.round((uc - uc.min(axis=0)) / h).astype(np.int64)
    npx = key_b[:, 0].max() + 1
    order_b = np.argsort(key_b[:, 1] * npx + key_b[:, 0])
    order_u = np.argsort(key_u[:, 1] * npx + key_u[:, 0])
    u_of_b = np.empty(len(bc), dtype=np.int64)   # box node id -> um node id
    u_of_b[order_b] = order_u

    def field(coords):
        return np.stack([np.sin(coords[:, 0]) * np.cos(coords[:, 1]),
                         coords[:, 0] * coords[:, 1]], axis=1)

    ub = jnp.asarray(field(bc).reshape(-1))
    uu = jnp.asarray(field(uc).reshape(-1))
    for t in (0.0, 0.07, 0.31):
        X = jnp.asarray(body.coords_at(t))
        nb, wb = cb.windows(X)
        nl, wl = cl.windows(X)
        np.testing.assert_allclose(np.asarray(wl.sum(axis=1)), 1.0,
                                   atol=1e-10)
        # same physical nodes wherever the weight is nonzero
        live = np.asarray(wb) != 0.0
        np.testing.assert_array_equal(
            u_of_b[np.asarray(nb)][live], np.asarray(nl)[live])
        np.testing.assert_allclose(np.asarray(wl)[live],
                                   np.asarray(wb)[live], atol=1e-12)
        np.testing.assert_allclose(np.asarray(cl.interp(uu, nl, wl)),
                                   np.asarray(cb.interp(ub, nb, wb)),
                                   atol=1e-10)
    Ub = jnp.asarray(body.velocity_at(0.31))
    X = jnp.asarray(body.coords_at(0.31))
    nb, wb = cb.windows(X)
    nl, wl = cl.windows(X)
    _, qb = cb.solve_correction(ub, Ub, nb, wb, rtol=1e-12, maxiter=2000)
    _, ql = cl.solve_correction(uu, Ub, nl, wl, rtol=1e-12, maxiter=2000)
    np.testing.assert_allclose(np.asarray(ql), np.asarray(qb), atol=1e-7)


def test_lattice_coupling_rejects_uncovered_envelope():
    """An envelope reaching past the uniform region must fail at setup
    with a clear error, not silently zero-weight the missing sites."""
    from pynama_tpu.ibm.coupling import LatticeIBMCoupling
    from pynama_tpu.mesh.unstructured import UnstructuredQuadMesh
    from tests.test_unstructured import box_corner_mesh

    pts, quads = box_corner_mesh(16, 16)
    um = UnstructuredQuadMesh(pts * 2.0 - 1.0, quads, ngl=3)
    h = 2.0 / 16 / 2
    body = Circle(center=np.zeros(2), radius=0.3).generate(h)
    with pytest.raises(ValueError, match="lattice sites"):
        LatticeIBMCoupling(um, body.dl, h_min=h,
                           envelope=((-0.4, -0.4), (0.4, 1.2)))


def _write_box_msh(path, n, lo, hi):
    """Uniform n x n quad grid over [lo,hi]^2 as a gmsh v2.2 file."""
    W = n + 1
    lines = ["$MeshFormat", "2.2 0 8", "$EndMeshFormat",
             "$PhysicalNames", "2", '1 10 "walls"', '2 20 "fluid"',
             "$EndPhysicalNames", "$Nodes", str(W * W)]
    xs = np.linspace(lo, hi, W)
    for j in range(W):
        for i in range(W):
            lines.append(f"{j * W + i + 1} {xs[i]:.16g} {xs[j]:.16g} 0")
    lines.append("$EndNodes")
    elems = []
    for j in range(n):
        for i in range(n):
            v0 = j * W + i + 1
            elems.append(f"3 2 20 1 {v0} {v0 + 1} {v0 + 1 + W} {v0 + W}")
    for i in range(n):  # boundary lines (all four sides -> "walls")
        b = i + 1
        t = n * W + i + 1
        elems.append(f"1 2 10 2 {b} {b + 1}")
        elems.append(f"1 2 10 2 {t} {t + 1}")
        l_ = i * W + 1
        r = i * W + W
        elems.append(f"1 2 10 2 {l_} {l_ + W}")
        elems.append(f"1 2 10 2 {r} {r + W}")
    lines += ["$Elements", str(len(elems))]
    lines += [f"{k + 1} {e}" for k, e in enumerate(elems)]
    lines.append("$EndElements")
    path.write_text("\n".join(lines) + "\n")


def test_static_cylinder_on_gmsh_domain(tmp_path):
    """End-to-end ibm-static on a gmsh-file domain (parity:
    immersed_boundary.py:55-58 runs IBM on DMPlex meshes with h-min):
    a short transient run enforces no-slip on the body."""
    from pynama_tpu.cases.immersed import ImmersedBoundaryProblem

    msh = tmp_path / "ibm-box.msh"
    _write_box_msh(msh, 24, -3.0, 3.0)
    cfg = ibm_config()
    cfg["domain"] = {"ngl": 3, "gmsh-file": str(msh), "h-min": "6/24"}
    p = ImmersedBoundaryProblem(cfg).setup()
    vort, t, n = p.run(max_steps=2)
    assert np.isfinite(np.asarray(vort)).all()
    nodes, weights = p.coupling.windows(None)
    slip = np.asarray(p.coupling.interp(p.vel, nodes, weights))
    assert np.abs(slip).max() < 1e-6, np.abs(slip).max()
    assert p.cd_history and p.cd_history[-1][0] > 0


def test_moving_cylinder_on_gmsh_domain(tmp_path):
    """End-to-end ibm-dynamic on a gmsh-file domain: the lattice window
    path recomputes windows from the body position each step on device
    (parity: immersed_boundary.py:335-434's per-step DMPlex rebuild) and
    enforces no-slip at the MOVING body's velocity."""
    from pynama_tpu.cases.immersed import ImmersedBoundaryDynamicProblem
    from pynama_tpu.ibm.coupling import LatticeIBMCoupling

    msh = tmp_path / "ibm-box.msh"
    _write_box_msh(msh, 24, -3.0, 3.0)
    cfg = ibm_config()
    cfg["domain"] = {"ngl": 3, "gmsh-file": str(msh), "h-min": "6/24"}
    cfg["bodies"][0]["vel"] = "dynamic"
    cfg["bodies"][0]["radius"] = 0.3
    p = ImmersedBoundaryDynamicProblem(cfg).setup()
    assert isinstance(p.coupling, LatticeIBMCoupling)
    vort, t, n = p.run(max_steps=2)
    assert np.isfinite(np.asarray(vort)).all()
    d0, _ = p.body.bodies[0].state_at(0.0)
    d1, _ = p.body.bodies[0].state_at(t)
    assert not np.allclose(d0, d1)  # the body actually moved
    X = jnp.asarray(p.body.coords_at(t), dtype=p.dtype)
    Ub = np.asarray(p.body.velocity_at(t))
    nodes, weights = p.coupling.windows(X)
    slip = np.asarray(p.coupling.interp(p.vel, nodes, weights)) - Ub
    assert np.abs(slip).max() < 1e-6, np.abs(slip).max()
