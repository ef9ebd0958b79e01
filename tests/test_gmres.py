import jax.numpy as jnp
import numpy as np

from pynama_tpu.solvers.gmres import gmres_solve


def test_gmres_nonsymmetric():
    rng = np.random.default_rng(3)
    n = 60
    A = np.eye(n) * 4 + rng.normal(size=(n, n)) * 0.3  # diagonally dominant
    x_true = rng.normal(size=n)
    b = A @ x_true

    res = gmres_solve(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                      restart=20, rtol=1e-12, maxiter=400)
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-8)


def test_gmres_preconditioned_kle():
    """GMRES solves the (SPD) KLE system too — sanity vs CG."""
    from functools import partial

    from pynama_tpu.elements.spectral import SpectralElement
    from pynama_tpu.kle import build_kle_system
    from pynama_tpu.mesh.structured import BoxMesh
    from pynama_tpu.solvers.cg import cg_solve

    mesh = BoxMesh(nelem=(6, 6), lower=(0, 0), upper=(1, 1), ngl=3)
    elem = SpectralElement(3, 2)
    sys_ = build_kle_system(mesh, elem)
    mask = np.ones(mesh.n_nodes * 2)
    mask[mesh.node_dofs(mesh.boundary_nodes, 2)] = 0.0
    mask = jnp.asarray(mask)
    u_bc = np.zeros(mesh.n_nodes * 2)
    u_bc[0::2] = 1.0
    b = sys_.rhs(jnp.zeros(mesh.n_nodes), jnp.asarray(u_bc), mask)
    A = partial(sys_.apply_masked, free_mask=mask)
    xg = gmres_solve(A, b, m_inv=sys_.jacobi_inv(mask), restart=40,
                     rtol=1e-12, maxiter=2000).x
    xc = cg_solve(A, b, m_inv=sys_.jacobi_inv(mask), rtol=1e-12,
                  maxiter=5000).x
    np.testing.assert_allclose(np.asarray(xg), np.asarray(xc), atol=1e-7)


def test_kle_solver_gmres_config_matches_cg():
    """'kle-solver: gmres' routes FreeSlip KLE solves through restarted
    GMRES with the same masked system/preconditioning; uniform flow must
    still reproduce the exact constant field (reference test_solver.py:26
    tolerance class)."""
    import numpy as np

    from pynama_tpu.cases.uniform import UniformFlowProblem
    from tests.test_cases import make_config

    cfg = make_config((8, 8), 3)
    cfg["kle-solver"] = "gmres"
    p = UniformFlowProblem(cfg).setup()
    assert p.kle_solver == "gmres"
    u = p.solve_kle(0.0, p.initial_vorticity(), rtol=1e-12, maxiter=2000)
    vel_e, _ = p.exact_fields(0.0)
    diff = np.asarray(u).reshape(-1) - np.asarray(vel_e).reshape(-1)
    assert float(np.linalg.norm(diff)) < 1e-10
