"""End-to-end KLE solve gates.

Parity targets from the reference test suite
(/root/reference/src/tests/test_solver.py):
  * uniform flow 2D:  ||u - u_exact||_2 < 1e-12   (:26)
  * uniform flow 3D:  ||u - u_exact||_2 < 2e-13   (:61)
  * Taylor-Green ngl=11 on 2x2: ||u - u_exact||_2 < 2e-8  (:36)
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pynama_tpu.elements.spectral import SpectralElement
from pynama_tpu.kle import build_kle_system, build_operators, v_tens_v
from pynama_tpu.mesh.structured import BoxMesh


def dirichlet_mask(mesh):
    """Free mask with every boundary-node dof constrained (FreeSlip case)."""
    mask = np.ones(mesh.n_nodes * mesh.dim)
    mask[mesh.node_dofs(mesh.boundary_nodes, mesh.dim)] = 0.0
    return jnp.asarray(mask)


def test_uniform_flow_2d():
    mesh = BoxMesh(nelem=(10, 10), lower=(0, 0), upper=(1, 1), ngl=3)
    elem = SpectralElement(3, 2)
    sys = build_kle_system(mesh, elem)
    mask = dirichlet_mask(mesh)

    u_bc = np.zeros(mesh.n_nodes * 2)
    u_bc[0::2] = 1.0  # constant [1, 0] (only boundary values are read)
    vort = jnp.zeros(mesh.n_nodes)

    res = sys.solve(vort, jnp.asarray(u_bc), mask, rtol=1e-14, maxiter=5000)
    exact = np.zeros(mesh.n_nodes * 2)
    exact[0::2] = 1.0
    err = np.linalg.norm(np.asarray(res.x) - exact)
    assert err < 1e-12, (err, int(res.iters))


def test_uniform_flow_3d():
    mesh = BoxMesh(nelem=(3, 3, 3), lower=(0, 0, 0), upper=(1, 1, 1), ngl=3)
    elem = SpectralElement(3, 3)
    sys = build_kle_system(mesh, elem)
    mask = dirichlet_mask(mesh)

    u_bc = np.zeros(mesh.n_nodes * 3)
    u_bc[0::3] = 1.0
    vort = jnp.zeros(mesh.n_nodes * 3)

    res = sys.solve(vort, jnp.asarray(u_bc), mask, rtol=1e-14, maxiter=8000)
    exact = np.zeros(mesh.n_nodes * 3)
    exact[0::3] = 1.0
    err = np.linalg.norm(np.asarray(res.x) - exact)
    assert err < 2e-13, (err, int(res.iters))


def taylor_green_2d(coords, nu, t):
    x = 2 * np.pi * coords[:, 0]
    y = 2 * np.pi * coords[:, 1]
    expo = np.exp(-8 * np.pi**2 * nu * t)
    vel = np.stack([np.cos(x) * np.sin(y), -np.sin(x) * np.cos(y)], axis=1) * expo
    vort = -4 * np.pi * np.cos(x) * np.cos(y) * expo
    return vel, vort


def test_taylor_green_kle_ngl11():
    nu = 0.01 / 0.5
    mesh = BoxMesh(nelem=(2, 2), lower=(0, 0), upper=(1, 1), ngl=11)
    elem = SpectralElement(11, 2)
    sys = build_kle_system(mesh, elem)
    mask = dirichlet_mask(mesh)

    t = 0.0
    vel_exact, vort_exact = taylor_green_2d(mesh.coords, nu, t)
    u_bc = vel_exact.reshape(-1).copy()

    res = sys.solve(
        jnp.asarray(vort_exact), jnp.asarray(u_bc), mask, rtol=1e-14, maxiter=30000
    )
    err = np.linalg.norm(np.asarray(res.x) - vel_exact.reshape(-1))
    assert err < 2e-8, (err, int(res.iters))


def test_v_tens_v():
    """Parity: /root/reference/src/tests/test_solver.py:64-86."""
    vel = jnp.asarray(np.array([1.0, 2.0, 3.0, 4.0]))  # two nodes 2D
    out = np.asarray(v_tens_v(vel, 2))
    np.testing.assert_allclose(out, [1.0, 2.0, 4.0, 9.0, 12.0, 16.0])


def test_mixed_precision_refinement_reaches_true_residual():
    """solve_ir: f64 defect + f32 inner solves hit a TRUE f64 residual the
    pure-f32 path cannot (its apply rounding floors at ~1e-6 relative) —
    the parity answer to the reference's f64 LU backsolves."""
    import jax.numpy as jnp

    from pynama_tpu.cases.cavity import CavityProblem
    from pynama_tpu.kle import solve_ir
    from tests.test_cases import make_config

    cfg = make_config((8, 8), 3, rho=1.0, mu=0.1, end=0.1, max_steps=3)
    cfg["boundary-conditions"] = {"no-slip": {"up": [1.0, 0.0]}}
    cfg["kle-refine"] = True
    p = CavityProblem(cfg).setup()
    assert p._refine and p.system32 is not None
    w0 = p.initial_vorticity()
    w0s = p._blk(w0) if p._blocked else w0
    u_bc = p._solver_bc(0.0)
    mask = p._m("free_mask_fs")
    res = solve_ir(p.system, p.system32, w0s, u_bc, mask,
                   mask.astype(jnp.float32), rtol=1e-10,
                   m_inv32=getattr(p, "_minv_fs", None))
    b = p.system.rhs(w0s, u_bc, mask)
    r = b - p.system.apply_masked(res.x, mask)
    rel = float(jnp.linalg.norm(r.reshape(-1)) /
                jnp.linalg.norm(b.reshape(-1)))
    assert rel < 1e-10, rel
    assert res.x.dtype == jnp.float64

    # the refined dual-mask solve matches a tight plain-f64 solve
    u = p.solve_kle(0.0, w0)
    cfg2 = {k: v for k, v in cfg.items() if k != "kle-refine"}
    p2 = CavityProblem(cfg2).setup()
    u_ref = p2.solve_kle(0.0, p2.initial_vorticity(), rtol=1e-12,
                         maxiter=30000, restarts=2)
    err = float(jnp.linalg.norm((u - u_ref).reshape(-1)) /
                jnp.linalg.norm(u_ref.reshape(-1)))
    assert err < 1e-8, err


def test_adaptive_inner_rtol_saves_warm_iterations():
    """solve_ir adaptive inner tolerance: a warm-started refinement round
    asks the f32 inner solve only for the residual reduction it still
    needs, spending fewer CG iterations than the fixed inner_rtol while
    still landing the TRUE f64 residual under rtol."""
    import jax.numpy as jnp

    from pynama_tpu.cases.cavity import CavityProblem
    from pynama_tpu.kle import solve_ir
    from tests.test_cases import make_config

    cfg = make_config((8, 8), 3, rho=1.0, mu=0.1, end=0.1, max_steps=3)
    cfg["boundary-conditions"] = {"no-slip": {"up": [1.0, 0.0]}}
    cfg["kle-refine"] = True
    p = CavityProblem(cfg).setup()
    w0 = p.initial_vorticity()
    w0s = p._blk(w0) if p._blocked else w0
    u_bc = p._solver_bc(0.0)
    mask = p._m("free_mask_fs")
    m32 = mask.astype(jnp.float32)
    kw = dict(rtol=1e-8, m_inv32=getattr(p, "_minv_fs", None))
    cold = solve_ir(p.system, p.system32, w0s, u_bc, mask, m32, **kw)
    # emulate the next RK stage's system: nonzero vorticity, warm start
    w1 = p.operators.curl(cold.x).astype(w0s.dtype) * 0.5
    b = p.system.rhs(w1, u_bc, mask)
    bn = float(jnp.linalg.norm(b.reshape(-1)))
    # Construct a warm start INSIDE the adaptive band: blend the exact
    # w1 solution with the stale cold.x iterate so the initial relative
    # residual sits where 0.3*sqrt(tol2/rr) exceeds inner_rtol=1e-4
    # (requires rel_ws < rtol/3.3e-4 ~ 3e-5) but convergence is not yet
    # reached (rel_ws >> rtol). Outside that band both paths run the
    # identical fixed-tolerance solve and the comparison is vacuous.
    x1 = solve_ir(p.system, p.system32, w1, u_bc, mask, m32,
                  rtol=1e-10, m_inv32=kw["m_inv32"]).x
    s = 1e-4
    x_ws = x1 + s * (cold.x - x1)
    r_ws = b - p.system.apply_masked(mask * x_ws + (1.0 - mask) * u_bc, mask)
    rel_ws = float(jnp.linalg.norm(r_ws.reshape(-1))) / bn
    assert 1e-7 < rel_ws < 3e-5, rel_ws
    iters = {}
    for ad in (False, True):
        res = solve_ir(p.system, p.system32, w1, u_bc, mask, m32,
                       x0=x_ws, adaptive_inner=ad, **kw)
        r = b - p.system.apply_masked(res.x, mask)
        rel = float(jnp.linalg.norm(r.reshape(-1))) / bn
        assert rel < 1e-8, (ad, rel)
        iters[ad] = int(res.iters)
    # strict: the adaptive branch is provably looser inside the band, so
    # it must spend fewer inner CG iterations (ADVICE r4: non-strict
    # passed vacuously when the warm start never opened the tolerance)
    assert iters[True] < iters[False], iters
