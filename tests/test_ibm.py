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
