"""Bogacki-Shampine RK5(4) integrator tests.

Parity targets: PETSc TS rk '5bs' behavior
(/root/reference/src/solver/ts_solver.py:11-21) — 5th order accuracy,
embedded 4th-order error control, MATCHSTEP exact final time.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pynama_tpu.solvers.rk import (
    BS5_A,
    BS5_B,
    BS5_BEMBED,
    BS5_C,
    integrate,
    make_bs5_stepper,
)


def test_order_conditions():
    b, c, A = BS5_B, BS5_C, BS5_A
    # quadrature conditions for order 5 (necessary)
    for k in range(5):
        np.testing.assert_allclose(np.sum(b * c**k), 1.0 / (k + 1), atol=1e-14)
    # embedded method order 4 quadrature conditions
    for k in range(4):
        np.testing.assert_allclose(np.sum(BS5_BEMBED * c**k), 1.0 / (k + 1), atol=1e-14)
    # row-sum consistency c_i = sum_j a_ij
    np.testing.assert_allclose(A.sum(axis=1), c, atol=1e-14)
    # a couple of genuine order-5 tree conditions
    np.testing.assert_allclose(b @ A @ c, 1.0 / 6.0, atol=1e-14)
    np.testing.assert_allclose(b @ A @ A @ c, 1.0 / 24.0, atol=1e-14)
    np.testing.assert_allclose(b @ (c * (A @ c)), 1.0 / 8.0, atol=1e-14)
    np.testing.assert_allclose(b @ A @ (c * c), 1.0 / 12.0, atol=1e-14)


def test_fifth_order_convergence():
    """Fixed-dt accepted steps must converge at order 5."""

    def rhs(t, y, aux):
        return -y + jnp.sin(3.0 * t) * jnp.ones_like(y), aux

    def exact(t):
        # y' = -y + sin(3t), y(0)=1 -> y = c e^-t + (sin3t - 3cos3t)/10
        c = 1.0 + 0.3
        return c * np.exp(-t) + (np.sin(3 * t) - 3 * np.cos(3 * t)) / 10.0

    errs = []
    for n in (2, 4):
        # force acceptance with huge tolerances -> fixed dt
        step = make_bs5_stepper(rhs, atol=1e10, rtol=1e10)
        y = jnp.ones(1)
        t = jnp.asarray(0.0)
        dt = jnp.asarray(1.0 / n)
        f1, _ = rhs(t, y, None)
        aux = jnp.zeros(1)
        for _ in range(n):
            res = step(y, t, dt, aux, f1, jnp.asarray(1.0))
            y, t, f1 = res.y, res.t, res.f_new
        errs.append(abs(float(y[0]) - exact(1.0)))
    order = np.log2(errs[0] / errs[1])
    assert order > 4.7, (errs, order)


def test_adaptive_integrate_accuracy_and_matchstep():
    def rhs(t, y, aux):
        return y * jnp.cos(t), aux  # y = exp(sin t)

    y0 = jnp.ones(1)
    y, t, n = integrate(
        rhs, y0, 0.0, 2.5, dt0=0.5, aux=jnp.zeros(1), atol=1e-9, rtol=1e-9
    )
    assert abs(t - 2.5) < 1e-12  # MATCHSTEP: exact final time
    np.testing.assert_allclose(float(y[0]), np.exp(np.sin(2.5)), rtol=1e-7)
    assert n < 100


def test_rejection_shrinks_dt():
    """A stiff start must reject and shrink dt rather than blow up."""

    def rhs(t, y, aux):
        return -50.0 * y, aux

    y, t, n = integrate(
        rhs, jnp.ones(1), 0.0, 1.0, dt0=1.0, aux=jnp.zeros(1), atol=1e-6, rtol=1e-6
    )
    # dt0=1 with lambda=-50 must be rejected: the run takes many steps and
    # stays bounded (accumulated error is O(steps * atol))
    assert n > 10
    assert abs(float(y[0])) < 1e-4


def test_ws_extrapolation_scan_attempt_matches_plain():
    """ws_extrapolate slot bookkeeping never perturbs the y trajectory.

    On an rhs whose derivative ignores the incoming aux (warm starts only
    affect solver iteration counts in the real problems), the
    ws-extrapolated scan attempt must produce bit-identical y5/wlte and
    track each stage's aux output in its slot.
    """
    import jax

    from pynama_tpu.solvers.rk import (BS5_STAGES, make_bs5_scan_attempt,
                                       make_ws_state, ws_aux_vel)

    def rhs(t, y, aux):
        return -0.7 * y + jnp.sin(t), y * 2.0  # aux out = stage state

    plain = jax.jit(make_bs5_scan_attempt(rhs, atol=1e10, rtol=1e10))
    ws = jax.jit(make_bs5_scan_attempt(rhs, atol=1e10, rtol=1e10,
                                       ws_extrapolate=True))
    y = jnp.asarray(np.linspace(0.3, 1.0, 5))
    t = jnp.asarray(0.2)
    dt = jnp.asarray(0.05)
    f1, aux0 = rhs(t, y, y)
    y5_p, f_p, w_p, _ = plain(y, t, dt, y, f1)
    st = make_ws_state(aux0, t)
    y5_w, f_w, w_w, st1 = ws(y, t, dt, st, f1)
    np.testing.assert_array_equal(np.asarray(y5_p), np.asarray(y5_w))
    np.testing.assert_array_equal(np.asarray(f_p), np.asarray(f_w))
    np.testing.assert_array_equal(np.asarray(w_p), np.asarray(w_w))
    # H1 slots hold each stage's aux output; H2 became the previous H1
    H1, H2, t_prev, t_pp = st1
    assert float(t_prev) == 0.2 and float(t_pp) == 0.2
    assert H1.shape == (BS5_STAGES - 1,) + y.shape
    np.testing.assert_array_equal(np.asarray(H2), np.asarray(st[0]))
    # second step: theta = (t2 - t1)/(t1 - t0) is finite and the slot
    # guesses extrapolate (smoke: runs and advances history)
    y5_w2, _, _, st2 = ws(y5_w, t + dt, dt, st1, f_w)
    assert float(st2[2]) == pytest.approx(0.25)
    np.testing.assert_array_equal(np.asarray(st2[1]), np.asarray(H1))
    np.testing.assert_array_equal(
        np.asarray(ws_aux_vel(st2)), np.asarray(st2[0][BS5_STAGES - 2]))
