"""Restarted GMRES(m), jit-compatible.

Complements the CG stack for non-symmetric systems (the reference's KSP
allows any -ksp_type via options, ksp_solver.py:17; BASELINE.md lists a
GMRES Stokes config). Fixed restart length for static shapes: the Arnoldi
basis lives in a (m+1, n) buffer updated with lax.fori_loop, and the
least-squares problem is solved densely per restart.
"""

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class GMRESResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray
    resnorm: jnp.ndarray


def gmres_solve(
    apply_A: Callable,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    m_inv=None,
    restart: int = 30,
    rtol: float = 1e-8,
    atol: float = 0.0,
    maxiter: int = 1000,
) -> GMRESResult:
    """Left-preconditioned restarted GMRES."""
    n = b.shape[0]
    if x0 is None:
        x0 = jnp.zeros_like(b)
    apply_M = (
        m_inv if callable(m_inv)
        else ((lambda r: m_inv * r) if m_inv is not None else (lambda r: r))
    )
    m = restart

    b_p = apply_M(b)
    tol = jnp.maximum(rtol * jnp.linalg.norm(b_p), atol)

    def arnoldi_cycle(x):
        r = apply_M(b - apply_A(x))
        beta = jnp.linalg.norm(r)
        V = jnp.zeros((m + 1, n), dtype=b.dtype)
        V = V.at[0].set(r / jnp.where(beta == 0, 1.0, beta))
        H = jnp.zeros((m + 1, m), dtype=b.dtype)

        def body(j, carry):
            V, H = carry
            w = apply_M(apply_A(V[j]))
            # modified Gram-Schmidt
            def mgs(i, carry):
                w, H = carry
                h = jnp.where(i <= j, jnp.dot(V[i], w), 0.0)
                w = w - h * V[i]
                return w, H.at[i, j].set(h)

            w, H = jax.lax.fori_loop(0, m + 1, mgs, (w, H))
            hn = jnp.linalg.norm(w)
            H = H.at[j + 1, j].set(hn)
            V = V.at[j + 1].set(w / jnp.where(hn == 0, 1.0, hn))
            return V, H

        V, H = jax.lax.fori_loop(0, m, body, (V, H))
        # solve min || beta e1 - H y ||
        e1 = jnp.zeros(m + 1, dtype=b.dtype).at[0].set(beta)
        y, *_ = jnp.linalg.lstsq(H, e1)
        x = x + V[:m].T @ y
        res = jnp.linalg.norm(apply_M(b - apply_A(x)))
        return x, res

    def cond(carry):
        _, res, k = carry
        return (res > tol) & (k < maxiter)

    def body(carry):
        x, _, k = carry
        x, res = arnoldi_cycle(x)
        return x, res, k + m

    r0 = jnp.linalg.norm(apply_M(b - apply_A(x0)))
    x, res, k = jax.lax.while_loop(
        cond, body, (x0, r0, jnp.asarray(0, jnp.int32))
    )
    return GMRESResult(x=x, iters=k, resnorm=res)
