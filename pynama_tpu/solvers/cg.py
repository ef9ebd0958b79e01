"""Jacobi-preconditioned conjugate gradients, jit-compatible.

Replaces the reference's PETSc KSP preonly + PC LU direct solves
(/root/reference/src/solver/ksp_solver.py:5-19). The KLE stiffness matrix
K is SPD after penalty augmentation and Dirichlet lifting, so CG applies.
Designed for warm starts (the previous RK stage's velocity) and for a
pluggable dot-product so the same loop runs under shard_map with psum.
"""

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


def sumdot(a, b):
    """Layout-agnostic inner product (works on flat vectors and grids)."""
    return jnp.sum(a * b)


class CGResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray
    resnorm: jnp.ndarray


def cg_solve(
    apply_A: Callable,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    m_inv: Optional[jnp.ndarray] = None,
    rtol: float = 1e-12,
    atol: float = 0.0,
    maxiter: int = 10000,
    dot: Callable = sumdot,
) -> CGResult:
    """Solve A x = b with preconditioned CG.

    apply_A: linear SPD operator. m_inv: preconditioner — a diagonal vector
    (Jacobi) or a callable z = M^{-1}(r) (e.g. a multigrid V-cycle); None
    for unpreconditioned. Stops when ||r||_2 <= max(rtol*||b||, atol).
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if m_inv is None:
        m_inv = jnp.ones_like(b)
    apply_M = m_inv if callable(m_inv) else (lambda r: m_inv * r)

    tol = jnp.maximum(rtol * jnp.sqrt(dot(b, b)), atol)
    tol2 = tol * tol

    r0 = b - apply_A(x0)
    rr0 = dot(r0, r0)
    # warm starts frequently satisfy the tolerance outright; don't pay
    # the preconditioner apply (a full V-cycle) for a 0-iteration solve
    z0 = jax.lax.cond(rr0 > tol2, apply_M, jnp.zeros_like, r0)
    rz0 = dot(r0, z0)

    def cond(state):
        _, _, _, _, rr, _, k = state
        return (rr > tol2) & (k < maxiter)

    def body(state):
        x, r, z, p, rr, rz, k = state
        Ap = apply_A(p)
        pAp = dot(p, Ap)
        alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = apply_M(r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = z + beta * p
        return (x, r, z, p, dot(r, r), rz_new, k + 1)

    init = (x0, r0, z0, z0, rr0, rz0, jnp.asarray(0, dtype=jnp.int32))
    x, r, _, _, rr, _, k = jax.lax.while_loop(cond, body, init)
    return CGResult(x=x, iters=k, resnorm=jnp.sqrt(rr))
