"""The KLE (Kinematic Laplacian Equation) system: K u = Rw w + lifting.

Re-design of the reference's sparse-assembled KLE matrices with
Dirichlet-row elimination (/root/reference/src/cases/base_problem.py:
456-552 FreeSlip, :300-454 NoSlipFreeSlip; matrices/mat_generator.py).

Instead of assembling K with eliminated rows/columns plus a Krhs lifting
matrix, we keep the FULL (unconstrained) elemental operators and express
constraints with a per-dof mask P (1 = free, 0 = constrained):

    K_masked(u) = P K(P u) + (I-P) u                 (identity on BC rows)
    rhs         = P (Rw w - K ((I-P) u_bc)) + (I-P) u_bc

which is algebraically identical to the reference's
  K <- K[free,free] + I[bc,bc],  Krhs <- -K[free,bc] + I[bc,bc]
construction (base_problem.py:499-552), but needs no special assembly and
jit-compiles to fused masked GEMMs. The two-stage no-slip/free-slip solve
(base_problem.py:321-327) is the same operator with two different masks.
"""

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pynama_tpu.elements.spectral import SpectralElement
from pynama_tpu.mesh.structured import BoxMesh
from pynama_tpu.ops.assembly import ElementOp, make_element_op
from pynama_tpu.solvers.cg import CGResult, cg_solve, sumdot


@jax.tree_util.register_pytree_node_class
@dataclass
class KLESystem:
    """Velocity-recovery system: masked SPD solve via CG.

    K:   ElementOp vel->vel (full, unconstrained vector-Laplacian+penalty)
    Rw:  ElementOp vort->vel
    Rd:  ElementOp scalar->vel (divergence-penalty RHS; API parity)
    diag_K: assembled diagonal of K (for Jacobi preconditioning)
    """

    K: ElementOp
    Rw: ElementOp
    Rd: ElementOp
    diag_K: jnp.ndarray
    diag_K_b: Optional[jnp.ndarray] = None  # parity-blocked layout (TPU)

    def tree_flatten(self):
        return (self.K, self.Rw, self.Rd, self.diag_K, self.diag_K_b), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- masked operator ------------------------------------------------
    def apply_masked(self, u, free_mask):
        K = self.K
        if (u.ndim > 1 and hasattr(K, "apply_blocked")
                and u.shape == K.blocked_shape_in):
            from pynama_tpu.ops.conv import mask_frees_boundary

            corr = mask_frees_boundary(free_mask, K.eff_ngl, K.npts_grid)
            Ku = K.apply_blocked(free_mask * u, corrections=corr)
        else:
            Ku = K(free_mask * u)
        return free_mask * Ku + (1.0 - free_mask) * u

    def rhs(self, vort, u_bc, free_mask):
        """P (Rw w - K (I-P) u_bc) + (I-P) u_bc."""
        bc_part = (1.0 - free_mask) * u_bc
        return free_mask * (self.Rw(vort) - self.K(bc_part)) + bc_part

    def jacobi_inv(self, free_mask):
        if free_mask.ndim > 1:
            if (self.diag_K_b is not None
                    and free_mask.shape == self.diag_K_b.shape):
                diag = self.diag_K_b
            else:
                diag = self.diag_K.reshape(free_mask.shape)
        else:
            diag = self.diag_K
        d = free_mask * diag + (1.0 - free_mask)
        return 1.0 / d

    def solve(
        self,
        vort,
        u_bc,
        free_mask,
        x0: Optional[jnp.ndarray] = None,
        rtol: float = 1e-13,
        atol: float = 0.0,
        maxiter: int = 20000,
        restarts: int = 2,
        dot=sumdot,
        m_inv=None,
    ) -> CGResult:
        """Solve the KLE for velocity given vorticity and BC values.

        Parity: FreeSlip.solveKLE (base_problem.py:479-481). ``restarts``
        re-runs CG from the converged iterate with a freshly computed
        residual (iterative refinement), recovering the last digits lost
        to the recursive residual update — needed to match the direct-LU
        accuracy of the reference (test_solver.py:26).
        """
        b = self.rhs(vort, u_bc, free_mask)
        if x0 is None:
            x0 = (1.0 - free_mask) * u_bc
        else:
            x0 = free_mask * x0 + (1.0 - free_mask) * u_bc
        apply_A = partial(self.apply_masked, free_mask=free_mask)
        if m_inv is None:
            m_inv = self.jacobi_inv(free_mask)
        total_iters = 0
        res = None
        for _ in range(max(1, restarts)):
            res = cg_solve(
                apply_A, b, x0=x0, m_inv=m_inv,
                rtol=rtol, atol=atol, maxiter=maxiter, dot=dot,
            )
            x0 = res.x
            total_iters += res.iters
        return CGResult(x=res.x, iters=total_iters, resnorm=res.resnorm)


def solve_ir(
    sys64: "KLESystem",
    sys32: "KLESystem",
    vort,
    u_bc,
    free_mask,
    free_mask32,
    x0=None,
    rtol: float = 1e-8,
    maxiter: int = 4000,
    max_rounds: int = 4,
    inner_rtol: float = 1e-4,
    adaptive_inner: bool = True,
    m_inv32=None,
    dot=sumdot,
) -> CGResult:
    """Mixed-precision iterative refinement: TRUE f64 residual, f32 inner.

    The reference's LU backsolves deliver machine-precision residuals in
    f64 (ksp_solver.py:12-19); plain f32 CG on TPU floors at a true
    relative residual of ~1e-6 (the apply's rounding), however tight the
    stopping tolerance. This is the TPU-native route to the 1e-8 parity
    residual: the defect equation is formed with ONE f64 operator apply
    per round (f64 works on the TPU, ~10x an f32 apply — cheap next to a
    solve), the correction is solved by the f32 multigrid-CG stack, and
    the f64 iterate accumulates the corrections. Each round multiplies
    the TRUE residual by ~inner_rtol, so 1e-8 from a warm start is
    typically one round.

    adaptive_inner (default): each round's inner tolerance is opened up
    to 0.3x the reduction actually remaining (never looser than 5e-2,
    never tighter than inner_rtol) — warm-started solves stop
    over-converging their correction; cold starts are unchanged. The
    0.3 safety factor assumes the inner f32 solve's RECURSIVE residual
    reduction carries over to the TRUE residual; near the f32 apply
    floor (~3e-6 relative) a round can under-deliver, costing one extra
    f64 defect apply + inner solve out of max_rounds — never
    correctness, since the outer loop measures true f64 residuals.

    vort/u_bc/free_mask are f64 (solver layout); free_mask32/m_inv32 the
    f32 mask and preconditioner for the inner solves.
    """
    b = sys64.rhs(vort, u_bc, free_mask)
    if x0 is None:
        x = (1.0 - free_mask) * u_bc
    else:
        x = free_mask * x0 + (1.0 - free_mask) * u_bc
    tol2 = (rtol ** 2) * dot(b, b)
    if m_inv32 is None:
        m_inv32 = sys32.jacobi_inv(free_mask32)

    def true_res(x):
        r = b - sys64.apply_masked(x, free_mask)
        return r, dot(r, r)

    r0, rr0 = true_res(x)

    def cond(state):
        _, _, rr, rounds, _ = state
        return (rr > tol2) & (rounds < max_rounds)

    def body(state):
        x, r, rr, rounds, iters = state
        # Adaptive inner tolerance: each round only needs to shrink the
        # TRUE residual from sqrt(rr) down to sqrt(tol2), so ask the f32
        # correction solve for that reduction (x0.3 safety) instead of
        # the full inner_rtol. Cold starts (reduction <= inner_rtol)
        # behave exactly as before; warm-started stage solves typically
        # sit 1-2 decades above target, where a fixed 1e-4 inner solve
        # wastes most of its V-cycle iterations over-converging.
        if adaptive_inner:
            need = jnp.sqrt(tol2 / jnp.maximum(rr, jnp.finfo(x.dtype).tiny))
            inner_t = jnp.clip(
                0.3 * need, inner_rtol, max(5e-2, inner_rtol)
            ).astype(jnp.float32)
        else:
            inner_t = inner_rtol
        d = cg_solve(
            lambda v: sys32.apply_masked(v, free_mask32),
            r.astype(jnp.float32),
            m_inv=m_inv32,
            rtol=inner_t,
            maxiter=maxiter,
            dot=dot,
        )
        x = x + d.x.astype(x.dtype)
        r, rr = true_res(x)
        return (x, r, rr, rounds + 1, iters + d.iters)

    zero = jnp.asarray(0, jnp.int32)
    x, r, rr, rounds, iters = jax.lax.while_loop(
        cond, body, (x, r0, rr0, zero, zero)
    )
    return CGResult(x=x, iters=iters, resnorm=jnp.sqrt(rr))


@jax.tree_util.register_pytree_node_class
@dataclass
class ProjectionOperators:
    """Mass-lumped nodal projection operators Curl, SrT, DivSrT.

    Each is an ElementOp followed by division with the assembled lumped
    weight vector — the TPU equivalent of the reference's
    diagonalScale(1/weights) row scaling (mat_generator.py:172-190).
    """

    Curl: ElementOp
    SrT: ElementOp
    DivSrT: ElementOp
    w_curl: jnp.ndarray   # (n_nodes*dim_w,)
    w_srt: jnp.ndarray    # (n_nodes*dim_s,)
    w_div: jnp.ndarray    # (n_nodes*dim,)
    # parity-blocked weights (pad slots = 1), present on structured meshes
    wb_curl: Optional[jnp.ndarray] = None
    wb_srt: Optional[jnp.ndarray] = None
    wb_div: Optional[jnp.ndarray] = None

    def tree_flatten(self):
        return (self.Curl, self.SrT, self.DivSrT, self.w_curl, self.w_srt,
                self.w_div, self.wb_curl, self.wb_srt, self.wb_div), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def _w(self, w, wb, out):
        if out.ndim == 1:
            return w
        if wb is not None and out.shape == wb.shape:
            return wb
        return w.reshape(out.shape)

    def curl(self, vel):
        out = self.Curl(vel)
        return out / self._w(self.w_curl, self.wb_curl, out)

    def strain_rate(self, vel):
        out = self.SrT(vel)
        return out / self._w(self.w_srt, self.wb_srt, out)

    def div_srt(self, s):
        out = self.DivSrT(s)
        return out / self._w(self.w_div, self.wb_div, out)


def v_tens_v(vel, dim):
    """Pointwise symmetric u (x) u in dim_s interleaved components.

    Parity: base_problem.py:234-252 (computeVtensV).
    2D: [vx^2, vx vy, vy^2]; 3D adds [vy vz, vz^2, vz vx].
    Layout-polymorphic: flat interleaved vector, (..., dim) grid, or
    parity-blocked (..., P^dim*dim) — channels regroup as (parity, comp),
    so a trailing reshape exposes the per-node components.
    """
    flat = vel.ndim == 1
    if flat:
        v = vel.reshape(-1, dim)
    elif vel.shape[-1] != dim:  # blocked: (..., nsub*dim) -> (..., nsub, dim)
        nsub = vel.shape[-1] // dim
        out = v_tens_v(vel.reshape(vel.shape[:-1] + (nsub, dim)), dim)
        return out.reshape(vel.shape[:-1] + (nsub * out.shape[-1],))
    else:
        v = vel
    c = lambda i: v[..., i]
    if dim == 2:
        comps = [c(0) * c(0), c(0) * c(1), c(1) * c(1)]
    else:
        comps = [c(0) * c(0), c(0) * c(1), c(1) * c(1),
                 c(1) * c(2), c(2) * c(2), c(2) * c(0)]
    out = jnp.stack(comps, axis=-1)
    return out.reshape(-1) if flat else out


def ns_rhs(system_ops: ProjectionOperators, vel, mu, rho, dim):
    """Vorticity transport RHS: Curl(Div(2 mu S - rho u(x)u) / rho).

    Parity: base_problem.py:212-232 (evalRHS).
    """
    aux = 2.0 * mu * system_ops.strain_rate(vel)
    aux = aux - rho * v_tens_v(vel, dim)
    r = system_ops.div_srt(aux) / rho
    return system_ops.curl(r)


# ----------------------------------------------------------------------
# builders
# ----------------------------------------------------------------------
def build_kle_system(mesh: BoxMesh, elem: SpectralElement, dtype=jnp.float64):
    """Assemble the matrix-free KLE system for a mesh.

    Uniform box meshes get the scatter-free structured apply
    (pynama_tpu/ops/structured.py — strided slices + one shared GEMM);
    unstructured meshes use batched per-element matrices with
    gather/scatter (the reference computes cell-0 matrices once for
    uniform meshes too, base_problem.py:133-137,333-337, and per-cell for
    general ones, :504-506).
    """
    dim, dim_w = mesh.dim, mesh.dim_w
    n_vel = mesh.n_nodes * dim

    if mesh.uniform and hasattr(mesh, "npts"):
        from pynama_tpu.ops.structured import (StructuredElementOp,
                                               pick_super_factor)

        K_el, Rw_el, Rd_el = elem.kle_matrices(mesh.cell_corners[0])
        sb = pick_super_factor(tuple(mesh.nelem), mesh.ngl, dim)

        def sop(A, k_in, k_out):
            return StructuredElementOp(
                A=jnp.asarray(A, dtype=dtype), ngl=mesh.ngl,
                nelem=tuple(mesh.nelem), npts=tuple(mesh.npts),
                k_in=k_in, k_out=k_out, sb=sb,
            )

        K = sop(K_el, dim, dim)
        Rw = sop(Rw_el, dim_w, dim)
        Rd = sop(Rd_el, 1, dim)
        diag = K.diagonal()
        gshape = tuple(reversed(mesh.npts)) + (dim,)
        return KLESystem(K=K, Rw=Rw, Rd=Rd, diag_K=diag,
                         diag_K_b=K.to_blocked(diag.reshape(gshape)))

    vdofs = mesh.cell_dofs(dim)
    wdofs = mesh.cell_dofs(dim_w)
    sdofs = mesh.cell2node
    K_el, Rw_el, Rd_el = elem.kle_matrices(mesh.cell_corners)
    K = make_element_op(K_el, vdofs, vdofs, n_vel, dtype)
    Rw = make_element_op(Rw_el, wdofs, vdofs, n_vel, dtype)
    Rd = make_element_op(Rd_el, sdofs, vdofs, n_vel, dtype)
    return KLESystem(K=K, Rw=Rw, Rd=Rd, diag_K=K.diagonal())


def build_operators(mesh: BoxMesh, elem: SpectralElement, dtype=jnp.float64):
    """Assemble the nodal projection operators.

    Parity: base_problem.py:132-140 (buildOperators) +
    mat_generator.py:157-190 (Operators.setValues/assembleAll).
    """
    dim, dim_w, dim_s = mesh.dim, mesh.dim_w, mesh.dim_s
    n = mesh.n_nodes

    if mesh.uniform and hasattr(mesh, "npts"):
        from pynama_tpu.ops.structured import (StructuredElementOp,
                                               pick_super_factor)

        SrT_el, Div_el, Curl_el, wvec_el = elem.kle_operators(mesh.cell_corners[0])
        wvec_el = np.broadcast_to(wvec_el, (mesh.n_cells, elem.nnode))
        sb = pick_super_factor(tuple(mesh.nelem), mesh.ngl, dim)

        def sop(A, k_in, k_out):
            return StructuredElementOp(
                A=jnp.asarray(A, dtype=dtype), ngl=mesh.ngl,
                nelem=tuple(mesh.nelem), npts=tuple(mesh.npts),
                k_in=k_in, k_out=k_out, sb=sb,
            )

        Curl = sop(Curl_el, dim, dim_w)
        SrT = sop(SrT_el, dim, dim_s)
        Div = sop(Div_el, dim_s, dim)
    else:
        vdofs = mesh.cell_dofs(dim)
        wdofs = mesh.cell_dofs(dim_w)
        sdofs = mesh.cell_dofs(dim_s)
        SrT_el, Div_el, Curl_el, wvec_el = elem.kle_operators(mesh.cell_corners)
        Curl = make_element_op(Curl_el, vdofs, wdofs, n * dim_w, dtype)
        SrT = make_element_op(SrT_el, vdofs, sdofs, n * dim_s, dtype)
        Div = make_element_op(Div_el, sdofs, vdofs, n * dim, dtype)

    # assembled lumped node weights, then expanded per dof family
    w_node = np.zeros(n)
    np.add.at(w_node, np.asarray(mesh.cell2node).reshape(-1), np.asarray(wvec_el).reshape(-1))

    def expand(k):
        return jnp.asarray(np.repeat(w_node, k), dtype=dtype)

    def expand_blocked(k):
        """Blocked weights with pad slots = 1 (division-safe)."""
        if not (mesh.uniform and hasattr(mesh, "npts")):
            return None
        from pynama_tpu.ops.conv import pad_mask, to_blocked

        eff = Curl.eff_ngl  # super-blocked period (ops/structured.py sb)
        npg = tuple(reversed(mesh.npts))
        g = np.repeat(w_node, k).reshape(npg + (k,))
        wb = np.asarray(to_blocked(jnp.asarray(g), eff))
        pm = pad_mask(eff, npg, k)
        return jnp.asarray(wb + (1.0 - pm), dtype=dtype)

    return ProjectionOperators(
        Curl=Curl,
        SrT=SrT,
        DivSrT=Div,
        w_curl=expand(dim_w),
        w_srt=expand(dim_s),
        w_div=expand(dim),
        wb_curl=expand_blocked(dim_w),
        wb_srt=expand_blocked(dim_s),
        wb_div=expand_blocked(dim),
    )
