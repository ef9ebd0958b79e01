"""Lid-driven cavity: mixed no-slip / free-slip walls with dual KLE solve.

Parity: /root/reference/src/cases/base_problem.py:300-454 (NoSlipFreeSlip)
and /root/reference/src/cases/cavity.py (Cavity).

The reference assembles 8 sparse matrices (K/Rw/Rd/Krhs + fs variants)
with intricate nnz bookkeeping (mat_ns.py). The masked-operator view
collapses this to ONE matrix-free K with two masks:

  mask_fs : free at the free-slip stage  — interior dofs + tangential
            dofs of no-slip wall nodes (only the wall-normal dof and
            fully-Dirichlet nodes are pinned),
  mask    : free at the final stage      — interior dofs only.

solveKLE (base_problem.py:321-327) becomes
  velFS = solve(K; mask_fs)(Rw w, u_bc)
  velFS[fsfree] = u_bc[fsfree]                 # no-slip wall velocities
  w2   = Curl(velFS)                           # wall vorticity generation
  vel  = solve(K; mask)(Rw w2, u_bc)
"""

import jax.numpy as jnp
import numpy as np

from pynama_tpu.bc import NoSlipWalls
from pynama_tpu.cases.base import BaseProblem


class NoSlipProblem(BaseProblem):
    """Dual-stage free-slip -> no-slip KLE solve."""

    def read_boundary_condition(self, bc):
        """Parity: Cavity.readBoundaryCondition (cavity.py:26-35)."""
        exclude = list(bc.get("free-slip", {}).keys()) if "free-slip" in bc else []
        self.free_slip_faces = exclude
        self.walls = NoSlipWalls(self.dim, exclude=exclude)
        for wall_name, wall_vel in bc.get("no-slip", {}).items():
            self.walls.set_wall_velocity(wall_name, wall_vel)

    def setup_bc(self):
        """Build the two masks + BC velocity vector.

        Parity: NoSlipFreeSlip.buildKLEMats dof classification
        (base_problem.py:343-386).
        """
        mesh, dim = self.mesh, self.dim
        nvd = mesh.n_nodes * dim

        set_fs = np.zeros(nvd, dtype=bool)   # pinned in BOTH solves
        fs_free = np.zeros(nvd, dtype=bool)  # free at FS stage only
        u_bc = np.zeros(nvd)

        for wall in self.walls.walls.values():
            nodes = mesh.face_nodes[wall.name].astype(np.int64)
            set_fs[nodes * dim + wall.normal_axis] = True
            for d in wall.tangential_dofs:
                fs_free[nodes * dim + d] = True
            if wall.velocity is not None:
                for d in wall.moving_dofs:
                    u_bc[nodes * dim + d] = wall.velocity[d]

        # fully-Dirichlet (free-slip-labeled) faces pin every dof
        for name in self.free_slip_faces:
            nodes = mesh.face_nodes[name].astype(np.int64)
            for d in range(dim):
                set_fs[nodes * dim + d] = True

        fs_free &= ~set_fs  # wall corners: normal dof of one wall is
        # tangential of the other -> pinned in both (base_problem.py:369)

        # Corner nodes between two moving/static walls: the reference sets
        # wall velocities wall-by-wall so the last writer wins; with a
        # single lid (cavity) corners on the lid keep the lid velocity.
        # Zero normal components always (u_bc starts at zero).

        gshape = self._gshape(dim)
        self.free_mask = jnp.asarray(
            (~(set_fs | fs_free)).astype(np.float64).reshape(gshape),
            dtype=self.dtype,
        )
        self.free_mask_fs = jnp.asarray(
            (~set_fs).astype(np.float64).reshape(gshape), dtype=self.dtype
        )
        self._u_bc = jnp.asarray(u_bc.reshape(gshape), dtype=self.dtype)
        # dofs free at FS stage but pinned at the final stage
        self._fsfree = self.free_mask_fs - self.free_mask

    def vel_bc(self, t):
        return self._u_bc

    def solve_kle(self, t, vort, x0=None, rtol=None, maxiter=None, restarts=1):
        """Parity: NoSlipFreeSlip.solveKLE (base_problem.py:321-327)."""
        vort, x0, restore = self._kle_layout(vort, x0)
        vel, _ = self._solve_kle_pair(t, vort, (x0, None), rtol=rtol,
                                      maxiter=maxiter, restarts=restarts)
        return restore(vel)

    def _kle_solve_aux(self, t, vort, vel_ws):
        """Stage solve with per-system warm starts.

        The FS and final systems have different solutions (they differ at
        the no-slip walls); warm-starting each from ITS OWN previous-stage
        solution instead of chaining final<-FS cuts the final solve's CG
        iterations several-fold (measured at 1.18M dofs, rtol 1e-8: 72 ->
        ~its FS-like warm count). aux carries the (vel_fs, vel) pair.
        """
        pair = vel_ws if isinstance(vel_ws, tuple) else (vel_ws, vel_ws)
        vel, vel_fs = self._solve_kle_pair(t, vort, pair)
        return vel, (vel_fs, vel)

    def _solve_kle_pair(self, t, vort, x0_pair, rtol=None, maxiter=None,
                        restarts=1):
        """(vel, vel_fs) dual-mask solve; inputs in the solver layout."""
        rtol = rtol if rtol is not None else self.kle_rtol
        maxiter = maxiter if maxiter is not None else self.kle_maxiter
        x0, x0_fin = x0_pair
        u_bc = self._solver_bc(t)
        mask_fs, mask = self._m("free_mask_fs"), self._m("free_mask")
        if self._refine:
            from pynama_tpu.kle import solve_ir

            def ir(w, m, x0_, minv):
                import jax.numpy as jnp

                return solve_ir(
                    self.system, self.system32, w, u_bc, m,
                    m.astype(jnp.float32), x0=x0_, rtol=rtol,
                    maxiter=maxiter, inner_rtol=self.kle_inner_rtol,
                    adaptive_inner=self.kle_adaptive_inner,
                    m_inv32=minv,
                )

            res_fs = ir(vort, mask_fs, x0, getattr(self, "_minv_fs", None))
        else:
            res_fs = self.system.solve(
                vort, u_bc, mask_fs, x0=x0, rtol=rtol,
                maxiter=maxiter, restarts=restarts,
                m_inv=getattr(self, "_minv_fs", None),
            )
        # applyBoundaryConditionsFS (cavity.py:67-82): overwrite no-slip
        # wall velocities before computing the wall vorticity
        fsfree = self._m("_fsfree")
        vel_fs = res_fs.x * (1.0 - fsfree) + u_bc * fsfree
        vort2 = self.operators.curl(vel_fs)
        x0f = x0_fin if x0_fin is not None else res_fs.x
        if self._refine:
            res = ir(vort2, mask, x0f, getattr(self, "_minv", None))
        else:
            res = self.system.solve(
                vort2, u_bc, mask, x0=x0f, rtol=rtol,
                maxiter=maxiter, restarts=restarts,
                m_inv=getattr(self, "_minv", None),
            )
        return res.x, res_fs.x


class CavityProblem(NoSlipProblem):
    """Parity: Cavity (cavity.py:5-82). IC: vort = 0 (cavity.py:50-51)."""

    def initial_vorticity(self):
        return jnp.zeros(self._gshape(self.dim_w), dtype=self.dtype)
