"""Problem orchestration: setup -> KLE solve -> transient run.

Re-design of /root/reference/src/cases/base_problem.py (BaseProblem /
FreeSlip / NoSlipFreeSlip). The reference wires PETSc Mats, KSP and TS
together imperatively; here each problem builds pure jittable functions
(KLE solve, transport RHS) over pytree state, and the adaptive BS5(4)
stepper advances the vorticity.

Config schema matches the reference YAML cases
(/root/reference/src/cases/*.yaml): name, material-properties {rho, mu},
domain {ngl, box-mesh {nelem, lower, upper}}, time-solver {start-time,
end-time, max-steps}, boundary-conditions {...}.
"""

import logging
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pynama_tpu.elements.spectral import SpectralElement
from pynama_tpu.kle import (
    build_kle_system,
    build_operators,
    ns_rhs,
)
from pynama_tpu.mesh.structured import BoxMesh
from pynama_tpu.solvers.rk import integrate, make_bs5_stepper

logger = logging.getLogger("pynama_tpu")


class BaseProblem:
    """Shared setup/orchestration.

    Parity: BaseProblem (base_problem.py:17-298).
    """

    def __init__(self, config, dtype=jnp.float64, **overrides):
        self.config = config
        self.dtype = dtype
        self.name = config.get("name", "case")

        domain = config.get("domain", {})
        self.gmsh_file = overrides.get("gmsh_file", domain.get("gmsh-file"))
        if self.gmsh_file:
            # unstructured Gmsh mesh (parity: dmplex.py:22-23); dim comes
            # from the file contents (hexes -> 3D, quads -> 2D)
            from pynama_tpu.mesh.gmsh import read_msh

            self._gmsh_data = read_msh(self.gmsh_file)
            self.dim = 3 if self._gmsh_data.hexes is not None else 2
            self.nelem = None
            self.lower = self.upper = None
        else:
            box = domain.get("box-mesh", domain)  # some reference yamls are flat
            self.nelem = tuple(overrides.get("nelem", box["nelem"]))
            self.lower = tuple(_eval_seq(box.get("lower", (0,) * len(self.nelem))))
            self.upper = tuple(_eval_seq(box.get("upper", (1,) * len(self.nelem))))
            self.dim = len(self.nelem)
        self.ngl = int(overrides.get("ngl", domain["ngl"]))
        self.dim_w = 1 if self.dim == 2 else 3
        self.dim_s = 3 if self.dim == 2 else 6

        mat = config.get("material-properties", {"rho": 1.0, "mu": 1.0})
        self.rho = float(mat["rho"])
        self.mu = float(mat["mu"])
        self.nu = self.mu / self.rho

        ts = config.get("time-solver", {})
        self.t_start = float(ts.get("start-time", 0.0))
        self.t_end = float(ts.get("end-time", 1.0))
        self.max_steps = int(ts.get("max-steps", 1000))
        self.dt0 = float(ts.get("dt0", min(0.1, (self.t_end - self.t_start) / 10 or 0.1)))
        self.ts_atol = float(ts.get("atol", 1e-4))
        self.ts_rtol = float(ts.get("rtol", 1e-4))
        md = ts.get("max-dt")
        self.ts_max_dt = float(md) if md is not None else None

        self.kle_rtol = float(config.get("kle-rtol", 1e-10))
        self.kle_maxiter = int(config.get("kle-maxiter", 5000))
        # KLE linear solver: "cg" (default; K is SPD after penalty +
        # Dirichlet masking) or "gmres" (restarted, for non-SPD penalty
        # experiments — the reference accepts any -ksp_type the same way,
        # ksp_solver.py:17). GMRES stores an (m+1, n) Arnoldi basis, so
        # it is meant for small/medium CPU studies, not the 1M-dof path.
        self.kle_solver = str(config.get("kle-solver", "cg")).lower()
        # mixed-precision iterative refinement (kle.py solve_ir): f64
        # state + TRUE f64 residuals, f32 multigrid-CG inner solves —
        # the TPU route to the reference-LU 1e-8 residual parity
        self._refine = bool(config.get("kle-refine")) and dtype == jnp.float64
        self.kle_inner_rtol = float(config.get("kle-inner-rtol", 1e-4))
        # per-round inner-tolerance scheduling (kle.py solve_ir
        # adaptive_inner); config escape hatch in case a transient shows
        # net regressions from the slightly-noisier converged iterates
        self.kle_adaptive_inner = bool(config.get("kle-adaptive-inner", True))
        # cross-step per-stage-slot warm-start extrapolation
        # (solvers/rk.py make_ws_state): each RK stage warm-starts its
        # KLE solve from the linear-in-time extrapolation of its own
        # slot's last two accepted solutions instead of the within-step
        # chain — fewer CG iterations on smooth transients at the cost
        # of 2*(stages-1) retained velocity fields
        self.kle_ws_extrapolate = bool(config.get("kle-ws-extrapolate",
                                                  False))

        bc = config.get("boundary-conditions")
        if bc is not None:
            self.read_boundary_condition(bc)

        self._setup_done = False
        self._blocked = False

    # -- hooks ----------------------------------------------------------
    def read_boundary_condition(self, bc):
        pass

    def setup_bc(self):
        """Build free-dof masks and BC value functions."""
        raise NotImplementedError

    def vel_bc(self, t):
        """Full-length velocity vector; only constrained dofs are read."""
        raise NotImplementedError

    def vort_bc(self, t, vort):
        """Clamp boundary vorticity (None-op by default)."""
        return vort

    def initial_vorticity(self):
        return jnp.zeros(self._gshape(self.dim_w), dtype=self.dtype)

    # -- setup ----------------------------------------------------------
    def setup(self):
        """Parity: BaseProblem.setUp (base_problem.py:46-51)."""
        import time as _time

        t0 = _time.perf_counter()
        marks = []

        def mark(name):
            marks.append((name, _time.perf_counter()))

        if self.gmsh_file:
            d = self._gmsh_data
            if d.hexes is not None:
                from pynama_tpu.mesh.unstructured import UnstructuredHexMesh

                self.mesh = UnstructuredHexMesh(
                    d.points, d.hexes, self.ngl,
                    boundary_quads=d.boundary_quads,
                )
            else:
                from pynama_tpu.mesh.unstructured import UnstructuredQuadMesh

                self.mesh = UnstructuredQuadMesh(
                    d.points, d.quads, self.ngl,
                    boundary_lines=d.boundary_lines,
                )
        else:
            self.mesh = BoxMesh(
                nelem=self.nelem, lower=self.lower, upper=self.upper,
                ngl=self.ngl,
            )
        mark("mesh")
        self.elem = SpectralElement(self.ngl, self.dim)
        self.system = build_kle_system(self.mesh, self.elem, self.dtype)
        self.operators = build_operators(self.mesh, self.elem, self.dtype)
        mark("system+ops")
        if self._refine:
            self.system32 = build_kle_system(self.mesh, self.elem,
                                             jnp.float32)
            mark("system32")
        self.setup_bc()
        self._setup_blocked()
        mark("bc+blocked")
        self.setup_preconditioner()
        mark("preconditioner")
        self._setup_done = True
        prev = t0
        phases = []
        for name, tm in marks:
            phases.append(f"{name} {tm - prev:.1f}s")
            prev = tm
        logger.info(
            "%s: %dD ngl=%d, %d cells, %d nodes (setup: %s)",
            self.name, self.dim, self.ngl, self.mesh.n_cells,
            self.mesh.n_nodes, ", ".join(phases),
        )
        return self

    def _gshape(self, k):
        """Solver layout of a k-components-per-node field.

        Grid-shaped on structured meshes (TPU-safe); flat interleaved on
        unstructured meshes (no grid structure to expose).
        """
        if hasattr(self.mesh, "npts"):
            return tuple(reversed(self.mesh.npts)) + (k,)
        return (self.mesh.n_nodes * k,)

    def zero_vel(self):
        return jnp.zeros(self._gshape(self.dim), dtype=self.dtype)

    # -- parity-blocked solver layout (see pynama_tpu/ops/conv.py) -------
    def _setup_blocked(self):
        """Precompute blocked masks/BC constants for the TPU hot path.

        Solver state (vorticity, velocity, CG/MG internals) runs in the
        parity-blocked layout on structured meshes: the grid<->blocked
        transposes measure ~4x the cost of one operator apply at 1M dofs,
        so they are confined to setup and IO boundaries.
        """
        self._blocked = False
        from pynama_tpu.ops.structured import _use_conv

        if not (hasattr(self.system.K, "to_blocked") and _use_conv()):
            return
        self._blocked = True
        # blocked-layout period: ngl for parity blocking, sb*(ngl-1)+1
        # when the ops super-block (ops/structured.py pick_super_factor)
        self._solver_ngl = self.system.K.eff_ngl
        for name in ("free_mask", "free_mask_fs", "bc_vort_mask",
                     "_fsfree", "_u_bc"):
            val = getattr(self, name, None)
            if val is not None:
                setattr(self, name + "_b", self._blk(val))

    def _blk(self, grid):
        from pynama_tpu.ops.conv import to_blocked

        return to_blocked(grid, getattr(self, "_solver_ngl", self.ngl))

    def _unblk(self, xb):
        from pynama_tpu.ops.conv import from_blocked

        return from_blocked(xb, getattr(self, "_solver_ngl", self.ngl),
                            tuple(reversed(self.mesh.npts)))

    def _bshape(self, k):
        from pynama_tpu.ops.conv import blocked_shape

        return blocked_shape(getattr(self, "_solver_ngl", self.ngl),
                             tuple(reversed(self.mesh.npts)), k)

    def _m(self, name):
        """Solver-layout mask/constant by name."""
        return getattr(self, name + "_b" if self._blocked else name)

    def _wlte_norm(self):
        """RK error norm over REAL dofs (layout-independent).

        The blocked layout carries zero pad slots; a plain mean would
        count them and skew the adaptive-dt controller relative to
        grid/flat runs (and the distributed path's psum norm).
        """
        n_real = self.mesh.n_nodes * self.dim_w

        def norm(err, y_old, y_new, atol, rtol):
            w = atol + rtol * jnp.maximum(jnp.abs(y_old), jnp.abs(y_new))
            e = err / w
            return jnp.sqrt(jnp.sum(e * e) / n_real)

        return norm

    def _solver_bc(self, t):
        """vel_bc in the solver layout."""
        u = self.vel_bc(t)
        return self._blk(u) if self._blocked else u

    def _kle_layout(self, vort, x0):
        """Convert solve inputs to the solver layout; return a restorer."""
        if not self._blocked:
            return vort, x0, (lambda x: x)
        if vort.ndim > 1 and vort.shape == self._bshape(self.dim_w):
            return vort, x0, (lambda x: x)
        flat = vort.ndim == 1
        if flat:
            vort = vort.reshape(self._gshape(self.dim_w))
        vort_b = self._blk(vort)
        x0_b = None
        if x0 is not None:
            if x0.ndim == 1:
                x0 = x0.reshape(self._gshape(self.dim))
            x0_b = self._blk(x0) if x0.shape != self._bshape(self.dim) else x0
        if flat:
            return vort_b, x0_b, (lambda xb: self._unblk(xb).reshape(-1))
        return vort_b, x0_b, (lambda xb: self._unblk(xb))

    def setup_preconditioner(self):
        """Geometric-multigrid preconditioner on uniform box meshes.

        Replaces the reference's factor-once LU economics
        (ksp_solver.py:14-15) with a V-cycle that keeps CG iteration
        counts mesh-independent. Disabled with config 'multigrid: false'
        or automatically when the mesh cannot be coarsened.
        """
        self._minv = None
        self._minv_fs = None
        if not self.config.get("multigrid", True):
            return
        if not getattr(self.mesh, "uniform", False):
            # gather/scatter (Gmsh) meshes: element-block additive
            # Schwarz (solvers/schwarz.py) instead of geometric MG;
            # 'unstructured-pc: jacobi' restores the plain Jacobi-CG
            if str(self.config.get("unstructured-pc", "schwarz")) \
                    != "schwarz":
                logger.info("%s: unstructured-pc=jacobi (plain Jacobi-CG)",
                            self.name)
                return
            from pynama_tpu.solvers.schwarz import build_element_schwarz

            K_el = np.asarray(self.system.K.A, dtype=np.float64)
            pc_dtype = jnp.float32 if self._refine else self.dtype

            def build_schwarz(name):
                mval = getattr(self, name, None)
                if mval is None:
                    return None
                return build_element_schwarz(
                    self.mesh, K_el, np.asarray(mval).reshape(-1),
                    pc_dtype)

            self._minv = build_schwarz("free_mask")
            self._minv_fs = build_schwarz("free_mask_fs")
            if self._minv is not None:
                logger.info(
                    "%s: element-Schwarz preconditioner on unstructured "
                    "mesh (%d blocks of %d dofs)", self.name,
                    self.mesh.n_cells, self.elem.nnode * self.dim,
                )
            return
        from pynama_tpu.solvers.multigrid import MGPreconditioner

        mgc = self.config.get("multigrid", True)
        opts = mgc if isinstance(mgc, dict) else {}
        # under f64 iterative refinement the V-cycle only preconditions
        # the f32 inner solves; f64 emulation makes it ~200x slower on TPU
        mg_dtype = jnp.float32 if self._refine else self.dtype
        mg = MGPreconditioner(
            self.mesh, self.elem, dtype=mg_dtype,
            pre_smooth=int(opts.get("pre", 3)),
            post_smooth=int(opts.get("post", 3)),
            smoother=opts.get("smoother", "patch"),
            cheb_div=opts.get("cheb-div"),
            galerkin=bool(opts.get("galerkin", True)),
        )
        if not mg.usable:
            logger.warning(
                "%s: no multigrid hierarchy for nelem=%s (needs axes "
                "divisible by 2/3/5 down to ~%d dofs); KLE solves fall "
                "back to Jacobi-CG", self.name, self.nelem,
                1500,
            )
            return
        self.mg = mg

        def build_mask(name):
            m = self._m(name)
            return mg.build(m.astype(mg_dtype) if self._refine else m)

        if hasattr(self, "free_mask"):
            self._minv = build_mask("free_mask")
        if getattr(self, "free_mask_fs", None) is not None:
            self._minv_fs = build_mask("free_mask_fs")

    # -- solves ----------------------------------------------------------
    def solve_kle(self, t, vort, x0=None):
        raise NotImplementedError

    def _kle_solve_aux(self, t, vort, vel_ws):
        """Stage KLE solve; returns (vel, aux_next).

        aux is the warm-start state threaded through RK stages — a single
        velocity here; dual-mask problems override to carry a pair so each
        system warm-starts from its own previous solution.
        """
        vel = self.solve_kle(t, vort, x0=vel_ws)
        return vel, vel

    def _aux_vel(self, aux):
        """The reportable velocity component of a warm-start aux."""
        return aux[-1] if isinstance(aux, tuple) else aux

    def transport_rhs(self, t, vort, vel_ws):
        """d(vort)/dt given vorticity; aux = warm-start state (pytree).

        Parity: BaseProblem.evalRHS (base_problem.py:212-232).
        Layout-preserving: blocked state passes straight through the
        blocked solver path; grid/flat callers convert at this boundary.
        """
        blocked_in = (self._blocked and vort.ndim > 1
                      and vort.shape == self._bshape(self.dim_w))
        if self._blocked and not blocked_in:
            flat = vort.ndim == 1
            if flat:
                vort = vort.reshape(self._gshape(self.dim_w))
                vel_ws = jax.tree.map(
                    lambda v: v.reshape(self._gshape(self.dim)), vel_ws)
            vort = self._blk(vort)
            vel_ws = jax.tree.map(self._blk, vel_ws)
        vort = self.vort_bc(t, vort)
        vel, aux = self._kle_solve_aux(t, vort, vel_ws)
        f = ns_rhs(self.operators, vel, self.mu, self.rho, self.dim)
        if self._blocked and not blocked_in:
            f, aux = self._unblk(f), jax.tree.map(self._unblk, aux)
            if flat:
                f = f.reshape(-1)
                aux = jax.tree.map(lambda v: v.reshape(-1), aux)
        return f, aux

    # -- transient -------------------------------------------------------
    def run(
        self,
        callback: Optional[Callable] = None,
        max_steps=None,
        checkpoint_path: Optional[str] = None,
        checkpoint_every: int = 0,
        resume_from: Optional[str] = None,
    ):
        """Advance vorticity from t_start to t_end adaptively.

        Parity: BaseProblem.startSolver + TS loop (base_problem.py:254-257).
        Checkpoint/resume is NEW relative to the reference (SURVEY.md
        section 5): pass checkpoint_path+checkpoint_every to persist
        (step, t, dt, vort, vel, f1); resume_from restores them.
        """
        assert self._setup_done
        dtype = self.dtype
        ws = self.kle_ws_extrapolate

        def rhs(t, w, aux):
            return self.transport_rhs(t, w, aux)

        step = jax.jit(make_bs5_stepper(rhs, atol=self.ts_atol,
                                        rtol=self.ts_rtol,
                                        wlte_norm=self._wlte_norm(),
                                        max_dt=self.ts_max_dt,
                                        ws_extrapolate=ws))

        def aux_vel(aux):
            from pynama_tpu.solvers.rk import ws_aux_vel

            return self._aux_vel(ws_aux_vel(aux) if ws else aux)

        # state lives in the solver layout (parity-blocked on TPU meshes);
        # grid/flat only at the IO boundaries below
        blk = self._blk if self._blocked else (lambda x: x)
        unblk = self._unblk if self._blocked else (lambda x: x)
        if resume_from:
            from pynama_tpu.io.checkpoint import load_checkpoint

            ck = load_checkpoint(resume_from)
            vort = blk(jnp.asarray(
                ck["vort"].reshape(self._gshape(self.dim_w)), dtype=dtype))
            vel = blk(jnp.asarray(
                ck["vel"].reshape(self._gshape(self.dim)), dtype=dtype))
            f1 = blk(jnp.asarray(
                ck["f1"].reshape(self._gshape(self.dim_w)), dtype=dtype))
            t = jnp.asarray(ck["t"], dtype=dtype)
            dt = jnp.asarray(ck["dt"], dtype=dtype)
            n = ck["step"]
            if ws:
                # the slot history needs the steady aux STRUCTURE (dual
                # problems carry a pair); one extra RHS eval rebuilds it
                _, vel = rhs(t, vort, vel)
        else:
            vort = blk(self.initial_vorticity())
            vel = blk(self.zero_vel())
            t = jnp.asarray(self.t_start, dtype=dtype)
            dt = jnp.asarray(self.dt0, dtype=dtype)
            f1, vel = rhs(t, vort, vel)
            n = 0
        if ws:
            from pynama_tpu.solvers.rk import make_ws_state

            vel = make_ws_state(vel, t)

        t_end = jnp.asarray(self.t_end, dtype=dtype)
        steps = max_steps if max_steps is not None else self.max_steps
        while float(t) < float(t_end) - 1e-14 and n < steps:
            res = step(vort, t, dt, vel, f1, t_end)
            vort, t, dt, vel, f1 = res.y, res.t, res.dt_next, res.aux, res.f_new
            n += 1
            if callback is not None:
                callback(n, float(t), float(dt), unblk(vort),
                         unblk(aux_vel(vel)))
            if checkpoint_path and checkpoint_every and n % checkpoint_every == 0:
                from pynama_tpu.io.checkpoint import save_checkpoint

                save_checkpoint(
                    checkpoint_path, step=n, t=float(t), dt=float(dt),
                    vort=np.asarray(unblk(vort)).reshape(-1),
                    vel=np.asarray(unblk(aux_vel(vel))).reshape(-1),
                    f1=np.asarray(unblk(f1)).reshape(-1),
                )
        # public attributes stay flat (interleaved-dof) at the API boundary
        self.vort = jnp.asarray(np.asarray(unblk(vort)).reshape(-1))
        self.vel = jnp.asarray(
            np.asarray(unblk(self.solve_kle(t, vort))).reshape(-1)
        )
        return self.vort, float(t), n


class FreeSlipProblem(BaseProblem):
    """Every boundary node fully Dirichlet-constrained.

    Parity: FreeSlip (base_problem.py:456-552).
    """

    def setup_bc(self):
        mask = np.ones(self.mesh.n_nodes * self.dim)
        bdofs = self.mesh.node_dofs(self.mesh.boundary_nodes, self.dim)
        mask[bdofs] = 0.0
        self.free_mask = jnp.asarray(
            mask.reshape(self._gshape(self.dim)), dtype=self.dtype
        )
        wmask = np.zeros(self.mesh.n_nodes * self.dim_w)
        wmask[self.mesh.node_dofs(self.mesh.boundary_nodes, self.dim_w)] = 1.0
        self.bc_vort_mask = jnp.asarray(
            wmask.reshape(self._gshape(self.dim_w)), dtype=self.dtype
        )

    def solve_kle(self, t, vort, x0=None, rtol=None, maxiter=None, restarts=1):
        """Parity: FreeSlip.solveKLE (base_problem.py:479-481).

        restarts=1 in the transient hot path (warm starts make refinement
        unnecessary); accuracy gates pass restarts=2. Result layout
        matches the caller's vort layout (solver runs blocked on TPU).
        """
        vort, x0, restore = self._kle_layout(vort, x0)
        mask = self._m("free_mask")
        if self._refine:
            from pynama_tpu.kle import solve_ir

            res = solve_ir(
                self.system, self.system32, vort, self._solver_bc(t),
                mask, mask.astype(jnp.float32), x0=x0,
                rtol=rtol if rtol is not None else self.kle_rtol,
                maxiter=maxiter if maxiter is not None else self.kle_maxiter,
                inner_rtol=self.kle_inner_rtol,
                adaptive_inner=self.kle_adaptive_inner,
                m_inv32=getattr(self, "_minv", None),
            )
            return restore(res.x)
        if self.kle_solver == "gmres":
            return restore(self._gmres_kle(
                vort, self._solver_bc(t), mask, x0,
                rtol if rtol is not None else self.kle_rtol,
                maxiter if maxiter is not None else self.kle_maxiter,
            ))
        res = self.system.solve(
            vort,
            self._solver_bc(t),
            mask,
            x0=x0,
            rtol=rtol if rtol is not None else self.kle_rtol,
            maxiter=maxiter if maxiter is not None else self.kle_maxiter,
            restarts=restarts,
            m_inv=getattr(self, "_minv", None),
        )
        return restore(res.x)

    def _gmres_kle(self, vort, u_bc, mask, x0, rtol, maxiter,
                   m_inv=None):
        """KLE solve via restarted GMRES (config 'kle-solver: gmres').

        Same masked system and MG/Jacobi preconditioning as the CG path;
        the Arnoldi basis works on raveled vectors, so this path targets
        CPU / moderate sizes (the >=500-pts-per-axis TPU reshape hazard
        and the (m+1, n) basis memory both rule out the 1M-dof path).
        """
        from pynama_tpu.solvers.gmres import gmres_solve

        b = self.system.rhs(vort, u_bc, mask)
        shape = b.shape
        if x0 is None:
            x0 = (1.0 - mask) * u_bc
        else:
            x0 = mask * x0 + (1.0 - mask) * u_bc
        if m_inv is None:
            m_inv = getattr(self, "_minv", None)
        if m_inv is None:
            jm = self.system.jacobi_inv(mask)
            m_fn = lambda r: (jm * r.reshape(shape)).ravel()
        else:
            m_fn = lambda r: m_inv(r.reshape(shape)).ravel()
        res = gmres_solve(
            lambda v: self.system.apply_masked(
                v.reshape(shape), mask).ravel(),
            b.ravel(), x0=x0.ravel(), m_inv=m_fn,
            rtol=rtol, maxiter=maxiter,
        )
        return res.x.reshape(shape)

    def kle_error(self, viscous_times, exact_fields):
        """||u - u_exact||_2 for KLE solves at t = tau^2/(4 nu).

        Parity: FreeSlip.getKLEError (base_problem.py:483-497).
        exact_fields(t) -> (vel (N,dim), vort (N,dim_w)) jnp arrays.
        """
        errors = []
        for tau in viscous_times:
            t = (tau**2) / (4.0 * self.nu)
            vel_e, vort_e = exact_fields(t)
            u = self.solve_kle(
                t, jnp.asarray(np.asarray(vort_e).reshape(self._gshape(self.dim_w))),
                rtol=1e-13, maxiter=30000, restarts=2,
            )
            diff = np.asarray(u).reshape(-1) - np.asarray(vel_e).reshape(-1)
            errors.append(float(np.linalg.norm(diff)))
        return errors


_EVAL_NAMES = {"__builtins__": {}}
_EVAL_LOCALS = {
    "pi": np.pi, "e": np.e, "sqrt": np.sqrt, "sin": np.sin, "cos": np.cos,
}


def _eval_scalar(v):
    """Evaluate a YAML scalar that may be a math expression like '2*pi'.

    Restricted namespace (no builtins, math names only) — the reference
    uses bare eval() on its yaml values, an unnecessary hazard to copy.
    """
    if isinstance(v, str):
        return float(eval(v, _EVAL_NAMES, _EVAL_LOCALS))
    return float(v)


def _eval_seq(seq):
    return [_eval_scalar(v) for v in seq]
