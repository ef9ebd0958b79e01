"""Immersed-boundary flow cases: static and moving bodies in a free stream.

Parity: /root/reference/src/cases/immersed_boundary.py
(ImmersedBoundaryStatic :19-333, ImmersedBoundaryDynamic :335-434).
Far-field uniform flow from Re or velocity config; regularized-delta
coupling enforces the body velocity after every transport step; drag/lift
coefficients integrate the virtual flux.
"""

from math import cos, radians, sin

import jax
import jax.numpy as jnp
import numpy as np

from pynama_tpu.cases.base import FreeSlipProblem
from pynama_tpu.ibm.bodies import BodiesContainer
from pynama_tpu.ibm.coupling import IBMCoupling
from pynama_tpu.solvers.rk import make_bs5_stepper


class ImmersedBoundaryProblem(FreeSlipProblem):
    """Static bodies. Parity: ImmersedBoundaryStatic."""

    def read_boundary_condition(self, bc):
        """Free-stream velocity from Re/direction/longRef or explicit vel.

        Parity: immersed_boundary.py:29-46.
        """
        if "constant" in bc and "re" in bc["constant"]:
            c = bc["constant"]
            re = float(c["re"])
            angle = radians(float(c.get("direction", 0)))
            from pynama_tpu.cases.base import _eval_scalar

            L = _eval_scalar(c.get("longRef", 1.0))
            u_ref = re * (self.mu / self.rho) / L
            self.u_ref = u_ref
            self.cte_value = [cos(angle) * u_ref, sin(angle) * u_ref]
            self.re = re
        else:
            vel = bc["constant"]["vel"]
            self.u_ref = float(vel[0])
            self.cte_value = [self.u_ref, 0.0]
            self.re = self.u_ref / self.nu

    def setup(self):
        super().setup()
        # fine-grid spacing h (parity: immersed_boundary.py:48-58; the
        # reference's box formula (upper[1]-lower[0])/nelem[0] is only
        # right for square symmetric boxes — use the true min spacing)
        if self.gmsh_file:
            hmin = self.config["domain"].get("h-min")
            if hmin is None:
                raise ValueError(
                    "IBM on a gmsh-file domain needs 'h-min' "
                    "(parity: immersed_boundary.py:55-56)"
                )
            from pynama_tpu.cases.base import _eval_scalar

            self.h = _eval_scalar(hmin) / (self.ngl - 1)
        else:
            spacing = min(
                (self.upper[i] - self.lower[i]) / self.nelem[i]
                for i in range(self.dim)
            )
            self.h = spacing / (self.ngl - 1)
        bodies_cfg = self.config.get("bodies")
        if not bodies_cfg:
            raise ValueError("IBM case needs a 'bodies' config section")
        self.body = BodiesContainer(bodies_cfg).create(self.h)
        self.body.set_vel_ref(self.u_ref)
        if self.gmsh_file:
            # static bodies on locally-uniform gmsh regions: host-side
            # window precompute (parity: immersed_boundary.py:55-58 runs
            # IBM on DMPlex meshes with 'h-min' as the IBM spacing)
            from pynama_tpu.ibm.coupling import (LatticeIBMCoupling,
                                                 UnstructuredIBMCoupling)

            if self.body.is_moving:
                # moving bodies: snap the locally-uniform region onto a
                # virtual lattice once (envelope = bounding box of the
                # prescribed kinematics over the run, sampled densely),
                # then the on-device box-window path runs per step with
                # static shapes (parity: immersed_boundary.py:335-434,
                # which reassembles H/S/KSP from scratch every step)
                ts = np.linspace(self.t_start, self.t_end, 257)
                # the prescribed oscillation (period Te = f/U) can be much
                # shorter than the run: also sample its first period
                # densely so the envelope catches the true peaks
                Te = 5.0 / max(abs(self.u_ref), 1e-30)
                ts = np.concatenate(
                    [ts, self.t_start + Te * np.linspace(0.0, 1.0, 257)]
                )
                pts = np.concatenate([self.body.coords_at(float(tt))
                                      for tt in ts])
                self.coupling = LatticeIBMCoupling(
                    self.mesh, self.body.dl, dtype=self.dtype,
                    h_min=self.h,
                    envelope=(pts.min(axis=0), pts.max(axis=0)),
                )
            else:
                self.coupling = UnstructuredIBMCoupling(
                    self.mesh, self.body.dl, dtype=self.dtype, h_min=self.h
                )
                self.coupling.windows_host(self.body.coords_at(0.0))
        else:
            self.coupling = IBMCoupling(self.mesh, self.body.dl,
                                        dtype=self.dtype)
        self.cd_history = []
        self.cl_history = []
        self.t_history = []
        # raw (uncorrected) force coefficients + the step dt they used:
        # cd_raw(dt) = cd_phys + floor/dt, so two fixed-dt segments give
        # the dt-independent physical drag by Richardson elimination:
        #   cd_phys = (cd_A*dt_A - cd_B*dt_B) / (dt_A - dt_B)
        self.cd_raw_history = []
        self.cl_raw_history = []
        self.dt_history = []
        return self

    def setup_bc(self):
        super().setup_bc()
        u = np.tile(np.asarray(self.cte_value), self.mesh.n_nodes)
        self._u_bc = jnp.asarray(
            u.reshape(self._gshape(self.dim)), dtype=self.dtype
        )

    def vel_bc(self, t):
        return self._u_bc

    def vort_bc(self, t, vort):
        """Far-field vorticity clamped to zero
        (parity: immersed_boundary.py:199-203)."""
        m = self.bc_vort_mask
        if vort.ndim > 1 and vort.shape != m.shape:  # blocked layout
            m = self.bc_vort_mask_b
        return vort * (1.0 - m)

    # ------------------------------------------------------------------
    def _post_step_fn(self):
        """jitted: (t, vort, vel_ws, Xb, Ub) -> (vort', vel', q).

        Parity: the per-step sequence of startSolver
        (immersed_boundary.py:100-110): solveKLE -> velocity correction ->
        vort = Curl(vel).
        """

        def post(t, vort, vel_ws, Xb, Ub):
            vel = self.solve_kle(t, vort, x0=vel_ws)
            nodes, weights = self.coupling.windows(Xb)
            # the coupling works on flat interleaved dofs (IBM meshes are
            # small; the TPU reshape issue needs >500 pts/axis)
            vel_f, q = self.coupling.solve_correction(
                vel.reshape(-1), Ub, nodes, weights
            )
            vel = vel_f.reshape(vel.shape)
            vort_new = self.operators.curl(vel)
            return vort_new, vel, q

        return jax.jit(post)

    def run(self, callback=None, max_steps=None, save_forces_every=1,
            checkpoint_path=None, checkpoint_every=0, resume_from=None):
        """Custom transport + correction loop.

        Parity: ImmersedBoundaryStatic.startSolver
        (immersed_boundary.py:84-143) / Dynamic (:338-397). Checkpoint/
        resume (NEW vs reference) persists vorticity + force history.
        """
        assert self._setup_done
        dtype = self.dtype

        def rhs(tt, ww, aux):
            return self.transport_rhs(tt, ww, aux)

        step = jax.jit(make_bs5_stepper(rhs, atol=self.ts_atol,
                                        rtol=self.ts_rtol,
                                        wlte_norm=self._wlte_norm(),
                                        max_dt=self.ts_max_dt))
        rhs_jit = jax.jit(rhs)
        post = self._post_step_fn()
        t_end = jnp.asarray(self.t_end, dtype=dtype)

        if resume_from:
            from pynama_tpu.io.checkpoint import load_checkpoint

            ck = load_checkpoint(resume_from)
            vort = jnp.asarray(ck["vort"].reshape(self._gshape(self.dim_w)),
                               dtype=dtype)
            vel = jnp.asarray(ck["vel"].reshape(self._gshape(self.dim)),
                              dtype=dtype)
            f1 = jnp.asarray(ck["f1"].reshape(self._gshape(self.dim_w)),
                             dtype=dtype)
            t = jnp.asarray(ck["t"], dtype=dtype)
            dt = jnp.asarray(ck["dt"], dtype=dtype)
            n = ck["step"]
            hist = ck.get("extra", {})
            self.cd_history = hist.get("cd", [])
            self.cl_history = hist.get("cl", [])
            self.t_history = hist.get("times", [])
            Xb = jnp.asarray(self.body.coords_at(float(t)), dtype=dtype)
            Ub = jnp.asarray(self.body.velocity_at(float(t)), dtype=dtype)
        else:
            vort = self.initial_vorticity()
            vel = self.zero_vel()
            t = jnp.asarray(self.t_start, dtype=dtype)
            dt = jnp.asarray(self.dt0, dtype=dtype)
            # initial condition: zero vorticity, KLE solve + correction
            # (parity: computeInitialCondition, immersed_boundary.py:161-171)
            Xb = jnp.asarray(self.body.coords_at(float(t)), dtype=dtype)
            Ub = jnp.asarray(self.body.velocity_at(float(t)), dtype=dtype)
            vort, vel, _ = post(t, vort, vel, Xb, Ub)
            f1, _ = rhs(t, vort, vel)
            n = 0
        vel_ws = vel
        steps = max_steps if max_steps is not None else self.max_steps
        while float(t) < float(t_end) - 1e-14 and n < steps:
            t_before = float(t)
            res = step(vort, t, dt, vel_ws, f1, t_end)
            t, dt = res.t, res.dt_next
            # the step actually taken (res.dt_next is the NEXT proposal and
            # t_history is only appended every save_forces_every steps, so
            # neither is the right force-scaling denominator)
            used_dt = float(t) - t_before
            if self.body.is_moving:
                Xb = jnp.asarray(self.body.coords_at(float(t)), dtype=dtype)
                Ub = jnp.asarray(self.body.velocity_at(float(t)), dtype=dtype)
            vort, vel, q = post(t, res.y, res.aux, Xb, Ub)
            # FSAL is invalid once the velocity correction replaced the
            # solution: recompute the stage-1 derivative from the corrected
            # state (the reference re-evaluates the RHS after
            # ts.setSolution, immersed_boundary.py:108-110). ``vel`` stays
            # the corrected (no-slip-on-body) field for reporting; the KLE
            # velocity only seeds the next step's warm start.
            f1, vel_ws = rhs_jit(t, vort, vel)
            n += 1
            if n % save_forces_every == 0:
                # force on the body from the virtual flux:
                #   F = -rho * sum_l q_l * dl * h / dt,  cd = F/(0.5 rho U^2 D)
                # The reference's computeDragForce (immersed_boundary.py:
                # 145-158) uses sum(q)/(0.5 U^2 dt) — fluid-frame sign and
                # unnormalized by dl*h/D; this version is the physical
                # body-drag coefficient. The raw flux also contains a
                # dt-INDEPENDENT component: the curl->KLE round trip does
                # not exactly reproduce the corrected velocity at the body
                # (delta-sheet discretization), so each step's q re-covers
                # that reconstruction floor in addition to the physical
                # dt-proportional momentum transfer. Measure the floor as
                # the flux of a zero-dt round trip (post() on the already-
                # corrected state) and subtract it — without this the drag
                # scales like cd_phys + floor/dt and coarse grids
                # overestimate badly (measured: Re=40 cylinder 2.48 raw vs
                # ~1.6 literature).
                _, _, q_floor = post(t, vort, vel_ws, Xb, Ub)
                D = self.body.bodies[0].char_length()
                dlh = self.body.dl * self.h
                denom = -0.5 * self.u_ref**2 * D * max(used_dt, 1e-30) / dlh
                forces = self.body.split_forces(np.asarray(q - q_floor),
                                                denom)
                raw = self.body.split_forces(np.asarray(q), denom)
                self.cd_history.append([f[0] for f in forces])
                self.cl_history.append([f[1] for f in forces])
                self.cd_raw_history.append([f[0] for f in raw])
                self.cl_raw_history.append([f[1] for f in raw])
                self.dt_history.append(used_dt)
                self.t_history.append(float(t))
            if callback is not None:
                callback(n, float(t), float(dt), vort, vel)
            if checkpoint_path and checkpoint_every and n % checkpoint_every == 0:
                from pynama_tpu.io.checkpoint import save_checkpoint

                save_checkpoint(
                    checkpoint_path, step=n, t=float(t), dt=float(dt),
                    vort=np.asarray(vort).reshape(-1),
                    vel=np.asarray(vel).reshape(-1),
                    f1=np.asarray(f1).reshape(-1),
                    extra={"cd": self.cd_history, "cl": self.cl_history,
                           "times": self.t_history},
                )
        self.vort = jnp.asarray(np.asarray(vort).reshape(-1))
        self.vel = jnp.asarray(np.asarray(vel).reshape(-1))
        return self.vort, float(t), n


class ImmersedBoundaryDynamicProblem(ImmersedBoundaryProblem):
    """Moving bodies: same machinery — windows/weights are recomputed from
    the body position each step with static shapes, so nothing is rebuilt
    (the reference destroys and reassembles H/S/KSP every step,
    immersed_boundary.py:428-434)."""

    def setup(self):
        super().setup()
        for b in self.body.bodies:
            b.is_moving = True
        return self
