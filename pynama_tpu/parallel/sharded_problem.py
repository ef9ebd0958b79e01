"""Distributed Navier-Stokes stepping: the full KLE + transport + BS5(4)
machinery under shard_map on a 1D device mesh.

This is the TPU equivalent of running the reference under `mpirun -n P`
(/root/reference/makefile:2-7): the mesh is slab-partitioned
(SlabDecomposition), all elemental operator applies are device-local with
one-plane halo exchange over ICI, CG dot products and RK error norms are
psum-reduced, and one adaptive time step compiles to a single SPMD XLA
program.

Works for both the single-mask FreeSlip problems and the dual-mask
no-slip/free-slip cavity solve.
"""

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from pynama_tpu.kle import v_tens_v
from pynama_tpu.parallel.slab import (
    AXIS,
    SlabDecomposition,
    local_element_apply,
)
from pynama_tpu.solvers.cg import cg_solve
from pynama_tpu.solvers.rk import make_bs5_stepper


class ShardedNSProblem:
    """Slab-distributed wrapper around a set-up BaseProblem subclass."""

    def __init__(self, problem, n_dev: int, devices=None):
        self.p = problem
        self.slab = SlabDecomposition(problem.mesh, n_dev)
        self.n_dev = n_dev
        sl = self.slab
        m = problem.mesh
        dim, dim_w, dim_s = m.dim, m.dim_w, m.dim_s
        dt = problem.dtype

        def arr(x):
            return jnp.asarray(x, dtype=dt)

        # dof tables (P, cells_loc, k) and plane sizes per dof family
        self.vdofs = jnp.asarray(sl.local_cell_dofs(dim))
        self.wdofs = jnp.asarray(sl.local_cell_dofs(dim_w))
        self.sdofs = jnp.asarray(sl.local_cell_dofs(dim_s))
        self.plane = sl.plane
        self.n_loc = sl.n_loc

        # shared elemental matrices (replicated)
        sysm, ops = problem.system, problem.operators
        self.K_el, self.Rw_el = sysm.K.A, sysm.Rw.A
        self.Curl_el, self.SrT_el, self.Div_el = ops.Curl.A, ops.SrT.A, ops.DivSrT.A

        # distributed vectors (P, n_loc*k)
        self.diag_K = arr(sl.to_local(sysm.diag_K, dim))
        self.w_curl = arr(sl.to_local(ops.w_curl, dim_w))
        self.w_srt = arr(sl.to_local(ops.w_srt, dim_s))
        self.w_div = arr(sl.to_local(ops.w_div, dim))
        self.mask = arr(sl.to_local(np.asarray(problem.free_mask).reshape(-1), dim))
        fm_fs = getattr(problem, "free_mask_fs", None)
        self.mask_fs = (arr(sl.to_local(np.asarray(fm_fs).reshape(-1), dim))
                        if fm_fs is not None else None)
        self.own_v = arr(sl.owned_weights(dim))
        self.own_w = arr(sl.owned_weights(dim_w))
        self.coords = arr(sl.to_local(np.asarray(m.coords).reshape(-1), dim)).reshape(
            n_dev, -1, dim
        )

        # BC value providers: static vector or analytic function of (coords, t)
        self.vel_fn = getattr(problem, "vel_fn", None)
        self.vort_fn = getattr(problem, "vort_fn", None)
        if self.vel_fn is None:
            self.u_bc = arr(sl.to_local(np.asarray(problem.vel_bc(0.0)).reshape(-1), dim))
        else:
            self.u_bc = None
        bcw = getattr(problem, "bc_vort_mask", None)
        self.bc_vort_mask = (arr(sl.to_local(np.asarray(bcw).reshape(-1), dim_w))
                             if bcw is not None else None)

        self.mesh_dev = sl.device_mesh(devices)
        self.sharding = NamedSharding(self.mesh_dev, P(AXIS))
        self.repl = NamedSharding(self.mesh_dev, P())
        self.n_vel_global = m.n_nodes * dim
        self.n_vort_global = m.n_nodes * dim_w

    # ------------------------------------------------------------------
    def shard(self, x_global, k):
        """Host global vector -> device-sharded stacked local blocks."""
        loc = self.slab.to_local(np.asarray(x_global), k)
        return jax.device_put(jnp.asarray(loc, dtype=self.p.dtype), self.sharding)

    def unshard(self, x_stacked, k):
        return self.slab.from_local(np.asarray(x_stacked), k)

    # ------------------------------------------------------------------
    def _local_fns(self):
        """Build the inside-shard_map physics, closing over replicated data."""
        p, nd = self.p, self.n_dev
        dim, dim_w, dim_s = p.dim, p.dim_w, p.dim_s
        nv = self.n_loc * dim
        nw = self.n_loc * dim_w
        ns = self.n_loc * dim_s
        pk_v, pk_w, pk_s = self.plane * dim, self.plane * dim_w, self.plane * dim_s
        K_el, Rw_el = self.K_el, self.Rw_el
        Curl_el, SrT_el, Div_el = self.Curl_el, self.SrT_el, self.Div_el
        mu, rho = p.mu, p.rho

        def K_apply(vd, x):
            return local_element_apply(K_el, x, vd, vd, nv, pk_v, nd)

        def Rw_apply(vd, wd, w):
            return local_element_apply(Rw_el, w, wd, vd, nv, pk_v, nd)

        def solve_masked(vd, wd, diag, mask, vort, u_bc, x0, pdot, rtol, maxiter):
            bc = (1.0 - mask) * u_bc
            b = mask * (Rw_apply(vd, wd, vort) - K_apply(vd, bc)) + bc
            m_inv = 1.0 / (mask * diag + (1.0 - mask))

            def A(x):
                return mask * K_apply(vd, mask * x) + (1.0 - mask) * x

            x0 = mask * x0 + bc
            res = cg_solve(A, b, x0=x0, m_inv=m_inv, rtol=rtol,
                           maxiter=maxiter, dot=pdot)
            return res.x

        def curl(vd, wd, wc, u):
            return local_element_apply(Curl_el, u, vd, wd, nw, pk_w, nd) / wc

        def srt(vd, sd, ws, u):
            return local_element_apply(SrT_el, u, vd, sd, ns, pk_s, nd) / ws

        def div_srt(sd, vd, wv, s):
            return local_element_apply(Div_el, s, sd, vd, nv, pk_v, nd) / wv

        def transport_rhs(loc, t, vort, vel_ws, pdot, rtol, maxiter):
            (vd, wd, sd, diag, mask, mask_fs, wc, ws, wv, u_bc_static, coords,
             bcw) = loc
            if self.vel_fn is not None:
                u_bc = self.vel_fn(coords, p.nu, t).reshape(-1)
            else:
                u_bc = u_bc_static
            if self.vort_fn is not None and bcw is not None:
                exact_w = self.vort_fn(coords, p.nu, t).reshape(-1)
                vort = vort * (1.0 - bcw) + exact_w * bcw
            if mask_fs is not None:
                vel_fs = solve_masked(vd, wd, diag, mask_fs, vort, u_bc,
                                      vel_ws, pdot, rtol, maxiter)
                fsfree = mask_fs - mask
                vel_fs = vel_fs * (1.0 - fsfree) + u_bc * fsfree
                vort2 = curl(vd, wd, wc, vel_fs)
                vel = solve_masked(vd, wd, diag, mask, vort2, u_bc,
                                   vel_fs, pdot, rtol, maxiter)
            else:
                vel = solve_masked(vd, wd, diag, mask, vort, u_bc,
                                   vel_ws, pdot, rtol, maxiter)
            aux = 2.0 * mu * srt(vd, sd, ws, vel) - rho * v_tens_v(vel, dim)
            r = div_srt(sd, vd, wv, aux) / rho
            return curl(vd, wd, wc, r), vel

        return transport_rhs

    # ------------------------------------------------------------------
    def build_step(self, kle_rtol=None, kle_maxiter=None, atol=None, rtol=None):
        """jit-compiled distributed adaptive step: (w, t, dt, vel, f1) -> ...

        The returned function takes stacked-sharded (P, n_loc*k) arrays and
        replicated scalars and runs ONE accepted BS5(4) step as a single
        SPMD program.
        """
        p = self.p
        kle_rtol = kle_rtol if kle_rtol is not None else p.kle_rtol
        kle_maxiter = kle_maxiter if kle_maxiter is not None else p.kle_maxiter
        atol = atol if atol is not None else p.ts_atol
        rtol = rtol if rtol is not None else p.ts_rtol
        transport_rhs = self._local_fns()
        n_glob_w = self.n_vort_global

        from jax import shard_map

        spec_d = P(AXIS)
        spec_r = P()
        has_fs = self.mask_fs is not None
        has_ubc = self.u_bc is not None
        has_bcw = self.bc_vort_mask is not None

        def body(vdofs, wdofs, sdofs, diag, mask, maskfs, wc, ws, wv, ubc,
                 coords, bcw, own_v, own_w, w, t, dt, vel, f1, t_end):
            sq = lambda x: x[0]
            loc = (sq(vdofs), sq(wdofs), sq(sdofs), sq(diag), sq(mask),
                   sq(maskfs) if has_fs else None, sq(wc), sq(ws), sq(wv),
                   sq(ubc) if has_ubc else None, sq(coords),
                   sq(bcw) if has_bcw else None)
            ov = sq(own_v)
            ow = sq(own_w)

            def pdot(a, b):
                return jax.lax.psum(jnp.sum(a * b * ov), AXIS)

            def rhs(tt, ww, aux):
                return transport_rhs(loc, tt, ww, aux, pdot, kle_rtol, kle_maxiter)

            def wlte_norm(err, y_old, y_new, a, r):
                wgt = a + r * jnp.maximum(jnp.abs(y_old), jnp.abs(y_new))
                e = err / wgt
                s = jax.lax.psum(jnp.sum(e * e * ow), AXIS)
                return jnp.sqrt(s / n_glob_w)

            step_fn = make_bs5_stepper(rhs, atol=atol, rtol=rtol,
                                       wlte_norm=wlte_norm)
            res = step_fn(sq(w), t, dt, sq(vel), sq(f1), t_end)
            return (res.y[None], res.t, res.dt_next, res.aux[None],
                    res.f_new[None], res.wlte)

        in_specs = tuple([spec_d] * 14 + [spec_d, spec_r, spec_r, spec_d,
                                          spec_d, spec_r])
        out_specs = (spec_d, spec_r, spec_r, spec_d, spec_d, spec_r)
        fn = shard_map(
            body, mesh=self.mesh_dev, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )

        statics = (self.vdofs, self.wdofs, self.sdofs, self.diag_K, self.mask,
                   self.mask_fs if has_fs else self.mask,
                   self.w_curl, self.w_srt, self.w_div,
                   self.u_bc if has_ubc else self.diag_K, self.coords,
                   self.bc_vort_mask if has_bcw else self.w_curl)

        @jax.jit
        def step(w, t, dt, vel, f1, t_end):
            return fn(*statics, self.own_v, self.own_w, w, t, dt, vel, f1,
                      t_end)

        return step

    # ------------------------------------------------------------------
    def run(self, max_steps=None, callback=None):
        """Distributed transient run (host loop over jitted SPMD steps)."""
        p = self.p
        step = self.build_step()
        w = self.shard(np.asarray(p.initial_vorticity()).reshape(-1), p.dim_w)
        vel = self.shard(np.zeros(p.mesh.n_nodes * p.dim), p.dim)
        t = jnp.asarray(p.t_start, dtype=p.dtype)
        dt = jnp.asarray(p.dt0, dtype=p.dtype)
        t_end = jnp.asarray(p.t_end, dtype=p.dtype)

        # initial FSAL derivative: one distributed rhs eval via a 0-dt trick
        # (cheap alternative: evaluate through the first step's attempt)
        f1 = jnp.zeros_like(w)
        # bootstrap: treat f1=0 for the very first attempt; the embedded
        # error will reject and retry with the proper controller if needed.
        # Cleaner: evaluate the rhs once distributed:
        f1 = self._eval_rhs_once(w, t, vel)

        n = 0
        steps = max_steps if max_steps is not None else p.max_steps
        while float(t) < float(t_end) - 1e-14 and n < steps:
            w, t, dt, vel, f1, wlte = step(w, t, dt, vel, f1, t_end)
            n += 1
            if callback is not None:
                callback(n, float(t), float(dt), w, vel)
        return w, float(t), n

    def _eval_rhs_once(self, w, t, vel):
        transport_rhs = self._local_fns()
        from jax import shard_map

        spec_d = P(AXIS)
        has_fs = self.mask_fs is not None
        has_ubc = self.u_bc is not None
        has_bcw = self.bc_vort_mask is not None

        def body(vdofs, wdofs, sdofs, diag, mask, maskfs, wc, ws, wv, ubc,
                 coords, bcw, own_v, w, vel, t):
            sq = lambda x: x[0]
            loc = (sq(vdofs), sq(wdofs), sq(sdofs), sq(diag), sq(mask),
                   sq(maskfs) if has_fs else None, sq(wc), sq(ws), sq(wv),
                   sq(ubc) if has_ubc else None, sq(coords),
                   sq(bcw) if has_bcw else None)
            ov = sq(own_v)

            def pdot(a, b):
                return jax.lax.psum(jnp.sum(a * b * ov), AXIS)

            f, _ = transport_rhs(loc, t, sq(w), sq(vel), pdot,
                                 self.p.kle_rtol, self.p.kle_maxiter)
            return f[None]

        statics = (self.vdofs, self.wdofs, self.sdofs, self.diag_K, self.mask,
                   self.mask_fs if has_fs else self.mask,
                   self.w_curl, self.w_srt, self.w_div,
                   self.u_bc if has_ubc else self.diag_K, self.coords,
                   self.bc_vort_mask if has_bcw else self.w_curl)
        fn = shard_map(
            body, mesh=self.mesh_dev,
            in_specs=tuple([spec_d] * 13 + [spec_d, spec_d, P()]),
            out_specs=spec_d, check_vma=False,
        )
        return jax.jit(fn)(*statics, self.own_v, w, vel, t)
