"""Distributed Navier-Stokes stepping: the full KLE + transport + BS5(4)
machinery under shard_map on a 1-D or N-D device mesh.

This is the TPU equivalent of running the reference under `mpirun -n P`
(/root/reference/makefile:2-7): the box mesh is partitioned into slabs
(n_dev int) or N-D pencils (n_dev tuple, e.g. (2, 4) over the two
slowest grid axes), all elemental operator applies are device-local with
one-plane halo exchange per partitioned axis over ICI, CG dot products
and RK error norms are psum-reduced over the whole device mesh, and one
adaptive time step compiles to a single SPMD XLA program.

Each device's subdomain is itself a box grid, so the local apply is the
SAME parity-blocked MXU convolution the single-chip path uses
(pynama_tpu/ops/conv.py): the conv's phantom-cell boundary corrections
make the local apply exactly the sum over local elements, and the
interface planes' partial sums are completed by sequential per-axis halo
exchanges (the second axis' exchange carries the first's corner
contributions). Solver state lives in the blocked layout end to end
(grid layout under PYNAMA_NO_CONV=1, where the slice/stack apply is
used instead).

Works for both the single-mask FreeSlip problems and the dual-mask
no-slip/free-slip cavity solve.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from pynama_tpu.kle import v_tens_v
from pynama_tpu.ops.structured import StructuredElementOp, _use_conv
from pynama_tpu.parallel.slab import (
    GridDecomposition,
    halo_sum_blocked_axis,
    halo_sum_grid_axis,
)
from pynama_tpu.solvers.cg import cg_solve
from pynama_tpu.solvers.rk import make_bs5_stepper


class ShardedNSProblem:
    """Slab/pencil-distributed wrapper around a set-up BaseProblem.

    n_dev: int n for an n-slab over the last mesh axis, or a tuple
    (p0, p1, ...) partitioning the slowest grid axes over an N-D device
    mesh (p0 slices grid axis 0 = the last mesh axis, p1 the next, ...).
    """

    def __init__(self, problem, n_dev, devices=None):
        self.p = problem
        pgrid = (n_dev,) if isinstance(n_dev, (int, np.integer)) \
            else tuple(int(x) for x in n_dev)
        self.pgrid = pgrid
        self.naxes = len(pgrid)
        self.n_dev = int(np.prod(pgrid))
        self.slab = GridDecomposition(problem.mesh, pgrid)
        sl = self.slab
        self.axis_names = sl.axis_names
        m = problem.mesh
        dim, dim_w, dim_s = m.dim, m.dim_w, m.dim_s
        dt = problem.dtype
        N = m.ngl
        self.blocked = _use_conv()

        # local ops: same elemental matrices, subdomain-local box shape.
        # The local blocked layout super-blocks independently of the
        # single-chip problem (pick on the LOCAL nelem — all devices share
        # it, so the layout is uniform across shards).
        sysm, ops = problem.system, problem.operators
        from pynama_tpu.ops.structured import pick_super_factor

        sb = pick_super_factor(tuple(sl.local_nelem), N, dim)

        def lop(op, k_in, k_out):
            return StructuredElementOp(op.A, N, sl.local_nelem,
                                       sl.local_npts, k_in, k_out, sb=sb)

        self.K_op = lop(sysm.K, dim, dim)
        self.Rw_op = lop(sysm.Rw, dim_w, dim)
        self.Curl_op = lop(ops.Curl, dim, dim_w)
        self.SrT_op = lop(ops.SrT, dim, dim_s)
        self.Div_op = lop(ops.DivSrT, dim_s, dim)
        self.eff_ngl = self.K_op.eff_ngl  # local blocked-layout period + 1
        if self.blocked:
            # pre-build conv kernels eagerly (host, cached on the op)
            for op in (self.K_op, self.Rw_op, self.Curl_op, self.SrT_op,
                       self.Div_op):
                op._kernels()

        def arr(x):
            return jnp.asarray(x, dtype=dt)

        eff = self.eff_ngl

        def blocked_stack(g):
            """Per-device blocked conversion of (pgrid..., grid...)."""
            from pynama_tpu.ops.conv import to_blocked

            out = None
            for didx in np.ndindex(*self.pgrid):
                b = np.asarray(to_blocked(jnp.asarray(g[didx]), eff))
                if out is None:
                    out = np.empty(tuple(self.pgrid) + b.shape,
                                   dtype=b.dtype)
                out[didx] = b
            return out

        def to_solver(x_global, k):
            """flat global -> (pgrid..., *solver-layout) stacked, host."""
            g = sl.to_local_grid(x_global, k)
            return blocked_stack(g) if self.blocked else g

        def weight_solver(w_global, k):
            """Division weights in solver layout, pad slots = 1."""
            w = to_solver(w_global, k)
            if self.blocked:
                from pynama_tpu.ops.conv import pad_mask

                pm = pad_mask(eff, tuple(sl.local_grid_shape(k)[:-1]), k)
                w = w + (1.0 - pm)[(None,) * self.naxes]
            return w

        self._to_solver = to_solver
        self._blocked_stack = blocked_stack

        self.diag_K = arr(to_solver(sysm.diag_K, dim))
        self.w_curl = arr(weight_solver(ops.w_curl, dim_w))
        self.w_srt = arr(weight_solver(ops.w_srt, dim_s))
        self.w_div = arr(weight_solver(ops.w_div, dim))
        self.mask = arr(to_solver(np.asarray(problem.free_mask).reshape(-1),
                                  dim))
        fm_fs = getattr(problem, "free_mask_fs", None)
        self.mask_fs = (arr(to_solver(np.asarray(fm_fs).reshape(-1), dim))
                        if fm_fs is not None else None)
        self.own_v = arr(self._owned(dim))
        self.own_w = arr(self._owned(dim_w))
        # coords stay grid-shaped: analytic BC fns take (N, dim) points
        self.coords = arr(sl.to_local_grid(
            np.asarray(m.coords).reshape(-1), dim))

        # BC value providers: static vector or analytic function of (coords, t)
        self.vel_fn = getattr(problem, "vel_fn", None)
        self.vort_fn = getattr(problem, "vort_fn", None)
        if self.vel_fn is None:
            self.u_bc = arr(to_solver(
                np.asarray(problem.vel_bc(0.0)).reshape(-1), dim))
        else:
            self.u_bc = None
        bcw = getattr(problem, "bc_vort_mask", None)
        self.bc_vort_mask = (arr(to_solver(np.asarray(bcw).reshape(-1),
                                           dim_w))
                             if bcw is not None else None)

        self.mesh_dev = sl.device_mesh(devices)
        self.sharding = NamedSharding(self.mesh_dev, P(*self.axis_names))
        self.repl = NamedSharding(self.mesh_dev, P())
        self.n_vel_global = m.n_nodes * dim
        self.n_vort_global = m.n_nodes * dim_w

        # distributed multigrid: same V-cycle as single-chip, run inside
        # shard_map (slab only; every level must slab-divide evenly)
        self._dmg = None
        mg = getattr(problem, "mg", None)
        if (mg is not None and self.naxes == 1
                and getattr(mg, "dtype", None) == problem.dtype):
            from pynama_tpu.parallel.dist_mg import build_dist_mg

            self._dmg = build_dist_mg(mg, self)
        # does the GLOBAL solve mask free boundary dofs? (level-0
        # blocked-transfer gate in dist_mg.make_minv)
        from pynama_tpu.ops.conv import mask_frees_boundary

        npg = tuple(reversed(m.npts))
        self._bfree = mask_frees_boundary(
            np.asarray(problem.free_mask).reshape(npg + (dim,)), N, npg)
        self._bfree_fs = (mask_frees_boundary(
            np.asarray(fm_fs).reshape(npg + (dim,)), N, npg)
            if fm_fs is not None else True)

    def _owned(self, k):
        """Owned-dof weights in solver layout (pad slots 0)."""
        w = self.slab.owned_grid_weights(k)
        return self._blocked_stack(w) if self.blocked else w

    # ------------------------------------------------------------------
    def shard(self, x_global, k):
        """Host global vector -> device-sharded stacked local state."""
        loc = self._to_solver(np.asarray(x_global).reshape(-1), k)
        return jax.device_put(jnp.asarray(loc, dtype=self.p.dtype),
                              self.sharding)

    def unshard(self, x_stacked, k):
        xs = np.asarray(x_stacked)
        if self.blocked:
            from pynama_tpu.ops.conv import from_blocked

            npg = tuple(self.slab.local_grid_shape(k)[:-1])
            out = np.empty(tuple(self.pgrid) + npg + (k,))
            for didx in np.ndindex(*self.pgrid):
                out[didx] = np.asarray(
                    from_blocked(jnp.asarray(xs[didx]), self.eff_ngl, npg))
            xs = out
        return self.slab.from_local_grid(xs)

    # ------------------------------------------------------------------
    def _halo(self, y):
        Pm1 = self.eff_ngl - 1
        dim = self.p.mesh.dim
        for j in range(self.naxes):
            if self.blocked:
                y = halo_sum_blocked_axis(y, Pm1, dim, j,
                                          self.axis_names[j], self.pgrid[j])
            else:
                y = halo_sum_grid_axis(y, j, self.axis_names[j],
                                       self.pgrid[j])
        return y

    def _apply(self, op, x, k_out):
        """Local element apply + halo completion, in the solver layout."""
        y = op.apply_blocked(x) if self.blocked else op(x)
        return self._halo(y)

    def _grid_to_solver(self, g, k):
        """Inside-shard conversion of a freshly built local grid array."""
        if not self.blocked:
            return g
        from pynama_tpu.ops.conv import to_blocked

        return to_blocked(g, self.eff_ngl)

    def _local_fns(self):
        """Build the inside-shard_map physics, closing over replicated data."""
        p = self.p
        dim, dim_w, dim_s = p.dim, p.dim_w, p.dim_s
        mu, rho = p.mu, p.rho
        K_op, Rw_op = self.K_op, self.Rw_op
        Curl_op, SrT_op, Div_op = self.Curl_op, self.SrT_op, self.Div_op

        def solve_masked(diag, mask, vort, u_bc, x0, pdot, rtol, maxiter,
                         minv=None):
            bc = (1.0 - mask) * u_bc
            b = mask * (self._apply(Rw_op, vort, dim)
                        - self._apply(K_op, bc, dim)) + bc
            m_inv = minv if minv is not None \
                else 1.0 / (mask * diag + (1.0 - mask))

            def A(x):
                return mask * self._apply(K_op, mask * x, dim) \
                    + (1.0 - mask) * x

            x0 = mask * x0 + bc
            res = cg_solve(A, b, x0=x0, m_inv=m_inv, rtol=rtol,
                           maxiter=maxiter, dot=pdot)
            return res.x

        def curl(wc, u):
            return self._apply(Curl_op, u, dim_w) / wc

        def transport_rhs(loc, t, vort, vel_ws, pdot, rtol, maxiter,
                          minvs=(None, None)):
            (diag, mask, mask_fs, wc, ws, wv, u_bc_static, coords, bcw) = loc
            minv_fs, minv_fin = minvs
            if self.vel_fn is not None:
                pts = coords.reshape(-1, dim)
                u = self.vel_fn(pts, p.nu, t).reshape(coords.shape)
                u_bc = self._grid_to_solver(u, dim)
            else:
                u_bc = u_bc_static
            if self.vort_fn is not None and bcw is not None:
                pts = coords.reshape(-1, dim)
                ew = self.vort_fn(pts, p.nu, t).reshape(
                    coords.shape[:-1] + (dim_w,))
                exact_w = self._grid_to_solver(ew, dim_w)
                vort = vort * (1.0 - bcw) + exact_w * bcw
            if mask_fs is not None:
                # per-system warm starts (see NoSlipProblem._kle_solve_aux)
                ws_fs, ws_fin = (vel_ws if isinstance(vel_ws, tuple)
                                 else (vel_ws, vel_ws))
                raw_fs = solve_masked(diag, mask_fs, vort, u_bc,
                                      ws_fs, pdot, rtol, maxiter,
                                      minv=minv_fs)
                fsfree = mask_fs - mask
                vel_fs = raw_fs * (1.0 - fsfree) + u_bc * fsfree
                vort2 = curl(wc, vel_fs)
                vel = solve_masked(diag, mask, vort2, u_bc,
                                   ws_fin, pdot, rtol, maxiter,
                                   minv=minv_fin)
                aux_next = (raw_fs, vel)
            else:
                vel = solve_masked(diag, mask, vort, u_bc,
                                   vel_ws, pdot, rtol, maxiter,
                                   minv=minv_fin)
                aux_next = vel
            s = 2.0 * mu * (self._apply(SrT_op, vel, dim_s) / ws) \
                - rho * v_tens_v(vel, dim)
            r = (self._apply(Div_op, s, dim) / wv) / rho
            return curl(wc, r), aux_next

        return transport_rhs

    # ------------------------------------------------------------------
    def _sq(self, x):
        idx = (0,) * self.naxes
        return jax.tree.map(lambda a: a[idx], x)

    def _ex(self, x):
        axes = tuple(range(self.naxes))
        return jax.tree.map(lambda a: jnp.expand_dims(a, axes), x)

    def build_step(self, kle_rtol=None, kle_maxiter=None, atol=None, rtol=None):
        """jit-compiled distributed adaptive step: (w, t, dt, vel, f1) -> ...

        The returned function takes stacked-sharded solver-layout arrays
        and replicated scalars and runs ONE accepted BS5(4) step as a
        single SPMD program.
        """
        p = self.p
        kle_rtol = kle_rtol if kle_rtol is not None else p.kle_rtol
        kle_maxiter = kle_maxiter if kle_maxiter is not None else p.kle_maxiter
        atol = atol if atol is not None else p.ts_atol
        rtol = rtol if rtol is not None else p.ts_rtol
        transport_rhs = self._local_fns()
        n_glob_w = self.n_vort_global

        from jax import shard_map

        names = self.axis_names
        spec_d = P(*names)
        spec_r = P()
        has_fs = self.mask_fs is not None
        has_ubc = self.u_bc is not None
        has_bcw = self.bc_vort_mask is not None
        sq, ex = self._sq, self._ex
        mg_meta, mg_st, mg_rp = self._dmg if self._dmg else (None, (), ())

        def make_minvs(mg_st_loc, loc_mask_fs, loc_mask):
            if mg_meta is None:
                return (None, None)
            from pynama_tpu.parallel.dist_mg import make_minv

            fin = make_minv(mg_meta, mg_st_loc, mg_rp, loc_mask,
                            fine_boundary_free=self._bfree)
            fs = (make_minv(mg_meta, mg_st_loc, mg_rp, loc_mask_fs,
                            fine_boundary_free=self._bfree_fs)
                  if has_fs else None)
            return (fs, fin)

        def body(diag, mask, maskfs, wc, ws, wv, ubc, coords, bcw,
                 own_v, own_w, mg_stacked, w, t, dt, vel, f1, t_end):
            loc = (sq(diag), sq(mask), sq(maskfs) if has_fs else None,
                   sq(wc), sq(ws), sq(wv),
                   sq(ubc) if has_ubc else None, sq(coords),
                   sq(bcw) if has_bcw else None)
            ov = sq(own_v)
            ow = sq(own_w)
            minvs = make_minvs(sq(mg_stacked), loc[2], loc[1])

            def pdot(a, b):
                return jax.lax.psum(jnp.sum(a * b * ov), names)

            def rhs(tt, ww, aux):
                return transport_rhs(loc, tt, ww, aux, pdot, kle_rtol,
                                     kle_maxiter, minvs=minvs)

            def wlte_norm(err, y_old, y_new, a, r):
                wgt = a + r * jnp.maximum(jnp.abs(y_old), jnp.abs(y_new))
                e = err / wgt
                s = jax.lax.psum(jnp.sum(e * e * ow), names)
                return jnp.sqrt(s / n_glob_w)

            step_fn = make_bs5_stepper(rhs, atol=atol, rtol=rtol,
                                       wlte_norm=wlte_norm,
                                       max_dt=getattr(p, "ts_max_dt", None))
            res = step_fn(sq(w), t, dt, sq(vel), sq(f1), t_end)
            return (ex(res.y), res.t, res.dt_next, ex(res.aux),
                    ex(res.f_new), res.wlte)

        mg_st_specs = jax.tree.map(lambda _: spec_d, mg_st)
        in_specs = tuple([spec_d] * 11 + [mg_st_specs] + [
            spec_d, spec_r, spec_r, spec_d, spec_d, spec_r])
        out_specs = (spec_d, spec_r, spec_r, spec_d, spec_d, spec_r)
        fn = shard_map(
            body, mesh=self.mesh_dev, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )

        statics = (self.diag_K, self.mask,
                   self.mask_fs if has_fs else self.mask,
                   self.w_curl, self.w_srt, self.w_div,
                   self.u_bc if has_ubc else self.diag_K, self.coords,
                   self.bc_vort_mask if has_bcw else self.w_curl)

        @jax.jit
        def step(w, t, dt, vel, f1, t_end):
            return fn(*statics, self.own_v, self.own_w, mg_st, w, t, dt,
                      vel, f1, t_end)

        return step

    # ------------------------------------------------------------------
    def build_rhs(self, kle_rtol=None, kle_maxiter=None):
        """jitted distributed transport RHS: (w, vel_ws, t) -> (f, vel).

        Used for the initial FSAL derivative and one-off evaluations;
        production stepping at scales where the fully-inlined
        build_step() program is too large to compile goes through
        build_attempt() (one dispatch per BS5 attempt).
        """
        p = self.p
        kle_rtol = kle_rtol if kle_rtol is not None else p.kle_rtol
        kle_maxiter = kle_maxiter if kle_maxiter is not None else p.kle_maxiter
        transport_rhs = self._local_fns()
        from jax import shard_map

        names = self.axis_names
        spec_d = P(*names)
        has_fs = self.mask_fs is not None
        has_ubc = self.u_bc is not None
        has_bcw = self.bc_vort_mask is not None
        sq, ex = self._sq, self._ex
        mg_meta, mg_st, mg_rp = self._dmg if self._dmg else (None, (), ())

        def body(diag, mask, maskfs, wc, ws, wv, ubc, coords, bcw,
                 own_v, mg_stacked, w, vel, t):
            loc = (sq(diag), sq(mask), sq(maskfs) if has_fs else None,
                   sq(wc), sq(ws), sq(wv),
                   sq(ubc) if has_ubc else None, sq(coords),
                   sq(bcw) if has_bcw else None)
            ov = sq(own_v)
            if mg_meta is not None:
                from pynama_tpu.parallel.dist_mg import make_minv

                mg_loc = sq(mg_stacked)
                fin = make_minv(mg_meta, mg_loc, mg_rp, loc[1],
                                fine_boundary_free=self._bfree)
                fs = (make_minv(mg_meta, mg_loc, mg_rp, loc[2],
                                fine_boundary_free=self._bfree_fs)
                      if has_fs else None)
                minvs = (fs, fin)
            else:
                minvs = (None, None)

            def pdot(a, b):
                return jax.lax.psum(jnp.sum(a * b * ov), names)

            f, v = transport_rhs(loc, t, sq(w), sq(vel), pdot,
                                 kle_rtol, kle_maxiter, minvs=minvs)
            return ex(f), ex(v)

        statics = (self.diag_K, self.mask,
                   self.mask_fs if has_fs else self.mask,
                   self.w_curl, self.w_srt, self.w_div,
                   self.u_bc if has_ubc else self.diag_K, self.coords,
                   self.bc_vort_mask if has_bcw else self.w_curl)
        mg_st_specs = jax.tree.map(lambda _: spec_d, mg_st)
        fn = shard_map(
            body, mesh=self.mesh_dev,
            in_specs=tuple([spec_d] * 10 + [mg_st_specs, spec_d, spec_d,
                                            P()]),
            out_specs=(spec_d, spec_d), check_vma=False,
        )

        @jax.jit
        def rhs(w, vel, t):
            return fn(*statics, self.own_v, mg_st, w, vel, t)

        return rhs

    def build_attempt(self, kle_rtol=None, kle_maxiter=None, atol=None,
                      rtol=None, chunk=1, max_dt=None, ws_extrapolate=False):
        """BS5(4) attempts as a single SPMD dispatch (lax.scan stages).

        chunk=1: (w, t, dt, vel_aux, f1) -> (y5, f_new, wlte, aux) — ONE
        attempt; the host dt controller costs one dispatch per attempt,
        which removed the round-3 step-level gap (8 dispatches x
        sharded-argument processing per step).

        chunk=k>1: (w, t, dt, vel_aux, f1, t_end) ->
        (y, t, dt, aux, f1, n_acc, wlte) — the accept/reject + dt
        controller itself runs as a lax.scan of k attempts INSIDE the
        SPMD program (solvers/rk.py make_chunk_controller), so the host
        syncs once per k attempts instead of per attempt (ROUND4 backlog
        #4: the per-attempt readback was the residual 1.15x overhead).

        ws_extrapolate: per-stage-slot warm-start extrapolation — the
        aux is then the make_ws_state history pytree (sharded leaves).
        """
        p = self.p
        kle_rtol = kle_rtol if kle_rtol is not None else p.kle_rtol
        kle_maxiter = kle_maxiter if kle_maxiter is not None else p.kle_maxiter
        atol = atol if atol is not None else p.ts_atol
        rtol = rtol if rtol is not None else p.ts_rtol
        transport_rhs = self._local_fns()
        n_glob_w = self.n_vort_global

        from jax import shard_map

        from pynama_tpu.solvers.rk import (make_bs5_scan_attempt,
                                           make_chunk_controller)

        names = self.axis_names
        spec_d = P(*names)
        spec_r = P()
        has_fs = self.mask_fs is not None
        has_ubc = self.u_bc is not None
        has_bcw = self.bc_vort_mask is not None
        sq, ex = self._sq, self._ex
        mg_meta, mg_st, mg_rp = self._dmg if self._dmg else (None, (), ())

        def body(diag, mask, maskfs, wc, ws, wv, ubc, coords, bcw,
                 own_v, own_w, mg_stacked, w, t, dt, vel, f1, t_end):
            loc = (sq(diag), sq(mask), sq(maskfs) if has_fs else None,
                   sq(wc), sq(ws), sq(wv),
                   sq(ubc) if has_ubc else None, sq(coords),
                   sq(bcw) if has_bcw else None)
            ov = sq(own_v)
            ow = sq(own_w)
            if mg_meta is not None:
                from pynama_tpu.parallel.dist_mg import make_minv

                mg_loc = sq(mg_stacked)
                fin = make_minv(mg_meta, mg_loc, mg_rp, loc[1],
                                fine_boundary_free=self._bfree)
                fs = (make_minv(mg_meta, mg_loc, mg_rp, loc[2],
                                fine_boundary_free=self._bfree_fs)
                      if has_fs else None)
                minvs = (fs, fin)
            else:
                minvs = (None, None)

            def pdot(a, b):
                return jax.lax.psum(jnp.sum(a * b * ov), names)

            def rhs(tt, ww, aux):
                return transport_rhs(loc, tt, ww, aux, pdot, kle_rtol,
                                     kle_maxiter, minvs=minvs)

            def wlte_norm(err, y_old, y_new, a, r):
                wgt = a + r * jnp.maximum(jnp.abs(y_old), jnp.abs(y_new))
                e = err / wgt
                s = jax.lax.psum(jnp.sum(e * e * ow), names)
                return jnp.sqrt(s / n_glob_w)

            attempt = make_bs5_scan_attempt(rhs, atol=atol, rtol=rtol,
                                            wlte_norm=wlte_norm,
                                            ws_extrapolate=ws_extrapolate)
            if ws_extrapolate:
                # ws history leaves carry a leading STAGE-SLOT axis; the
                # device axes sit one position right of the state's
                naxes = self.naxes

                def sq_aux(a):
                    H1, H2, tp, tpp = a
                    sl = (slice(None),) + (0,) * naxes
                    f = lambda h: jax.tree.map(lambda x: x[sl], h)
                    return (f(H1), f(H2), tp, tpp)

                def ex_aux(a):
                    H1, H2, tp, tpp = a
                    axes = tuple(range(1, naxes + 1))
                    f = lambda h: jax.tree.map(
                        lambda x: jnp.expand_dims(x, axes), h)
                    return (f(H1), f(H2), tp, tpp)
            else:
                sq_aux, ex_aux = sq, ex
            if chunk == 1:
                y5, f_new, wlte, aux_n = attempt(sq(w), t, dt, sq_aux(vel),
                                                 sq(f1))
                return ex(y5), ex(f_new), wlte, ex_aux(aux_n)
            ctrl = make_chunk_controller(attempt, chunk, max_dt=max_dt)
            y, t2, dt2, aux, f1o, n_acc, wlte = ctrl(
                sq(w), t, dt, sq_aux(vel), sq(f1), t_end)
            return ex(y), t2, dt2, ex_aux(aux), ex(f1o), n_acc, wlte

        statics = (self.diag_K, self.mask,
                   self.mask_fs if has_fs else self.mask,
                   self.w_curl, self.w_srt, self.w_div,
                   self.u_bc if has_ubc else self.diag_K, self.coords,
                   self.bc_vort_mask if has_bcw else self.w_curl)
        mg_st_specs = jax.tree.map(lambda _: spec_d, mg_st)
        # ws history aux = (H1, H2, t_prev, t_pp): slot stacks sharded on
        # the axis AFTER the leading slot axis, replicated time scalars
        # (specs are pytree prefixes)
        h_spec = P(*((None,) + names))
        aux_spec = ((h_spec, h_spec, spec_r, spec_r) if ws_extrapolate
                    else spec_d)
        in_specs = tuple([spec_d] * 11 + [mg_st_specs] + [
            spec_d, spec_r, spec_r, aux_spec, spec_d, spec_r])
        if chunk == 1:
            out_specs = (spec_d, spec_d, spec_r, aux_spec)
        else:
            out_specs = (spec_d, spec_r, spec_r, aux_spec, spec_d,
                         spec_r, spec_r)
        fn = shard_map(
            body, mesh=self.mesh_dev, in_specs=in_specs,
            out_specs=out_specs, check_vma=False,
        )

        if chunk == 1:
            @jax.jit
            def attempt_fn(w, t, dt, vel, f1, t_end=None):
                te = jnp.asarray(0.0, w.dtype) if t_end is None else t_end
                return fn(*statics, self.own_v, self.own_w, mg_st, w, t,
                          dt, vel, f1, te)
        else:
            @jax.jit
            def attempt_fn(w, t, dt, vel, f1, t_end):
                return fn(*statics, self.own_v, self.own_w, mg_st, w, t,
                          dt, vel, f1, t_end)

        return attempt_fn

    def _eval_rhs_once(self, w, t, vel):
        f, _ = self.build_rhs()(w, vel, t)
        return f

    # ------------------------------------------------------------------
    def run_staged(self, max_steps=None, callback=None, kle_rtol=None,
                   kle_maxiter=None):
        """Distributed transient run, host-controlled (production scale).

        build_step()'s fully-inlined program is compile-prohibitive at
        ~1M dofs (the same XLA limit the single-chip bench hits); this
        keeps the accept/reject dt controller on host and runs each
        BS5(4) attempt as ONE compiled SPMD dispatch (build_attempt —
        the 7 stages lax.scan over a single RHS body, so the program
        stays the size of one RHS program). Returns (w_stacked, t, n).
        """
        from pynama_tpu.solvers.rk import (make_attempt_host_stepper,
                                           make_ws_state, ws_aux_vel)

        p = self.p
        rhs_fn = self.build_rhs(kle_rtol, kle_maxiter)

        def rhs(t, w, aux):
            return rhs_fn(w, aux, t)

        chunk = int(p.config.get("ts-chunk", 1))
        ws = bool(getattr(p, "kle_ws_extrapolate", False))
        attempt = self.build_attempt(kle_rtol, kle_maxiter, chunk=chunk,
                                     max_dt=p.ts_max_dt, ws_extrapolate=ws)
        if chunk == 1:
            step = make_attempt_host_stepper(attempt, max_dt=p.ts_max_dt)
        w = self.shard(np.asarray(p.initial_vorticity()).reshape(-1), p.dim_w)
        vel = self.shard(np.zeros(p.mesh.n_nodes * p.dim), p.dim)
        t = jnp.asarray(p.t_start, dtype=p.dtype)
        dt = jnp.asarray(p.dt0, dtype=p.dtype)
        t_end = jnp.asarray(p.t_end, dtype=p.dtype)
        f1, vel = rhs(t, w, vel)
        if ws:
            vel = make_ws_state(vel, t)

        n = 0
        steps = max_steps if max_steps is not None else p.max_steps
        stall = 0
        while float(t) < float(t_end) - 1e-14 and n < steps:
            if chunk == 1:
                res = step(w, t, dt, vel, f1, t_end)
                w, t, dt, vel, f1 = (res.y, res.t, res.dt_next, res.aux,
                                     res.f_new)
                n += 1
            else:
                w, t, dt, vel, f1, n_acc, _ = attempt(w, t, dt, vel, f1,
                                                      t_end)
                n += int(n_acc)
                stall = stall + 1 if int(n_acc) == 0 else 0
                if stall >= 12:
                    raise RuntimeError(
                        "BS5 chunk made no progress 12 chunks in a row")
            if callback is not None:
                callback(n, float(t), float(dt), w,
                         ws_aux_vel(vel) if ws else vel)
        return w, float(t), n

    def run(self, max_steps=None, callback=None):
        """Distributed transient run (host loop over jitted SPMD steps)."""
        p = self.p
        step = self.build_step()
        w = self.shard(np.asarray(p.initial_vorticity()).reshape(-1), p.dim_w)
        vel = self.shard(np.zeros(p.mesh.n_nodes * p.dim), p.dim)
        if self.mask_fs is not None:
            vel = (vel, vel)  # per-system warm-start pair (dual-mask)
        t = jnp.asarray(p.t_start, dtype=p.dtype)
        dt = jnp.asarray(p.dt0, dtype=p.dtype)
        t_end = jnp.asarray(p.t_end, dtype=p.dtype)

        # initial FSAL derivative: one distributed rhs eval
        f1 = self._eval_rhs_once(w, t, vel)

        n = 0
        steps = max_steps if max_steps is not None else p.max_steps
        while float(t) < float(t_end) - 1e-14 and n < steps:
            w, t, dt, vel, f1, wlte = step(w, t, dt, vel, f1, t_end)
            n += 1
            if callback is not None:
                callback(n, float(t), float(dt), w, vel)
        return w, float(t), n
