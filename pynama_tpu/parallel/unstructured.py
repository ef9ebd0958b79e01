"""Distributed NS stepping on UNSTRUCTURED meshes: element-partitioned
data parallelism under shard_map.

The reference distributes arbitrary (Gmsh) meshes through DMPlex
partitioning + PETSc-internal MPI assembly exchange
(/root/reference/src/domain/dmplex.py:29, SURVEY.md section 2c). The
box-mesh fast lane here uses slab decomposition with halo exchange
(pynama_tpu/parallel/sharded_problem.py); this module is the general-mesh
equivalent: cells are partitioned into equal chunks, one per device, and
every elemental operator apply is

    y = psum_over_devices( scatter_add(A_chunk @ gather(x, chunk)) )

with the STATE vectors replicated across the device mesh. Replicated
state + partitioned work is the TPU-idiomatic distribution for meshes
without exploitable grid structure: the gather/GEMM/scatter runs on
1/P of the elements per chip and the single psum per apply rides ICI;
masks, weights, CG dot products and the BS5(4) controller evaluate
redundantly on replicated vectors, needing no further collectives.
Memory bounds the mesh size to what one chip can hold (the owner-
partitioned slab path covers the very largest structured runs).

Cell chunks are padded to equal size with zero elemental matrices
scattering zeros, so shapes stay uniform under shard_map.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pynama_tpu.kle import v_tens_v
from pynama_tpu.solvers.cg import cg_solve
from pynama_tpu.solvers.rk import make_bs5_stepper

AXIS = "dev"


def _chunk_tables(A, in_dofs, out_dofs, n_dev, dtype):
    """Split per-element data into n_dev equal chunks (zero-padded).

    A: (E, out_k, in_k) batched or (out_k, in_k) shared elemental
    matrices. Returns (A (P, E_loc, out_k, in_k), in_dofs (P, E_loc, ik),
    out_dofs (P, E_loc, ok)).
    """
    in_dofs = np.asarray(in_dofs)
    out_dofs = np.asarray(out_dofs)
    E = in_dofs.shape[0]
    A = np.asarray(jnp.asarray(A, dtype=dtype))
    dtype = A.dtype
    if A.ndim == 2:
        A = np.broadcast_to(A, (E,) + A.shape)
    E_loc = -(-E // n_dev)
    pad = n_dev * E_loc - E
    if pad:
        A = np.concatenate([A, np.zeros((pad,) + A.shape[1:], dtype=dtype)])
        in_dofs = np.concatenate([in_dofs, np.zeros((pad, in_dofs.shape[1]),
                                                    dtype=in_dofs.dtype)])
        out_dofs = np.concatenate([out_dofs,
                                   np.zeros((pad, out_dofs.shape[1]),
                                            dtype=out_dofs.dtype)])
    shp = (n_dev, E_loc)
    return (A.reshape(shp + A.shape[1:]),
            in_dofs.reshape(shp + (in_dofs.shape[1],)),
            out_dofs.reshape(shp + (out_dofs.shape[1],)))


class ShardedUnstructuredProblem:
    """Element-partitioned wrapper around a set-up unstructured problem.

    Mirrors ShardedNSProblem's API (build_step / run) for problems whose
    mesh is an UnstructuredQuadMesh / UnstructuredHexMesh (or any mesh
    without the structured fast lane). State is replicated; pass/return
    plain flat vectors.
    """

    def __init__(self, problem, n_dev: int, devices=None):
        self.p = problem
        self.n_dev = n_dev
        m = problem.mesh
        dim, dim_w, dim_s = m.dim, m.dim_w, m.dim_s
        dt = problem.dtype
        sysm, ops = problem.system, problem.operators

        vd = m.cell_dofs(dim)
        wd = m.cell_dofs(dim_w)
        sd = m.cell_dofs(dim_s)

        def chunks(op, in_dofs, out_dofs):
            return tuple(jnp.asarray(x) for x in _chunk_tables(
                op.A, in_dofs, out_dofs, n_dev, dt))

        # the five global operators, chunked per device
        self.K_c = chunks(sysm.K, vd, vd)
        self.Rw_c = chunks(sysm.Rw, wd, vd)
        self.Curl_c = chunks(ops.Curl, vd, wd)
        self.SrT_c = chunks(ops.SrT, vd, sd)
        self.Div_c = chunks(ops.DivSrT, sd, vd)

        def arr(x):
            return jnp.asarray(np.asarray(x).reshape(-1), dtype=dt)

        self.n_vel = m.n_nodes * dim
        self.n_vort = m.n_nodes * dim_w
        self.n_srt = m.n_nodes * dim_s
        self.diag_K = arr(sysm.diag_K)
        self.w_curl = arr(ops.w_curl)
        self.w_srt = arr(ops.w_srt)
        self.w_div = arr(ops.w_div)
        self.mask = arr(problem.free_mask)
        fm_fs = getattr(problem, "free_mask_fs", None)
        self.mask_fs = arr(fm_fs) if fm_fs is not None else None
        bcw = getattr(problem, "bc_vort_mask", None)
        self.bc_vort_mask = arr(bcw) if bcw is not None else None
        self.coords = jnp.asarray(m.coords, dtype=dt)
        self.vel_fn = getattr(problem, "vel_fn", None)
        self.vort_fn = getattr(problem, "vort_fn", None)
        self.u_bc = (arr(problem.vel_bc(0.0)) if self.vel_fn is None
                     else None)

        devices = devices if devices is not None else jax.devices()[:n_dev]
        self.mesh_dev = Mesh(np.array(devices), (AXIS,))

    # ------------------------------------------------------------------
    def _local_fns(self):
        p = self.p
        dim, dim_w, dim_s = p.dim, p.dim_w, p.dim_s
        mu, rho = p.mu, p.rho
        n_vel, n_vort, n_srt = self.n_vel, self.n_vort, self.n_srt

        def papply(chunk, x, out_size):
            A, ind, outd = chunk
            ye = jnp.einsum("eoi,ei->eo", A, x[ind])
            y = jnp.zeros((out_size,), dtype=x.dtype)
            y = y.at[outd.reshape(-1)].add(ye.reshape(-1))
            return jax.lax.psum(y, AXIS)

        def solve_masked(loc, mask, vort, u_bc, x0, rtol, maxiter):
            K_c, Rw_c = loc["K"], loc["Rw"]
            bc = (1.0 - mask) * u_bc
            b = mask * (papply(Rw_c, vort, n_vel)
                        - papply(K_c, bc, n_vel)) + bc
            m_inv = 1.0 / (mask * self.diag_K + (1.0 - mask))

            def A(x):
                return mask * papply(K_c, mask * x, n_vel) + (1.0 - mask) * x

            res = cg_solve(A, b, x0=mask * x0 + bc, m_inv=m_inv, rtol=rtol,
                           maxiter=maxiter)
            return res.x

        def transport_rhs(loc, t, vort, vel_ws, rtol, maxiter):
            if self.vel_fn is not None:
                u_bc = self.vel_fn(self.coords, p.nu, t).reshape(-1)
            else:
                u_bc = self.u_bc
            if self.vort_fn is not None and self.bc_vort_mask is not None:
                ew = self.vort_fn(self.coords, p.nu, t).reshape(-1)
                vort = (vort * (1.0 - self.bc_vort_mask)
                        + ew * self.bc_vort_mask)

            def curl(u):
                return papply(loc["Curl"], u, n_vort) / self.w_curl

            if self.mask_fs is not None:
                vel_fs = solve_masked(loc, self.mask_fs, vort, u_bc,
                                      vel_ws, rtol, maxiter)
                fsfree = self.mask_fs - self.mask
                vel_fs = vel_fs * (1.0 - fsfree) + u_bc * fsfree
                vort2 = curl(vel_fs)
                vel = solve_masked(loc, self.mask, vort2, u_bc,
                                   vel_fs, rtol, maxiter)
            else:
                vel = solve_masked(loc, self.mask, vort, u_bc,
                                   vel_ws, rtol, maxiter)
            aux = 2.0 * mu * (papply(loc["SrT"], vel, n_srt) / self.w_srt) \
                - rho * v_tens_v(vel, dim)
            r = (papply(loc["Div"], aux, n_vel) / self.w_div) / rho
            return curl(r), vel

        return transport_rhs

    # ------------------------------------------------------------------
    def build_step(self, kle_rtol=None, kle_maxiter=None, atol=None,
                   rtol=None):
        p = self.p
        kle_rtol = kle_rtol if kle_rtol is not None else p.kle_rtol
        kle_maxiter = kle_maxiter if kle_maxiter is not None else p.kle_maxiter
        atol = atol if atol is not None else p.ts_atol
        rtol = rtol if rtol is not None else p.ts_rtol
        transport_rhs = self._local_fns()

        from jax import shard_map

        spec_d, spec_r = P(AXIS), P()

        def body(K_c, Rw_c, Curl_c, SrT_c, Div_c, w, t, dt, vel, f1, t_end):
            sq = lambda c: tuple(x[0] for x in c)  # drop the shard axis
            loc = {"K": sq(K_c), "Rw": sq(Rw_c), "Curl": sq(Curl_c),
                   "SrT": sq(SrT_c), "Div": sq(Div_c)}

            def rhs(tt, ww, aux):
                return transport_rhs(loc, tt, ww, aux, kle_rtol, kle_maxiter)

            step_fn = make_bs5_stepper(rhs, atol=atol, rtol=rtol)
            res = step_fn(w, t, dt, vel, f1, t_end)
            return res.y, res.t, res.dt_next, res.aux, res.f_new, res.wlte

        chunk_spec = (spec_d, spec_d, spec_d)
        fn = shard_map(
            body, mesh=self.mesh_dev,
            in_specs=(chunk_spec,) * 5 + (spec_r,) * 6,
            out_specs=(spec_r,) * 6, check_vma=False,
        )

        @jax.jit
        def step(w, t, dt, vel, f1, t_end):
            return fn(self.K_c, self.Rw_c, self.Curl_c, self.SrT_c,
                      self.Div_c, w, t, dt, vel, f1, t_end)

        return step

    def _eval_rhs_once(self, w, t, vel):
        transport_rhs = self._local_fns()
        from jax import shard_map

        spec_d, spec_r = P(AXIS), P()

        def body(K_c, Rw_c, Curl_c, SrT_c, Div_c, w, vel, t):
            sq = lambda c: tuple(x[0] for x in c)
            loc = {"K": sq(K_c), "Rw": sq(Rw_c), "Curl": sq(Curl_c),
                   "SrT": sq(SrT_c), "Div": sq(Div_c)}
            f, _ = transport_rhs(loc, t, w, vel, self.p.kle_rtol,
                                 self.p.kle_maxiter)
            return f

        fn = shard_map(
            body, mesh=self.mesh_dev,
            in_specs=((spec_d,) * 3,) * 5 + (spec_r,) * 3,
            out_specs=spec_r, check_vma=False,
        )
        return jax.jit(fn)(self.K_c, self.Rw_c, self.Curl_c, self.SrT_c,
                           self.Div_c, w, vel, t)

    # ------------------------------------------------------------------
    def run(self, max_steps=None, callback=None):
        p = self.p
        step = self.build_step()
        w = jnp.asarray(np.asarray(p.initial_vorticity()).reshape(-1),
                        dtype=p.dtype)
        vel = jnp.zeros(self.n_vel, dtype=p.dtype)
        t = jnp.asarray(p.t_start, dtype=p.dtype)
        dt = jnp.asarray(p.dt0, dtype=p.dtype)
        t_end = jnp.asarray(p.t_end, dtype=p.dtype)
        f1 = self._eval_rhs_once(w, t, vel)

        n = 0
        steps = max_steps if max_steps is not None else p.max_steps
        while float(t) < float(t_end) - 1e-14 and n < steps:
            w, t, dt, vel, f1, wlte = step(w, t, dt, vel, f1, t_end)
            n += 1
            if callback is not None:
                callback(n, float(t), float(dt), w, vel)
        return w, float(t), n
