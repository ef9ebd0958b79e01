"""Distributed geometric multigrid for the slab-decomposed NS solver.

The reference's per-stage direct LU is replaced single-chip by a
V-cycle-preconditioned CG (pynama_tpu/solvers/multigrid.py); this module
runs the SAME V-cycle inside shard_map on a 1-D slab device mesh, so the
distributed KLE solves get mesh-independent iteration counts instead of
Jacobi-CG's O(sqrt(kappa)) growth:

  * every level's grid is slab-partitioned identically (requires the
    device count to divide each level's last-axis element count),
  * smoothing = Chebyshev over local masked applies + one-plane halo,
  * transfers: the subcell gather/GEMM/scatter transfers are LOCAL on
    each slab (a coarse cell's fine support never crosses the interface
    plane, which both neighbors hold); their partial sums on the OUTPUT
    grid's interface planes complete with the standard halo exchange,
    then the GLOBAL node-multiplicity correction applies pointwise,
  * the coarsest level's dense masked inverse is applied replicated:
    all_gather the coarse residual, de-duplicate interface planes,
    one dense GEMV, slice the local block back out.

Data is split into a device-stacked pytree (leading slab axis, sharded
into shard_map) and a replicated pytree (elemental matrices, transfer
tensors, the coarse inverse); `make_minv` assembles the V-cycle closure
from the per-device slices inside the shard_map body.
"""

from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pynama_tpu.ops.structured import StructuredElementOp, grid_gather, \
    grid_scatter_add
from pynama_tpu.parallel.slab import halo_sum_blocked_axis, halo_sum_grid_axis


@dataclass
class _DistMGMeta:
    """Static (non-array) description of the distributed hierarchy."""

    ngl: int
    dim: int
    blocked: bool
    axis_name: str
    n_dev: int
    lam_max: List[float]
    ratios: List[int]
    local_nelem: List[tuple]   # per level, MESH order
    local_npts: List[tuple]    # per level, MESH order
    rows_loc: List[int]        # node planes per device per level
    pre: int = 3
    post: int = 3


def build_dist_mg(mg, sharded):
    """Distribute a built MGPreconditioner over a ShardedNSProblem's slab.

    Returns (meta, stacked, repl) or None when the hierarchy cannot be
    slab-partitioned (device count must divide every level's last-axis
    element count).
    """
    sl = sharded.slab
    if sharded.naxes != 1:
        return None
    n_dev = sharded.n_dev
    dim = mg.dim
    N = mg.elem.ngl
    dtype = sharded.p.dtype

    for lvl in mg.levels:
        if lvl.mesh.nelem[-1] % n_dev != 0:
            return None
        if getattr(lvl, "ext_mesh", None) is not None:
            return None  # padded (fictitious-domain) jumps stay single-chip

    from pynama_tpu.parallel.slab import GridDecomposition

    meta = _DistMGMeta(
        ngl=N, dim=dim, blocked=sharded.blocked,
        axis_name=sharded.axis_names[0], n_dev=n_dev,
        lam_max=list(getattr(mg, "lam_max_jacobi", mg.lam_max)),
        ratios=[l.ratio for l in mg.levels[:-1]],
        local_nelem=[], local_npts=[], rows_loc=[],
        pre=mg.pre, post=mg.post,
    )
    stacked = []
    repl = []
    for li, lvl in enumerate(mg.levels):
        dec = GridDecomposition(lvl.mesh, (n_dev,))
        meta.local_nelem.append(dec.local_nelem)
        meta.local_npts.append(dec.local_npts)
        meta.rows_loc.append(dec.rows_loc[0])

        def loc_grid(g):
            flat = np.asarray(g).reshape(-1)
            return dec.to_local_grid(flat, dim)

        def to_solver(g):
            loc = loc_grid(g)
            if not sharded.blocked:
                return jnp.asarray(loc, dtype=g.dtype)
            from pynama_tpu.ops.conv import to_blocked

            return jnp.stack([
                to_blocked(jnp.asarray(loc[d]), N) for d in range(n_dev)
            ])

        st = {
            "diag": to_solver(lvl.diag),
            "mask": to_solver(lvl.mask),
        }
        rp = {"A": jnp.asarray(lvl.K.A, dtype=dtype)}
        if li + 1 < len(mg.levels):
            st["mult"] = jnp.asarray(loc_grid(lvl.mult_inv),
                                     dtype=dtype)  # grid layout
            if sharded.blocked:
                from pynama_tpu.ops.conv import to_blocked

                st["mult_b"] = jnp.stack([
                    to_blocked(jnp.asarray(st["mult"][d]), N)
                    for d in range(n_dev)
                ])
            rp["interp"] = lvl.interp_k
        stacked.append(st)
        repl.append(rp)
    repl_top = {"levels": repl, "coarse_inv": mg.coarse_inv}
    return meta, stacked, repl_top


def make_minv(meta: _DistMGMeta, stacked_local, repl, fine_mask):
    """Build the distributed V-cycle closure INSIDE a shard_map body.

    stacked_local: per-level dicts with the leading slab axis already
    squeezed; repl: the replicated pytree; fine_mask: the caller's
    fine-level free mask (solver layout, local).
    """
    N, dim = meta.ngl, meta.dim
    nlev = len(stacked_local)
    axis = meta.axis_name
    n_dev = meta.n_dev
    blocked = meta.blocked

    ops = [
        StructuredElementOp(
            repl["levels"][li]["A"], N, meta.local_nelem[li],
            meta.local_npts[li], dim, dim,
        )
        for li in range(nlev)
    ]

    def halo(li, y):
        if blocked:
            return halo_sum_blocked_axis(y, N - 1, dim, 0, axis, n_dev)
        return halo_sum_grid_axis(y, 0, axis, n_dev)

    def masked_apply(li, mask, x):
        op = ops[li]
        Kx = op.apply_blocked(mask * x) if blocked else op(mask * x)
        Kx = halo(li, Kx)
        return mask * Kx + (1.0 - mask) * x

    def ldata(li):
        lvl = stacked_local[li]
        mask = fine_mask if li == 0 else lvl["mask"]
        return mask, lvl["diag"]

    def smooth(li, x, b, n, x_is_zero=False):
        mask, diag = ldata(li)
        lmax = meta.lam_max[li]
        lmin = lmax / 4.0
        theta = 0.5 * (lmax + lmin)
        delta = 0.5 * (lmax - lmin)
        dinv = 1.0 / (mask * diag + (1.0 - mask))
        if x_is_zero:
            x, r = jnp.zeros_like(b), b
        else:
            r = b - masked_apply(li, mask, x)
        d = (1.0 / theta) * (dinv * r)
        sigma = theta / delta
        rho = 1.0 / sigma
        for _ in range(n):
            x = x + d
            r = r - masked_apply(li, mask, d)
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = (rho_new * rho) * d + (2.0 * rho_new / delta) * (dinv * r)
            rho = rho_new
        return x + d

    def to_grid(li, x):
        if not blocked:
            return x
        from pynama_tpu.ops.conv import from_blocked

        return from_blocked(x, N, tuple(reversed(meta.local_npts[li])))

    def to_solver(li, g):
        if not blocked:
            return g
        from pynama_tpu.ops.conv import to_blocked

        return to_blocked(g, N)

    def subcell_params(li, s, ratio):
        digits = []
        ss = s
        for _ in range(dim):
            digits.append(ss % ratio)
            ss //= ratio
        ncells = meta.local_nelem[li + 1]  # coarse local cells
        step = ratio * (N - 1)
        offset = tuple((N - 1) * dgt for dgt in digits)
        return ncells, step, offset

    def restrict(li, res):
        """Fine local residual (solver layout) -> coarse (solver layout)."""
        lvl = stacked_local[li]
        ratio = meta.ratios[li]
        interp = repl["levels"][li]["interp"]
        rf = to_grid(li, res) * lvl["mult"]
        rc = jnp.zeros(tuple(reversed(meta.local_npts[li + 1])) + (dim,),
                       dtype=rf.dtype)
        for s in range(ratio**dim):
            ncells, step, offset = subcell_params(li, s, ratio)
            vals = grid_gather(rf, N, ncells, step, offset)
            rc = grid_scatter_add(
                rc, vals @ interp[s], N, meta.local_nelem[li + 1],
                N - 1, (0,) * dim,
            )
        rc = to_solver(li + 1, rc)
        return halo(li + 1, rc)

    def prolong(li, xc):
        """Coarse local correction -> fine (solver layout)."""
        lvl = stacked_local[li]
        ratio = meta.ratios[li]
        interp = repl["levels"][li]["interp"]
        xcg = to_grid(li + 1, xc)
        xce = grid_gather(xcg, N, meta.local_nelem[li + 1], N - 1,
                          (0,) * dim)
        fine = jnp.zeros(tuple(reversed(meta.local_npts[li])) + (dim,),
                         dtype=xcg.dtype)
        for s in range(ratio**dim):
            ncells, step, offset = subcell_params(li, s, ratio)
            fine = grid_scatter_add(fine, xce @ interp[s].T, N, ncells,
                                    step, offset)
        fineb = to_solver(li, fine)
        fineb = halo(li, fineb)
        return fineb * (lvl["mult_b"] if blocked else lvl["mult"])

    def coarse_solve(r):
        """Replicated dense solve: all_gather -> de-dup -> GEMV -> slice."""
        rg = to_grid(nlev - 1, r)  # (rows_loc, ..., dim)
        gathered = jax.lax.all_gather(rg, axis)  # (n_dev, rows_loc, ..., dim)
        parts = [gathered[0]] + [gathered[d][1:] for d in range(1, n_dev)]
        full = jnp.concatenate(parts, axis=0)
        x = (repl["coarse_inv"] @ full.reshape(-1)).reshape(full.shape)
        rows = meta.rows_loc[nlev - 1]
        row0 = jax.lax.axis_index(axis) * (rows - 1)
        xl = jax.lax.dynamic_slice_in_dim(x, row0, rows, axis=0)
        return to_solver(nlev - 1, xl)

    def vcycle(li, r):
        mask, _ = ldata(li)
        if li == nlev - 1:
            return coarse_solve(r)
        x = smooth(li, None, r, meta.pre, x_is_zero=True)
        res = mask * (r - masked_apply(li, mask, x))
        mask_c, _ = ldata(li + 1)
        rc = mask_c * restrict(li, res)
        xc = vcycle(li + 1, rc)
        x = x + mask * prolong(li, xc)
        x = smooth(li, x, r, meta.post)
        return x

    def minv(r):
        return vcycle(0, r)

    return minv
