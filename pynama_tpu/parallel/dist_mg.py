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
    # vertex-star patch smoothing (levels where it is active); lam_max
    # then holds the PATCH-preconditioned spectrum bound for that level
    use_patch: List[bool] = field(default_factory=list)
    cheb_div: List[float] = field(default_factory=list)
    # per-level super-blocking of the LOCAL blocked layout (period
    # effs[li]-1 nodes; ops/structured.py pick_super_factor on the local
    # nelem). effs[li] == ngl when the level stays parity-blocked.
    sbs: List[int] = field(default_factory=list)
    effs: List[int] = field(default_factory=list)
    # blocked-native transfer strides per jump (None = grid-path
    # transfer); kernels live in repl["levels"][li]["Wt"]
    tms: List[Optional[int]] = field(default_factory=list)
    # coarse-grid agglomeration: the distributed hierarchy covers only
    # the leading slab-divisible levels; the coarser tail runs as a
    # replicated single-chip V-cycle after an all_gather (repl["tail"])
    aggl: bool = False
    tail_npts: Optional[tuple] = None  # agglomeration level, MESH order
    # blocked-layout period of the replicated tail V-cycle (the tail's
    # fine level may super-block, ops/structured.py pick_super_factor)
    tail_ngl: Optional[int] = None


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

    # distributed prefix: levels whose last mesh axis the slab divides,
    # cut at the first padded (fictitious-domain) jump — the transfer
    # across it stays single-chip. Everything coarser runs agglomerated:
    # all_gather the residual at level m-1 and apply the replicated
    # single-chip tail V-cycle (identical arithmetic to single-chip MG;
    # the standard coarse-grid agglomeration of parallel multigrid).
    nlev_full = len(mg.levels)
    m = 0
    for li, lvl in enumerate(mg.levels):
        if lvl.mesh.nelem[-1] % n_dev != 0:
            break
        m = li + 1
        if li < nlev_full - 1 and getattr(lvl, "ext_mesh", None) is not None:
            break  # padded jump: level li is the last distributed one
    if m == 0:
        return None
    aggl = m < nlev_full

    from pynama_tpu.parallel.slab import GridDecomposition

    # per-level smoother: vertex-star patch Schwarz (the single-chip
    # round-3 contraction fix) wherever the blocked layout is active, the
    # patch kernels exist, and every device owns >= 2 element slabs (the
    # footprint-5 margin exchange reaches one neighbor each side, so a
    # device must cover the 2-block write radius); pointwise Jacobi
    # elsewhere. lam_max follows the smoother (Chebyshev window).
    lam_jac = list(getattr(mg, "lam_max_jacobi", mg.lam_max))
    patch_W = getattr(mg, "patch_W", None)
    from pynama_tpu.ops.structured import pick_super_factor

    use_patch, lam, cdiv, sbs, effs = [], [], [], [], []
    for li, lvl in enumerate(mg.levels[:m]):
        dec_li = GridDecomposition(lvl.mesh, (n_dev,))
        f_li = (pick_super_factor(tuple(dec_li.local_nelem), N, dim)
                if sharded.blocked else 1)
        sbs.append(f_li)
        effs.append(f_li * (N - 1) + 1)
        ne_loc_last = lvl.mesh.nelem[-1] // n_dev
        # patch margin: the footprint-Q ghost exchange reaches one
        # neighbor each side; the receive slab is Q+1 blocks (Q=1 super,
        # Q=2 parity), so a device must own >= Q+1 local blocks
        ok = (sharded.blocked and patch_W is not None
              and (ne_loc_last // f_li) + 1 >= (2 if f_li > 1 else 3))
        use_patch.append(ok)
        lam.append(mg.lam_max[li] if ok else lam_jac[li])
        cdiv.append(mg.cheb_div if ok else 4.0)

    meta = _DistMGMeta(
        ngl=N, dim=dim, blocked=sharded.blocked,
        axis_name=sharded.axis_names[0], n_dev=n_dev,
        lam_max=lam,
        ratios=[l.ratio for l in mg.levels[:m - 1]],
        local_nelem=[], local_npts=[], rows_loc=[],
        pre=mg.pre, post=mg.post,
        use_patch=use_patch, cheb_div=cdiv,
        sbs=sbs, effs=effs,
        aggl=aggl,
        tail_npts=tuple(mg.levels[m - 1].mesh.npts) if aggl else None,
        tail_ngl=(getattr(mg.levels[m - 1].K, "eff_ngl", N)
                  if aggl else None),
    )
    stacked = []
    repl = []
    for li, lvl in enumerate(mg.levels[:m]):
        dec = GridDecomposition(lvl.mesh, (n_dev,))
        meta.local_nelem.append(dec.local_nelem)
        meta.local_npts.append(dec.local_npts)
        meta.rows_loc.append(dec.rows_loc[0])
        eff = effs[li]

        def loc_grid(g):
            flat = np.asarray(g).reshape(-1)
            return dec.to_local_grid(flat, dim)

        def to_solver(g):
            loc = loc_grid(g)
            if not sharded.blocked:
                return jnp.asarray(loc, dtype=g.dtype)
            from pynama_tpu.ops.conv import to_blocked

            return jnp.stack([
                to_blocked(jnp.asarray(loc[d]), eff) for d in range(n_dev)
            ])

        st = {
            "diag": to_solver(lvl.diag),
            "mask": to_solver(lvl.mask),
        }
        if sharded.blocked or use_patch[li]:
            from pynama_tpu.ops.conv import to_blocked

            # input-ownership weights for the linear decomposition of
            # kernel-form operators (patch smoother, blocked transfers):
            # interior slab-interface node planes carry 0.5 on BOTH
            # owners, so sum_d x_owned_d == x_global exactly
            half = np.ones((n_dev,) + tuple(reversed(dec.local_npts))
                           + (dim,))
            if n_dev > 1:
                half[:-1, -1] = 0.5  # upper interface plane (grid axis 0)
                half[1:, 0] = 0.5    # lower interface plane
            st["half"] = jnp.stack([
                to_blocked(jnp.asarray(half[d], dtype=dtype), eff)
                for d in range(n_dev)
            ]) if sharded.blocked else jnp.asarray(half, dtype=dtype)
        rp = {"A": jnp.asarray(lvl.K.A, dtype=dtype)}
        if use_patch[li]:
            from pynama_tpu.ops.conv import rebase_conv_kernel

            rp["patch_W"] = jnp.asarray(
                rebase_conv_kernel(np.asarray(patch_W[li]), sbs[li], dim,
                                   dim, dim, N),
                dtype=dtype,
            )
        if li + 1 < m:
            st["mult"] = jnp.asarray(loc_grid(lvl.mult_inv),
                                     dtype=dtype)  # grid layout
            if sharded.blocked:
                from pynama_tpu.ops.conv import to_blocked

                st["mult_b"] = jnp.stack([
                    to_blocked(jnp.asarray(st["mult"][d]), eff)
                    for d in range(n_dev)
                ])
            rp["interp"] = lvl.interp_k
            # blocked-native transfer kernel at the LOCAL periods; the
            # margin machinery below covers one ghost block per side, so
            # only kernels whose tap window stays within that (upward
            # restrict reach e_lo//m == 0) qualify — parity-level kernels
            # (m == r, e_lo == r) keep the grid path
            tk = (mg._transfer_kernel(li, effs[li] - 1, effs[li + 1] - 1)
                  if sharded.blocked else None)
            if tk is not None and tk[2] // tk[1] == 0:
                rp["Wt"] = jnp.asarray(tk[0], dtype=dtype)
                meta.tms.append((tk[1], tk[2]))
            else:
                meta.tms.append(None)
        stacked.append(st)
        repl.append(rp)
    repl_top = {"levels": repl}
    if aggl:
        # replicated tail V-cycle over levels [m-1:] (same arithmetic as
        # the single-chip preconditioner from that level down)
        repl_top["tail"] = mg.build(
            fine_mask=None if sharded.blocked else mg.levels[m - 1].mask,
            start_level=m - 1,
        )
    else:
        repl_top["coarse_inv"] = mg.coarse_inv
    return meta, stacked, repl_top


def dist_patch_apply(W, half, mask, r, axis, n_dev):
    """Distributed masked vertex-star Schwarz: sum_p R_p^T B R_p.

    The single-chip footprint-5 blocked conv (ops/conv.py
    build_patch_kernel) decomposed linearly over slabs: each device owns
    a share of the input (interface node planes carry weight 0.5 on BOTH
    owners, so the owned shares sum to the global vector), convolves it
    over its slab EXTENDED by the 2-block write radius, and the ghost
    margins are exchanged and summed — sum_d conv(x_d) == conv(x)
    exactly. Mirrors MGPreconditioner._patch_apply
    (solvers/multigrid.py) on the slab decomposition.
    """
    from pynama_tpu.ops.conv import conv_blocked

    Q = (W.shape[0] - 1) // 2  # 2 for the vertex-star footprint 5
    xo = mask * r * half
    B0 = xo.shape[0]
    pads = ((Q, Q),) + ((0, 0),) * (xo.ndim - 1)
    y_ext = conv_blocked(jnp.pad(xo, pads), W, jax.lax.Precision.HIGHEST)
    y = y_ext[Q:B0 + Q]
    if n_dev > 1:
        # margin exchange: [ghost-2, ghost-1, block0] down, [last block,
        # ghost+1, ghost+2] up; block alignment: my block 0 == lower
        # neighbor's LAST block (they are the same global element block)
        m = Q + 1
        from_above = jax.lax.ppermute(
            y_ext[:m], axis, [(i, i - 1) for i in range(1, n_dev)]
        )
        from_below = jax.lax.ppermute(
            y_ext[B0 + Q - 1:], axis,
            [(i, i + 1) for i in range(n_dev - 1)]
        )
        y = y.at[B0 - m:].add(from_above)
        y = y.at[:m].add(from_below)
    # mask re-zeroes pad slots (the received neighbor margins carry the
    # neighbor's real values in slots that are pad on this device)
    return mask * y


def _margin_sum(y_ext, gl, gh, B0, axis, n_dev):
    """Exchange block margins of a kernel-form operator output.

    y_ext covers local blocks [-gl, B0 + gh) along the partitioned axis
    (axis 0); block overlap convention: my block 0 == the lower
    neighbor's block B0-1 (the same global block). Sending my blocks
    [-gl..0] down and [B0-1..B0-1+gh] up and adding the received margins
    completes Σ_d conv(zero-extended owned share) == conv(x_global) on
    every stored block of every device (the dist_patch_apply pattern,
    gl == gh == Q).
    """
    core = y_ext[gl:gl + B0]
    if n_dev == 1:
        return core
    down = y_ext[:gl + 1]
    up = y_ext[gl + B0 - 1:]
    from_above = jax.lax.ppermute(
        down, axis, [(i, i - 1) for i in range(1, n_dev)]
    )
    from_below = jax.lax.ppermute(
        up, axis, [(i, i + 1) for i in range(n_dev - 1)]
    )
    core = core.at[B0 - 1 - gl:].add(from_above)
    core = core.at[:gh + 1].add(from_below)
    return core


def make_minv(meta: _DistMGMeta, stacked_local, repl, fine_mask,
              fine_boundary_free=True):
    """Build the distributed V-cycle closure INSIDE a shard_map body.

    stacked_local: per-level dicts with the leading slab axis already
    squeezed; repl: the replicated pytree; fine_mask: the caller's
    fine-level free mask (solver layout, local). fine_boundary_free:
    does the GLOBAL solve mask free any domain-boundary dof? If so,
    level 0 keeps the grid-path transfer (the probed kernels' phantom
    windows read boundary planes — exact only on zero-boundary
    operands; see MGPreconditioner.build).
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
            sb=(meta.sbs[li] if meta.sbs else 1),
        )
        for li in range(nlev)
    ]
    effs = meta.effs if meta.effs else [N] * nlev

    def halo(li, y):
        if blocked:
            return halo_sum_blocked_axis(y, effs[li] - 1, dim, 0, axis,
                                         n_dev)
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

    def patch_apply(li, mask, r):
        lvl = stacked_local[li]
        W = repl["levels"][li]["patch_W"]
        return dist_patch_apply(W, lvl["half"], mask, r, axis, n_dev)

    def smooth(li, x, b, n, x_is_zero=False):
        mask, diag = ldata(li)
        lmax = meta.lam_max[li]
        lmin = lmax / meta.cheb_div[li]
        theta = 0.5 * (lmax + lmin)
        delta = 0.5 * (lmax - lmin)
        if meta.use_patch[li]:
            pc = lambda v: patch_apply(li, mask, v)
        else:
            dinv = 1.0 / (mask * diag + (1.0 - mask))
            pc = lambda v: dinv * v
        if x_is_zero:
            x, r = jnp.zeros_like(b), b
        else:
            r = b - masked_apply(li, mask, x)
        d = (1.0 / theta) * pc(r)
        sigma = theta / delta
        rho = 1.0 / sigma
        for _ in range(n):
            x = x + d
            r = r - masked_apply(li, mask, d)
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = (rho_new * rho) * d + (2.0 * rho_new / delta) * pc(r)
            rho = rho_new
        return x + d

    def to_grid(li, x):
        if not blocked:
            return x
        from pynama_tpu.ops.conv import from_blocked

        return from_blocked(x, effs[li],
                            tuple(reversed(meta.local_npts[li])))

    def to_solver(li, g):
        if not blocked:
            return g
        from pynama_tpu.ops.conv import to_blocked

        return to_blocked(g, effs[li])

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

    def _B_loc(li):
        s = effs[li] - 1
        return tuple((n - 1) // s + 1
                     for n in reversed(meta.local_npts[li]))

    def tk_tm(li):
        if not meta.tms:
            return None
        if li == 0 and fine_boundary_free:
            return None
        return meta.tms[li]

    def restrict(li, res):
        """Fine local residual (solver layout) -> coarse (solver layout)."""
        lvl = stacked_local[li]
        tm = tk_tm(li)
        if blocked and tm is not None:
            from pynama_tpu.solvers.multigrid import blocked_restrict_apply

            # kernel-form restriction: halve interface-plane inputs
            # (ownership shares), compute the downward ghost blocks the
            # tap window can reach, and margin-sum — cell contributions
            # cannot be attributed to a side in kernel form, so the
            # patch-apply linearity trick replaces the grid path's
            # per-cell locality + plane halo
            m, e_lo = tm
            T = repl["levels"][li]["Wt"].shape[0]
            e_hi = T - 1 - e_lo - m
            gl = (m + e_hi) // m
            Bc = _B_loc(li + 1)
            x = res * lvl["mult_b"] * lvl["half"]
            rc_ext = blocked_restrict_apply(
                x, repl["levels"][li]["Wt"], m, e_lo, Bc, dim,
                lo_ghost=gl,
            )
            return _margin_sum(rc_ext, gl, 0, Bc[0], axis, n_dev)
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
        tm = tk_tm(li)
        if blocked and tm is not None:
            from pynama_tpu.solvers.multigrid import blocked_prolong_apply

            m, e_lo = tm
            T = repl["levels"][li]["Wt"].shape[0]
            e_hi = T - 1 - e_lo - m
            Bf = _B_loc(li)
            xo = xc * stacked_local[li + 1]["half"]
            y_ext = blocked_prolong_apply(
                xo, repl["levels"][li]["Wt"], m, e_lo, Bf, dim,
                lo_ghost=e_lo, hi_ghost=m + e_hi,
            )
            y = _margin_sum(y_ext, e_lo, m + e_hi, Bf[0], axis, n_dev)
            return y * lvl["mult_b"]
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
        """Replicated coarse branch: all_gather -> de-dup -> solve -> slice.

        The solve is either the dense masked inverse (full hierarchy
        distributed) or the single-chip tail V-cycle over the remaining
        levels (coarse-grid agglomeration, meta.aggl) — each device
        redundantly computes the identical global coarse correction.
        """
        rg = to_grid(nlev - 1, r)  # (rows_loc, ..., dim)
        gathered = jax.lax.all_gather(rg, axis)  # (n_dev, rows_loc, ..., dim)
        parts = [gathered[0]] + [gathered[d][1:] for d in range(1, n_dev)]
        full = jnp.concatenate(parts, axis=0)
        if meta.aggl:
            if blocked:
                from pynama_tpu.ops.conv import from_blocked, to_blocked

                xg = to_blocked(full, meta.tail_ngl)
                xg = repl["tail"](xg)
                x = from_blocked(xg, meta.tail_ngl,
                                 tuple(reversed(meta.tail_npts)))
            else:
                x = repl["tail"](full)
        else:
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
