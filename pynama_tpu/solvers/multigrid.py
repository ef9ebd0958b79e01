"""Geometric multigrid V-cycle preconditioner for the KLE stiffness K.

The reference sidesteps iterative-solver design entirely with a sparse
direct LU (/root/reference/src/solver/ksp_solver.py:12-19); on TPU the
equivalent "solve fast" primitive is CG preconditioned by a geometric
V-cycle over the nested element hierarchy:

  * levels: the same box re-meshed with nelem/2 per level (uniform
    spectral elements, one shared elemental matrix per level),
  * prolongation: the NATURAL INJECTION of the coarse Q_{ngl-1} space into
    the fine space — coarse-element basis evaluated at the 2x2 (2x2x2)
    fine subcell nodes, applied as batched GEMMs (MXU) with a
    multiplicity-corrected scatter; restriction is its exact adjoint, so
    the V-cycle is symmetric and CG-safe,
  * smoother: damped Jacobi (pointwise, bandwidth-bound, XLA-fused),
  * coarsest level: dense inverse of the masked operator, materialized
    once at setup.

Coarse operators are GALERKIN (RAP): because prolongation is the exact
FEM-space injection and the fine operator assembles ONE shared elemental
matrix on a uniform mesh, P^T K_f P has a closed-form ELEMENTAL matrix

    K_c^el = sum_s  interp[s]^T  K_f^el  interp[s]

(sum over the ratio^dim fine subcells of a coarse cell), computed
recursively per level on host and dropped into the same
StructuredElementOp/conv machinery as the fine operator. A rediscretized
coarse operator (elem.kle_matrices on the coarse mesh) differs in the
reduced-quadrature penalty terms (alpha_d=1e3 dominates K); that
mismatch leaves a family of penalty-dominated modes uncorrected and
caps the V-cycle contraction near ~0.94 — Galerkin removes it exactly
(round-3 fix; contraction and CG iteration counts verified in
tests/test_multigrid.py).
"""

import os
from dataclasses import dataclass
from functools import partial
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pynama_tpu.elements.lagrange import lagrange_basis
from pynama_tpu.elements.quadrature import lobatto_points
from pynama_tpu.elements.spectral import SpectralElement
from pynama_tpu.kle import build_kle_system
from pynama_tpu.mesh.structured import BoxMesh


def _group_axis(x, axis, m, Bc):
    """Pad + reshape one block axis to (Bc + 1, m) block groups."""
    need = m * (Bc + 1)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, need - x.shape[axis])
    x = jnp.pad(x, pad)
    shape = x.shape[:axis] + (Bc + 1, m) + x.shape[axis + 1:]
    return x.reshape(shape)


def blocked_restrict_apply(x, Wr, m, e_lo, Bc, dim, lo_ghost=0,
                           hi_ghost=0):
    """Stride-m block restriction on super-blocked tensors.

    x: (Bf..., Cf) fine blocked (already multiplied by the blocked
    1/multiplicity weights; pad slots zero). Coarse block bc accumulates
    x[m*bc + t - e_lo] @ Wr[t] over taps t in [0, T) per axis — the tap
    window spans [-e_lo, T-1-e_lo] fine blocks because restriction rows
    reach r*P fine nodes past a coarse block's own fine image (the cells
    containing a coarse node stick out of the block). Implemented by
    grouping each axis into (group, residue) so every tap is a plain
    (non-strided) slice; the TPU serializes strided slicing.

    lo_ghost > 0 additionally computes that many ghost coarse blocks
    BELOW index 0 on axis 0 (leading output axis size Bc[0]+lo_ghost,
    ghost first) — the distributed path's downward margin.
    """
    T = Wr.shape[0]
    Bc_out = (Bc[0] + lo_ghost + hi_ghost,) + tuple(Bc[1:])
    # shift so tap t reads shifted block m*bc + t (+ ghosts below)
    pads = [(e_lo + m * lo_ghost, 0)] + [(e_lo, 0)] * (dim - 1)
    x = jnp.pad(x, pads + [(0, 0)])
    n_extra = -(-T // m) + 1  # groups beyond Bc needed by the taps
    for a in range(dim):
        x = _group_axis(x, 2 * a, m, Bc_out[a] + n_extra - 1)
    out = None
    for t in np.ndindex(*(T,) * dim):
        idx = []
        for a in range(dim):
            idx += [slice(t[a] // m, Bc_out[a] + t[a] // m), t[a] % m]
        sl = x[tuple(idx) + (slice(None),)]
        v = jnp.matmul(sl, Wr[t], precision=jax.lax.Precision.HIGHEST)
        out = v if out is None else out + v
    return out


def blocked_prolong_apply(xc, Wr, m, e_lo, Bf, dim, lo_ghost=0,
                          hi_ghost=0):
    """Adjoint of blocked_restrict_apply (before multiplicity weights).

    xc: (Bc..., Cc) coarse blocked correction with zero pad slots.
    Returns the (Bf..., Cf) fine blocked scatter; callers multiply by
    the fine blocked 1/multiplicity weights (and complete slab halos in
    the distributed path) afterwards. lo_ghost > 0 prepends that many
    ghost FINE blocks below index 0 on axis 0 (output leading axis
    Bf[0]+lo_ghost, ghost first).
    """
    T = Wr.shape[0]
    Bc = xc.shape[:dim]
    Cf = Wr.shape[-2]
    # fine block m*bc + (t - e_lo): group shift s_t = floor((t-e_lo)/m),
    # residue (t - e_lo) mod m; s_t ranges over [smin, smax]
    shifts = [( (t - e_lo) // m, (t - e_lo) % m) for t in range(T)]
    smin = min(s for s, _ in shifts)
    smax = max(s for s, _ in shifts)
    nsl = smax - smin + 1  # slab positions per axis: group = p + smin
    slabs = {}
    for t in np.ndindex(*(T,) * dim):
        v = jnp.matmul(xc, jnp.swapaxes(Wr[t], -1, -2),
                       precision=jax.lax.Precision.HIGHEST)
        rho = tuple(shifts[ta][1] for ta in t)
        pads = [(shifts[ta][0] - smin, smax - shifts[ta][0]) for ta in t]
        v = jnp.pad(v, pads + [(0, 0)])
        slabs[rho] = slabs.get(rho, 0.0) + v
    zero = None
    parts = []
    for rho in np.ndindex(*(m,) * dim):
        if rho in slabs:
            parts.append(slabs[rho])
        else:
            if zero is None:
                zero = jnp.zeros(
                    tuple(b + nsl - 1 for b in Bc) + (Cf,), xc.dtype)
            parts.append(zero)
    parts = jnp.stack(parts, axis=0)
    parts = parts.reshape((m,) * dim + parts.shape[1:])
    perm = []
    for a in range(dim):
        perm += [dim + a, a]  # interleave (g_a, r_a)
    perm.append(2 * dim)
    parts = parts.transpose(perm)
    full = parts.reshape(tuple(m * (b + nsl - 1) for b in Bc) + (Cf,))
    # slab p=0 is group smin: fine block m*(p + smin) + rho
    off = -m * smin  # full index of fine block 0
    sl = (slice(off - lo_ghost, off + Bf[0] + hi_ghost),) + tuple(
        slice(off, off + Bf[a]) for a in range(1, dim)
    ) + (slice(None),)
    return full[sl]


def _kron_all(mats):
    out = mats[0]
    for m in mats[1:]:
        out = np.kron(out, m)
    return out


def _patch_matrix(K_el, ngl, dim):
    """Exact interior vertex-star patch stiffness R_p A R_p^T.

    The vertex-star patch = the 2^dim elements sharing a mesh vertex,
    (2*ngl-1)^dim nodes. Its exact stiffness (the restriction of the
    ASSEMBLED operator to patch dofs) is assembled on a 4^dim-element
    local grid — large enough that every element coupling into patch
    nodes is present — and is translation-invariant on a uniform mesh,
    so ONE matrix serves every interior vertex. Used (inverted) as the
    additive-Schwarz smoother block: the penalty-robust alternative to
    point Jacobi (alpha_d=1e3 grad-div penalties leave point smoothers
    with O(1) V-cycle contraction; vertex-star patches are the standard
    parameter-robust fix, cf. Schoeberl / Farrell-Mitchell-Wechsung).
    """
    P = ngl - 1
    m = BoxMesh(nelem=(4,) * dim, lower=(0,) * dim, upper=(1,) * dim,
                ngl=ngl)
    n = m.n_nodes * dim
    vd = np.asarray(m.cell_dofs(dim), dtype=np.int64)
    K_full = np.zeros((n, n))
    for e in range(m.n_cells):
        idx = vd[e]
        K_full[np.ix_(idx, idx)] += K_el
    npl = 4 * P + 1
    coords = np.stack(
        np.meshgrid(*([np.arange(npl)] * dim), indexing="ij"), axis=-1
    ).reshape(-1, dim)  # flat index = node id (grid order, x fastest)
    sel = np.all((coords >= P) & (coords <= 3 * P), axis=1)
    nodes = np.flatnonzero(sel)
    dofs = (nodes[:, None] * dim + np.arange(dim)[None, :]).reshape(-1)
    return K_full[np.ix_(dofs, dofs)]


def _subcell_interp_matrices(ngl, dim, ratio=2):
    """Coarse-element basis at each ratio^dim fine-subcell's nodes.

    Returns (ratio**dim, nnode, nnode): Interp[s] maps coarse-cell nodal
    values to the s-th fine subcell's nodal values. Subcell index s is
    lexicographic (x fastest), matching the fine-cell numbering.
    Supports coarsening ratios 2 and 4 (a 4x jump keeps the hierarchy
    depth bounded; see max_levels).
    """
    nodes, _ = lobatto_points(ngl)
    hs = []
    for part in range(ratio):
        # fine subcell `part` spans [-1 + 2p/r, -1 + 2(p+1)/r] of coarse
        pts = (nodes + 1.0) / ratio + (2.0 * part / ratio) - 1.0
        h, _ = lagrange_basis(nodes, pts)
        hs.append(h)
    out = []
    for s in range(ratio**dim):
        digits = []
        ss = s
        for _ in range(dim):  # x digit first
            digits.append(ss % ratio)
            ss //= ratio
        factors = [hs[digits[axis]] for axis in reversed(range(dim))]
        out.append(_kron_all(factors))
    return np.stack(out)


@dataclass
class _Level:
    mesh: BoxMesh
    K: object                 # elemental K apply (StructuredElementOp)
    diag: jnp.ndarray         # assembled diag of K (unmasked)
    mask: jnp.ndarray         # Dirichlet free mask (coarse levels)
    diag_b: Optional[jnp.ndarray] = None  # parity-blocked variants (TPU
    mask_b: Optional[jnp.ndarray] = None  # hot path runs fully blocked)
    # transfer to the NEXT-COARSER level (None on the coarsest)
    ratio: int = 2            # coarsening ratio toward the next level
    interp_k: Optional[jnp.ndarray] = None    # (r^dim, nnode*d, nnode*d)
    mult_inv: Optional[jnp.ndarray] = None    # (..grid.., d) 1/multiplicity
    # extended FINE mesh for a padded (fictitious-domain) jump; transfers
    # pad/crop between this grid and the real one. None = no pad.
    ext_mesh: Optional[BoxMesh] = None


class MGPreconditioner:
    """V-cycle preconditioner; builds once per (mesh, element)."""

    def __init__(self, mesh: BoxMesh, elem: SpectralElement,
                 dtype=jnp.float64, pre_smooth: int = 3, post_smooth: int = 3,
                 coarsest_max_dofs: int = 1500,
                 min_levels: int = 2, max_levels: int = 5,
                 galerkin: bool = True, smoother: str = "patch",
                 cheb_div: float = None):
        self.dim = mesh.dim
        self.dtype = dtype
        self.pre, self.post = pre_smooth, post_smooth
        # Chebyshev window [lam_max/cheb_div, lam_max]: the patch-Schwarz
        # preconditioned spectrum is wide-banded (boundary/overlap modes
        # reach ~4x the interior band), so a wide window wins; Jacobi's
        # spectrum is tight at the top and 4 is best (measured).
        self.cheb_div = cheb_div if cheb_div is not None else (
            16.0 if smoother == "patch" else 4.0
        )
        self.elem = elem

        # max_levels=5: deeper V-cycle programs miscompile on the axon TPU
        # backend (6-level hierarchies diverge at any size while every
        # 5-level hierarchy converges; applies/transfers verified
        # bit-comparable against CPU). When the chain would exceed the
        # cap, the topmost jumps are merged into one larger ratio.
        def _dofs(nel):
            return BoxMesh(
                nelem=tuple(nel), lower=mesh.lower, upper=mesh.upper,
                ngl=mesh.ngl,
            ).n_nodes * mesh.dim

        # each jump is (ratio, ne_ext): the fine level is conceptually
        # extended to ne_ext elements per axis (ghost band of < r elements
        # at the upper side, Dirichlet-masked on the coarse side) before
        # the ratio-r coarsening. ne_ext == ne for evenly-divisible sizes
        # (the common case, zero overhead); prime-ish sizes (7, 359, ...)
        # get a fictitious-domain jump instead of the round-2 Jacobi
        # fallback. Transfers pad/crop at the jump (exact adjoints, so
        # the V-cycle stays symmetric/SPD).
        jumps = []  # fine -> coarse order
        ne = list(mesh.nelem)
        while True:
            # smallest admissible ratio first (gentler jumps converge
            # better); 2/3/5 cover every nelem that is not prime-heavy
            for r in (2, 3, 5):
                if all(n % r == 0 and n >= r for n in ne):
                    break
            else:
                if not all(n >= 3 for n in ne):
                    break  # tiny: current ne is coarsest
                r = 2  # pad to the next even count and halve
            ne_ext = tuple(-(-n // r) * r for n in ne)
            jumps.append((r, ne_ext))
            ne = [n // r for n in ne_ext]
            if _dofs(ne) < coarsest_max_dofs:
                break
        # merge adjacent PAD-FREE jumps (coarse end first, where transfers
        # are cheap) until the level count fits max_levels
        def _padfree(i):
            ne_i = list(mesh.nelem)
            for j in range(i):
                ne_i = [n // jumps[j][0] for n in jumps[j][1]]
            return tuple(jumps[i][1]) == (tuple(mesh.nelem) if i == 0
                                          else tuple(ne_i))
        while len(jumps) + 1 > max_levels:
            for i in range(len(jumps) - 2, -1, -1):
                if (jumps[i][0] * jumps[i + 1][0] <= 8
                        and _padfree(i) and _padfree(i + 1)):
                    jumps[i:i + 2] = [(jumps[i][0] * jumps[i + 1][0],
                                       jumps[i][1])]
                    break
            else:
                break
        jumps = jumps[: max_levels - 1]
        meshes = [mesh]
        ext_meshes = []  # per jump: extended FINE mesh (None = no pad)
        for r, ne_ext in jumps:
            prev = meshes[-1]
            ha = [(prev.upper[a] - prev.lower[a]) / prev.nelem[a]
                  for a in range(self.dim)]
            upper_ext = tuple(prev.lower[a] + ne_ext[a] * ha[a]
                              for a in range(self.dim))
            if tuple(ne_ext) == tuple(prev.nelem):
                ext_meshes.append(None)
            else:
                ext_meshes.append(BoxMesh(
                    nelem=ne_ext, lower=prev.lower, upper=upper_ext,
                    ngl=mesh.ngl,
                ))
            meshes.append(BoxMesh(
                nelem=tuple(n // r for n in ne_ext), lower=prev.lower,
                upper=upper_ext, ngl=mesh.ngl,
            ))
        factors = [r for r, _ in jumps]
        self.ratios = factors
        self.usable = len(meshes) >= min_levels and (
            meshes[-1].n_nodes * mesh.dim <= coarsest_max_dofs * 2
        )
        if not self.usable:
            return

        interp_cache = {}

        def interp_for(r):
            if r not in interp_cache:
                interp = _subcell_interp_matrices(mesh.ngl, mesh.dim, r)
                interp_cache[r] = np.stack(
                    [np.kron(m_, np.eye(mesh.dim)) for m_ in interp]
                )
            return interp_cache[r]

        # per-level ELEMENTAL matrices: level 0 from the element, coarser
        # levels by recursive Galerkin RAP through the subcell injections
        # (host numpy, float64); falls back to rediscretization when
        # galerkin=False (kept for A/B contraction measurements).
        K_el0, _, _ = elem.kle_matrices(mesh.cell_corners[0])
        K_els = [np.asarray(K_el0, dtype=np.float64)]
        for r in factors:
            I = interp_for(r)                      # (r^dim, nnode*d, nnode*d)
            Kf = K_els[-1]
            Kc = np.zeros_like(Kf)
            for s in range(I.shape[0]):
                Kc += I[s].T @ Kf @ I[s]
            K_els.append(Kc)

        self.levels: List[_Level] = []
        for li, m in enumerate(meshes):
            from pynama_tpu.ops.structured import (StructuredElementOp,
                                                   pick_super_factor)

            if li == 0 or not galerkin:
                sysm = build_kle_system(m, elem, dtype)
                K_op, diag_flat = sysm.K, sysm.diag_K
            else:
                K_op = StructuredElementOp(
                    A=jnp.asarray(K_els[li], dtype=dtype), ngl=m.ngl,
                    nelem=tuple(m.nelem), npts=tuple(m.npts),
                    k_in=m.dim, k_out=m.dim,
                    sb=pick_super_factor(tuple(m.nelem), m.ngl, m.dim),
                )
                diag_flat = K_op.diagonal()
            gshape = tuple(reversed(m.npts)) + (m.dim,)
            dmask = np.ones(m.n_nodes * m.dim)
            dmask[m.node_dofs(m.boundary_nodes, m.dim)] = 0.0
            if li > 0 and tuple(m.upper) != tuple(mesh.upper):
                # coarse level of a padded jump: Dirichlet-mask every node
                # in the ghost band beyond the ORIGINAL domain (its fine
                # injection would be chopped by the fine mask anyway)
                beyond = np.zeros(m.n_nodes, dtype=bool)
                for a in range(self.dim):
                    tol = 1e-9 * (m.upper[a] - m.lower[a])
                    beyond |= m.coords[:, a] > mesh.upper[a] + tol
                dmask[np.repeat(beyond, m.dim)] = 0.0
            lvl = _Level(
                mesh=m,
                K=K_op,
                diag=jnp.asarray(
                    np.asarray(diag_flat).reshape(gshape), dtype=dtype
                ),
                mask=jnp.asarray(dmask.reshape(gshape), dtype=dtype),
            )
            if hasattr(K_op, "to_blocked"):
                lvl.diag_b = K_op.to_blocked(lvl.diag)
                lvl.mask_b = K_op.to_blocked(lvl.mask)
            if li + 1 < len(meshes):
                lvl.ratio = self.ratios[li]
                lvl.interp_k = jnp.asarray(interp_for(lvl.ratio), dtype=dtype)
                lvl.ext_mesh = ext_meshes[li]
                em = lvl.ext_mesh if lvl.ext_mesh is not None else m
                # fine-node multiplicity under the subcell scatter (over
                # the EXTENDED grid for padded jumps)
                counts = np.zeros(em.n_nodes)
                c2n = np.asarray(em.cell2node)
                np.add.at(counts, c2n.reshape(-1), 1.0)
                lvl.mult_inv = jnp.asarray(
                    np.repeat(1.0 / counts, m.dim).reshape(
                        tuple(reversed(em.npts)) + (m.dim,)
                    ),
                    dtype=dtype,
                )
            self.levels.append(lvl)

        # vertex-star additive-Schwarz smoother blocks: per-level patch
        # stiffness inverse, lowered to a footprint-5 parity-blocked conv
        # kernel (pynama_tpu/ops/conv.py build_patch_kernel)
        self.smoother = smoother
        self.patch_W = None   # parity layout (grid applies + dist path)
        self.patch_Wb = None  # per-level blocked layout (super-rebased)
        if smoother == "patch":
            from pynama_tpu.ops.conv import (build_patch_kernel,
                                             rebase_conv_kernel)

            self.patch_W = []
            self.patch_Wb = []
            for li, m in enumerate(meshes):
                if galerkin or li == 0:
                    K_lvl = K_els[li]
                else:
                    K_lvl = np.asarray(
                        elem.kle_matrices(m.cell_corners[0])[0]
                    )
                Ap = _patch_matrix(K_lvl, mesh.ngl, self.dim)
                Wp = build_patch_kernel(
                    np.linalg.inv(Ap), mesh.ngl, self.dim, self.dim, dtype
                )
                self.patch_W.append(Wp)
                self.patch_Wb.append(rebase_conv_kernel(
                    Wp, self.levels[li].K.sb, self.dim, self.dim,
                    self.dim, mesh.ngl,
                ))

        # per-level lambda_max(M^-1 K) estimates (power iteration) for the
        # Chebyshev smoother, M = the smoother preconditioner (patch
        # Schwarz or pointwise Jacobi — the penalty terms push Jacobi's
        # lambda_max well above 2, so a fixed damping weight would diverge).
        # Estimates are pure numbers determined by (elemental matrix,
        # level shape, mask, smoother): cache them on disk — the power
        # iterations recompile remotely whenever code changes and
        # dominate large-problem setup time (~minutes per level on axon).
        import hashlib
        import json

        # user-local cache (NOT a world-writable /tmp path) + a committed
        # read-only seed shipped with the package so known configs (the
        # flagship bench, the driver dryrun) never pay cold power
        # iterations. Keys carry a version tag: any change to the
        # estimation (iteration count, safety factor) must bump it.
        cache_path = os.environ.get("PYNAMA_LAM_CACHE") or os.path.join(
            os.path.expanduser("~/.cache/pynama"), "lam-cache.json")
        seed_path = os.path.join(os.path.dirname(__file__), os.pardir,
                                 "data", "lam_cache_seed.json")
        lam_cache = {}
        for path in (seed_path, cache_path):
            try:
                lam_cache.update(json.load(open(path)))
            except Exception:
                pass
        rng = np.random.default_rng(7)
        self.lam_max = []           # for THIS preconditioner's smoother
        self.lam_max_jacobi = []    # Jacobi window (distributed V-cycle
        cache_dirty = False
        for li, lvl in enumerate(self.levels):  # still smooths pointwise)
            h = hashlib.sha1()
            h.update(np.asarray(K_els[li]).astype(np.float64).tobytes())
            h.update(np.asarray(lvl.mask, dtype=np.float64).tobytes())
            h.update(repr((tuple(lvl.mesh.npts), self.smoother,
                           str(dtype), galerkin, "lam-v2")).encode())
            key = h.hexdigest()
            if key in lam_cache:
                lam_p, lam_j = lam_cache[key]
                self.lam_max.append(lam_p if lam_p is not None else lam_j)
                self.lam_max_jacobi.append(lam_j)
                continue
            dinv = 1.0 / (lvl.mask * lvl.diag + (1.0 - lvl.mask))
            jac = lambda v, dinv=dinv: dinv * v
            if self.patch_W is not None:
                pcs = [partial(self._patch_apply, li, lvl.mask,
                               blocked=False), jac]
            else:
                pcs = [jac]
            x0 = jnp.asarray(
                rng.normal(size=lvl.mask.shape), dtype=dtype
            ) * lvl.mask

            lams = []
            for pc in pcs:
                @jax.jit
                def power(x, pc=pc, lvl=lvl):
                    def body(_, carry):
                        x, _ = carry
                        y = pc(self._masked_apply(lvl, lvl.mask, x))
                        nrm = jnp.linalg.norm(y)
                        return (y / nrm, nrm / jnp.linalg.norm(x) * 0 + nrm)
                    # track last-step ratio: 24 normalized steps then one
                    x, _ = jax.lax.fori_loop(0, 24, body,
                                             (x, jnp.asarray(1.0, dtype)))
                    y = pc(self._masked_apply(lvl, lvl.mask, x))
                    return jnp.linalg.norm(y) / jnp.linalg.norm(x)

                lams.append(1.05 * float(power(x0)))
            self.lam_max.append(lams[0])
            self.lam_max_jacobi.append(lams[-1])
            lam_cache[key] = (lams[0] if len(lams) > 1 else None, lams[-1])
            cache_dirty = True
        if cache_dirty:
            paths = [cache_path]
            if os.environ.get("PYNAMA_LAM_CACHE_WRITE_SEED") == "1":
                paths.append(seed_path)  # populate the committed seed
            for path in paths:
                try:
                    os.makedirs(os.path.dirname(path), exist_ok=True)
                    json.dump(lam_cache, open(path, "w"))
                except Exception:  # pragma: no cover - cache best-effort
                    pass

        # dense inverse on the coarsest level (masked operator). The
        # penalty terms make kappa(K) ~ 1e5-1e6, so a float32 inverse is
        # useless (relative error O(kappa * eps)): materialize and invert
        # in float64 on host numpy, then store in the compute dtype.
        last = self.levels[-1]
        cm = last.mesh
        n = cm.n_nodes * cm.dim
        if galerkin:
            K_el = K_els[len(self.levels) - 1]  # float64 numpy (RAP)
        else:
            K_el, _, _ = elem.kle_matrices(cm.cell_corners[0])
        vd = np.asarray(cm.cell_dofs(cm.dim), dtype=np.int64)
        K_full = np.zeros((n, n))
        for e in range(cm.n_cells):
            idx = vd[e]
            K_full[np.ix_(idx, idx)] += K_el
        m64 = np.asarray(last.mask, dtype=np.float64).reshape(-1)
        K_masked = (m64[:, None] * K_full * m64[None, :]) + np.diag(1.0 - m64)
        self.coarse_inv = jnp.asarray(np.linalg.inv(K_masked), dtype=dtype)

    # ------------------------------------------------------------------
    def _patch_apply(self, li, mask, r, blocked):
        """Masked vertex-star Schwarz apply: mask * sum_p R^T B R (mask*r).

        SPD by construction (sum of PSD patch terms, symmetric masking),
        so it composes with the symmetric Chebyshev/V-cycle for CG.
        """
        from pynama_tpu.ops.conv import (conv_stencil_apply,
                                         conv_stencil_apply_blocked)

        lvl = self.levels[li]
        npg = tuple(reversed(lvl.mesh.npts))
        x = mask * r
        if blocked:
            y = conv_stencil_apply_blocked(x, self.patch_Wb[li], (),
                                           lvl.K.eff_ngl, npg, self.dim)
        else:
            y = conv_stencil_apply(x, self.patch_W[li], (), lvl.mesh.ngl,
                                   npg, self.dim)
        return mask * y

    def _masked_apply(self, lvl: _Level, mask, x, corrections=True):
        if (x.ndim > 1 and hasattr(lvl.K, "apply_blocked")
                and x.shape == lvl.K.blocked_shape_in):
            Kx = lvl.K.apply_blocked(mask * x, corrections=corrections)
        else:
            Kx = lvl.K(mask * x)
        return mask * Kx + (1.0 - mask) * x

    def _subcell_params(self, coarse_mesh, s, ratio):
        """(ncells, step, offset) for fine-grid access of subcell s."""
        N = self.elem.ngl
        dim = self.dim
        digits = []
        ss = s
        for _ in range(dim):  # x digit first
            digits.append(ss % ratio)
            ss //= ratio
        ncells = tuple(coarse_mesh.nelem)
        step = ratio * (N - 1)
        offset = tuple((N - 1) * dgt for dgt in digits)
        return ncells, step, offset

    def _prolong(self, lvl: _Level, next_mesh, xc):
        """Natural injection coarse -> fine (grid-shaped, scatter-free).

        Padded jumps scatter onto the EXTENDED fine grid and crop to the
        real one; _restrict zero-pads, the exact adjoint.
        """
        from pynama_tpu.ops.structured import grid_gather, grid_scatter_add

        d = self.dim
        N = self.elem.ngl
        em = lvl.ext_mesh if lvl.ext_mesh is not None else lvl.mesh
        xce = grid_gather(xc, N, tuple(next_mesh.nelem), N - 1,
                          (0,) * d)  # (ncc, nnode*d)
        fine = jnp.zeros(tuple(reversed(em.npts)) + (d,), dtype=xc.dtype)
        for s in range(lvl.ratio**d):
            vals = xce @ lvl.interp_k[s].T
            ncells, step, offset = self._subcell_params(next_mesh, s, lvl.ratio)
            fine = grid_scatter_add(fine, vals, N, ncells, step, offset)
        fine = fine * lvl.mult_inv
        if em is not lvl.mesh:
            fine = fine[tuple(slice(0, n) for n in reversed(lvl.mesh.npts))
                        + (slice(None),)]
        return fine

    def _restrict(self, lvl: _Level, next_mesh, rf):
        """Exact adjoint of _prolong: fine residual -> coarse residual."""
        from pynama_tpu.ops.structured import grid_gather, grid_scatter_add

        d = self.dim
        N = self.elem.ngl
        em = lvl.ext_mesh if lvl.ext_mesh is not None else lvl.mesh
        if em is not lvl.mesh:
            pads = tuple(
                (0, en - rn) for en, rn in zip(reversed(em.npts),
                                               reversed(lvl.mesh.npts))
            ) + ((0, 0),)
            rf = jnp.pad(rf, pads)
        rfm = rf * lvl.mult_inv
        rc = jnp.zeros(tuple(reversed(next_mesh.npts)) + (d,),
                       dtype=rf.dtype)
        for s in range(lvl.ratio**d):
            ncells, step, offset = self._subcell_params(next_mesh, s, lvl.ratio)
            vals = grid_gather(rfm, N, ncells, step, offset)
            contrib = vals @ lvl.interp_k[s]
            rc = grid_scatter_add(rc, contrib, N, tuple(next_mesh.nelem),
                                  N - 1, (0,) * d)
        return rc

    # ------------------------------------------------------------------
    # blocked-native transfers: the grid path converts blocked -> grid ->
    # blocked at every level boundary, and those transposes cost ~4x a
    # conv apply at 1M dofs — they dominate the V-cycle once smoothing
    # runs on the MXU. On uniform (un-padded) jumps the subcell transfer
    # is a stride-m block map between the two levels' super-lattices
    # (m = ratio * s_coarse / s_fine blocks), applied as (m+1)^dim
    # block-aligned matmuls with reshape-interleave (no strided scatter,
    # which the TPU serializes).
    # ------------------------------------------------------------------
    def _transfer_kernel(self, li, s_f=None, s_c=None):
        """(Wr, m) for the li -> li+1 jump, or None when not admissible.

        Wr[(d0..dd-1)][cf, cc]: the coarse super-block at index bc
        accumulates (x_fine_blocked * mult_inv_b)[m*bc + d] @ Wr[d].
        Built by probing the EXACT grid-path restriction (mult folded
        out) with per-channel impulses on a small local mesh, on CPU.
        s_f/s_c override the levels' own blocked periods (the
        distributed path's LOCAL super factors can differ).
        """
        cache = getattr(self, "_tk_cache", None)
        if cache is None:
            cache = {}
            self._tk_cache = cache
        key = (li, s_f, s_c)
        if key in cache:
            return cache[key]
        lvl, nxt = self.levels[li], self.levels[li + 1]
        res = None
        if lvl.ext_mesh is None and hasattr(lvl.K, "eff_ngl"):
            sf = s_f if s_f is not None else lvl.K.eff_ngl - 1
            sc = s_c if s_c is not None else nxt.K.eff_ngl - 1
            r = lvl.ratio
            if (r * sc) % sf == 0:
                res = self._probe_transfer(li, sf, sc, r)
        cache[key] = res
        return res

    def _transfer_1d(self, s_f, s_c, r):
        """(W1, m, e_lo): the exact DENSE 1D blocked transfer kernel.

        W1[t][p, q]: fine (block m*bc + t - e_lo, slot p) -> coarse
        (block bc, slot q), read off the dense 1D restriction matrix on
        a small interior probe line — pure numpy, microseconds.
        """
        N = self.elem.ngl
        P = N - 1
        m = r * s_c // s_f
        # restriction rows reach r*P fine nodes past a coarse block's own
        # fine image (the cells containing a coarse node stick out of the
        # block), so the tap window spans [-e_lo, m + e_hi] fine blocks
        e_lo = -(-(r * P) // s_f)
        e_hi = (r * (P - 1)) // s_f
        T = e_lo + m + e_hi + 1
        # probe window: impulse blocks 2m - e_lo .. 3m + e_hi, response
        # read at coarse block 2 — all interior to a 5-coarse-block line
        assert 2 * m - e_lo >= 1 and 3 * m + e_hi < 5 * m
        # dense 1D restriction on the probe line (R1[coarse, fine]):
        # per coarse cell e, subcell s, fine local j contributes
        # hs[s][j, i] to coarse local i — the dim=1 slice of _restrict
        # with unit multiplicity (the real mult_inv is applied by the
        # blocked callers before/after the kernel).
        hs = _subcell_interp_matrices(N, 1, r)      # (r, N, N)
        nel_c1 = 5 * (s_c // P)
        nc1 = nel_c1 * P + 1
        nf1 = r * nel_c1 * P + 1
        R1 = np.zeros((nc1, nf1))
        for e in range(nel_c1):
            for s in range(r):
                R1[e * P:(e + 1) * P + 1,
                   (e * r + s) * P:(e * r + s + 1) * P + 1] += hs[s].T
        W1 = np.zeros((T, s_f, s_c))
        for t in range(T):
            bf = 2 * m + t - e_lo
            W1[t] = R1[2 * s_c:3 * s_c, bf * s_f:(bf + 1) * s_f].T
        return W1, m, e_lo

    @staticmethod
    def _tensor_kernel(W1, d, k):
        """Tensor-produce the 1D kernel over d axes, then I_k channels.

        Wr[(t0..td-1)][(p, c), (q, c')] = delta(c, c')
            * prod_a W1[t_a][p_a, q_a]
        matching the blocked layout's independent per-axis partition
        (node n -> block n // s, slot n mod s, channel = flat(slots) * k
        + c — ops/conv.py to_blocked_np).
        """
        T, s_f, s_c = W1.shape
        Wk = W1
        for a in range(1, d):
            Wk = np.einsum("...pq,tab->...tpaqb", Wk, W1).reshape(
                (T,) * (a + 1) + (s_f ** (a + 1), s_c ** (a + 1))
            )
        return np.einsum("...pq,cd->...pcqd", Wk, np.eye(k)).reshape(
            (T,) * d + (s_f**d * k, s_c**d * k)
        )

    def _probe_transfer(self, li, s_f, s_c, r):
        """Blocked stride-m transfer kernel, built in CLOSED FORM.

        The grid-path restriction is a tensor product: interp_k is a
        Kronecker product of ONE 1D subcell-interpolation matrix per
        axis (times I_dim over velocity channels,
        _subcell_interp_matrices), so the d-dim kernel factorizes into
        the 1D kernel of _transfer_1d. (The former d-dimensional
        impulse probe materialized len(taps)*Cf full fine grids: 240 GiB
        at ngl=6 in 3D. Exactness vs the grid path is asserted by the
        blocked-vs-grid V-cycle equivalence tests in
        tests/test_superblock.py, 2D and 3D.)
        """
        d = self.dim
        W1, m, e_lo = self._transfer_1d(s_f, s_c, r)
        Wr = self._tensor_kernel(W1, d, d)
        return jnp.asarray(Wr, dtype=self.dtype), m, e_lo

    def _transfer_subkernels(self, li, s_f=None, s_c=None):
        """{d2: Wr_sub} tensor kernels over d2 < dim axes, for the
        boundary inclusion-exclusion corrections (_transfer_corr)."""
        cache = getattr(self, "_tks_cache", None)
        if cache is None:
            cache = {}
            self._tks_cache = cache
        key = (li, s_f, s_c)
        if key in cache:
            return cache[key]
        lvl, nxt = self.levels[li], self.levels[li + 1]
        sf = s_f if s_f is not None else lvl.K.eff_ngl - 1
        sc = s_c if s_c is not None else nxt.K.eff_ngl - 1
        W1, m, e_lo = self._transfer_1d(sf, sc, lvl.ratio)
        k = self.dim
        subs = {
            d2: jnp.asarray(self._tensor_kernel(W1, d2, k),
                            dtype=self.dtype)
            for d2 in range(1, self.dim)
        }
        res = (subs, sf, sc, m, e_lo)
        cache[key] = res
        return res

    def _transfer_corr(self, li, xr, Bf, Bc, direction, s_f=None,
                       s_c=None):
        """Boundary corrections making blocked transfers exact on
        operands with NONZERO boundary values (e.g. the cavity FS mask,
        which frees wall-tangential dofs).

        The translation-invariant blocked kernel equals the grid-path
        transfer plus phantom-cell terms. In 1D those terms are exactly
        rank-2 with UNIT weight: the phantom cell beyond each end
        injects the fine boundary node into the coarse boundary node
        once extra (the mirrored subcell's interp at the shared corner
        is the identity), so R_grid = K_blocked - E_lo - E_hi with
        E[c_end, f_end] = 1. Tensor-producing over axes gives the
        inclusion-exclusion

            R_grid = sum_S (-1)^{|S|} (prod_{a in S} E_a)
                                      (prod_{a not in S} K_a),

        i.e. tiny per-plane/edge/corner updates: extract the fine
        boundary plane (block 0 / B-1, slot 0 along each axis in S),
        transfer it with the (d-|S|)-dim kernel, and add it at the
        coarse boundary with sign. `direction` is "restrict" or
        "prolong" (the exact adjoint). Returns a list of
        (index_tuple, value) updates for the caller's .at[].add.
        """
        import itertools

        d = self.dim
        k = d
        subs, sf, sc, m, e_lo = self._transfer_subkernels(li, s_f, s_c)
        restrict = direction == "restrict"
        B_in, B_out = (Bf, Bc) if restrict else (Bc, Bf)
        s_in = sf if restrict else sc
        updates = []
        for j in range(1, d + 1):
            sign = -1.0 if j % 2 else 1.0
            for S in itertools.combinations(range(d), j):
                nonS = [a for a in range(d) if a not in S]
                d2 = d - j
                for sides in itertools.product((0, 1), repeat=j):
                    idx = [slice(None)] * (2 * d + 1)
                    for a, side in zip(S, sides):
                        idx[a] = 0 if side == 0 else B_in[a] - 1
                        idx[d + a] = 0
                    v = xr[tuple(idx)]
                    if d2 > 0:
                        vb = v.reshape(tuple(B_in[a] for a in nonS)
                                       + (s_in**d2 * k,))
                        if restrict:
                            vo = blocked_restrict_apply(
                                vb, subs[d2], m, e_lo,
                                tuple(Bc[a] for a in nonS), d2)
                            vo = vo.reshape(tuple(Bc[a] for a in nonS)
                                            + (sc,) * d2 + (k,))
                        else:
                            vo = blocked_prolong_apply(
                                vb, subs[d2], m, e_lo,
                                tuple(Bf[a] for a in nonS), d2)
                            vo = vo.reshape(tuple(Bf[a] for a in nonS)
                                            + (sf,) * d2 + (k,))
                    else:
                        vo = v
                    oidx = [slice(None)] * (2 * d + 1)
                    for a, side in zip(S, sides):
                        oidx[a] = 0 if side == 0 else B_out[a] - 1
                        oidx[d + a] = 0
                    updates.append((tuple(oidx), sign * vo))
        return updates

    def _level_blocks(self, li):
        lvl, nxt = self.levels[li], self.levels[li + 1]
        s_f = lvl.K.eff_ngl - 1
        s_c = nxt.K.eff_ngl - 1
        Bf = tuple((n - 1) // s_f + 1 for n in reversed(lvl.mesh.npts))
        Bc = tuple((n - 1) // s_c + 1 for n in reversed(nxt.mesh.npts))
        return s_f, s_c, Bf, Bc

    def _blocked_restrict(self, li, xb, mult_b, pad_c, tk=None,
                          corr=False):
        """(Bf..., Cf) fine blocked residual -> (Bc..., Cc) coarse."""
        Wr, m, e_lo = tk if tk is not None else self._transfer_kernel(li)
        s_f, s_c, Bf, Bc = self._level_blocks(li)
        xw = xb * mult_b
        out = blocked_restrict_apply(xw, Wr, m, e_lo, Bc, self.dim)
        if corr:
            d, k = self.dim, self.dim
            xr = xw.reshape(Bf + (s_f,) * d + (k,))
            o = out.reshape(Bc + (s_c,) * d + (k,))
            for oidx, val in self._transfer_corr(li, xr, Bf, Bc,
                                                 "restrict"):
                o = o.at[oidx].add(val)
            out = o.reshape(Bc + (s_c**d * k,))
        return out * pad_c

    def _blocked_prolong(self, li, xc, mult_b, pad_f, tk=None,
                         corr=False):
        """Adjoint of _blocked_restrict: coarse blocked -> fine blocked."""
        Wr, m, e_lo = tk if tk is not None else self._transfer_kernel(li)
        s_f, s_c, Bf, Bc = self._level_blocks(li)
        out = blocked_prolong_apply(xc, Wr, m, e_lo, Bf, self.dim)
        if corr:
            d, k = self.dim, self.dim
            xr = xc.reshape(Bc + (s_c,) * d + (k,))
            o = out.reshape(Bf + (s_f,) * d + (k,))
            for oidx, val in self._transfer_corr(li, xr, Bf, Bc,
                                                 "prolong"):
                o = o.at[oidx].add(val)
            out = o.reshape(Bf + (s_f**d * k,))
        return out * mult_b * pad_f

    # ------------------------------------------------------------------
    def build(self, fine_mask=None, start_level: int = 0) -> Callable:
        """Return M^{-1}(r) closing over the fine-level free-dof mask.

        Layout follows the mask: a parity-blocked fine_mask produces a
        V-cycle whose smoothers run entirely in the blocked layout (the
        TPU hot path); a grid-shaped mask reproduces the grid V-cycle.
        Transfers convert at level boundaries (blocked -> grid -> blocked)
        — they run once per level per cycle vs ~8 smoother applies.

        start_level > 0 builds the TAIL V-cycle over levels
        [start_level:] with that level's own Dirichlet mask (fine_mask
        defaults to its blocked mask) — the replicated coarse branch of
        the distributed coarse-grid agglomeration
        (pynama_tpu/parallel/dist_mg.py).
        """
        assert self.usable
        levels = self.levels[start_level:]
        if fine_mask is None:
            fine_mask = (levels[0].mask_b if levels[0].mask_b is not None
                         else levels[0].mask)
        nlev = len(levels)
        lam_max = self.lam_max[start_level:]
        patch_off = start_level
        blocked = (levels[0].mask_b is not None
                   and fine_mask.shape == levels[0].mask_b.shape)
        from pynama_tpu.ops.conv import mask_frees_boundary

        # phantom-cell corrections matter only where the mask leaves
        # boundary dofs free; coarse-level masks are fully Dirichlet
        corr0 = mask_frees_boundary(
            fine_mask, levels[0].K.eff_ngl,
            tuple(reversed(levels[0].mesh.npts)),
        )
        needs_corr = [corr0] + [False] * (nlev - 1)

        def ldata(li):
            lvl = levels[li]
            if li == 0:
                mask = fine_mask
                diag = lvl.diag_b if blocked else lvl.diag
            else:
                mask = lvl.mask_b if blocked else lvl.mask
                diag = lvl.diag_b if blocked else lvl.diag
            return lvl, mask, diag

        def smooth(li, x, b, n, x_is_zero=False):
            """Chebyshev(n) smoothing on D^-1 K over [lam_max/4, lam_max].

            Standard fourth-kind-free Chebyshev iteration (hypre-style):
            pointwise, fuses to a few masked K applies + axpys.
            x_is_zero skips the initial residual apply (pre-smooth).
            """
            lvl, mask, diag = ldata(li)
            lmax = lam_max[li]
            lmin = lmax / self.cheb_div
            theta = 0.5 * (lmax + lmin)
            delta = 0.5 * (lmax - lmin)
            if self.patch_W is not None:
                pc = partial(self._patch_apply, patch_off + li, mask,
                             blocked=blocked)
            else:
                dinv = 1.0 / (mask * diag + (1.0 - mask))
                pc = lambda v: dinv * v
            corr = needs_corr[li]
            if x_is_zero:
                x, r = jnp.zeros_like(b), b
            else:
                r = b - self._masked_apply(lvl, mask, x, corr)
            d = (1.0 / theta) * pc(r)
            sigma = theta / delta
            rho = 1.0 / sigma
            for _ in range(n):
                x = x + d
                r = r - self._masked_apply(lvl, mask, d, corr)
                rho_new = 1.0 / (2.0 * sigma - rho)
                d = (rho_new * rho) * d + (2.0 * rho_new / delta) * pc(r)
                rho = rho_new
            return x + d

        from pynama_tpu.ops.conv import pad_mask

        # The closed-form transfer kernels are translation-invariant:
        # their phantom windows read the fine BOUNDARY planes, so alone
        # they equal the grid-path transfers only on operands whose
        # boundary values are zero — true on every level >= 1 (coarse
        # operands are Dirichlet-masked). On level 0 of masks that free
        # boundary dofs (e.g. cavity wall tangentials, corr0 True) the
        # EXACT boundary inclusion-exclusion corrections
        # (_transfer_corr) restore equality on all operands, keeping
        # the whole V-cycle blocked-native.
        # decisions FROZEN at build time: caching traced arrays on the
        # levels would leak tracers — neither the kernel build nor the
        # cache write may happen inside a traced V-cycle
        tk_use = [None] * max(nlev - 1, 0)
        tk_corr = [False] * max(nlev - 1, 0)
        if blocked:
            for li in range(nlev - 1):
                tk = self._transfer_kernel(start_level + li)
                if tk is None:
                    continue
                tk_use[li] = tk
                tk_corr[li] = bool(li == 0 and corr0)
                if tk_corr[li]:
                    # freeze the sub-dimension correction kernels too
                    self._transfer_subkernels(start_level + li)
                for l_ in (levels[li], levels[li + 1]):
                    if getattr(l_, "pad_b", None) is None:
                        l_.pad_b = jnp.asarray(pad_mask(
                            l_.K.eff_ngl, tuple(reversed(l_.mesh.npts)),
                            self.dim), dtype=self.dtype)
                if getattr(levels[li], "mult_b", None) is None:
                    levels[li].mult_b = levels[li].K.to_blocked(
                        levels[li].mult_inv)
        # introspection for tests: which level jumps ran blocked-native
        # transfers in the build just returned, and with corrections
        self.last_tk_levels = [(li, tk_corr[li])
                               for li in range(nlev - 1)
                               if tk_use[li] is not None]

        def tdata(li):
            """(mult_b, pad_f, pad_c) for a blocked-native transfer."""
            lvl, nxt = levels[li], levels[li + 1]
            return lvl.mult_b, lvl.pad_b, nxt.pad_b

        def restrict(li, res):
            lvl = levels[li]
            nxt = levels[li + 1]
            gli = start_level + li
            if blocked and tk_use[li] is not None:
                mult_b, _, pad_c = tdata(li)
                return self._blocked_restrict(gli, res, mult_b, pad_c,
                                              tk=tk_use[li],
                                              corr=tk_corr[li])
            if blocked:
                res = lvl.K.from_blocked(res)
            rc = self._restrict(lvl, nxt.mesh, res)
            return nxt.K.to_blocked(rc) if blocked else rc

        def prolong(li, xc):
            lvl = levels[li]
            nxt = levels[li + 1]
            gli = start_level + li
            if blocked and tk_use[li] is not None:
                mult_b, pad_f, _ = tdata(li)
                return self._blocked_prolong(gli, xc, mult_b, pad_f,
                                             tk=tk_use[li],
                                             corr=tk_corr[li])
            if blocked:
                xc = nxt.K.from_blocked(xc)
            xf = self._prolong(lvl, nxt.mesh, xc)
            return lvl.K.to_blocked(xf) if blocked else xf

        def vcycle(li, r):
            lvl, mask, _ = ldata(li)
            if li == nlev - 1:
                # tiny grid: flat<->grid reshape is safe here (the TPU
                # reshape miscompile needs >500 points per axis)
                if blocked:
                    rg = lvl.K.from_blocked(r)
                    xg = (self.coarse_inv @ rg.reshape(-1)).reshape(rg.shape)
                    return lvl.K.to_blocked(xg)
                return (self.coarse_inv @ r.reshape(-1)).reshape(r.shape)
            x = smooth(li, None, r, self.pre, x_is_zero=True)
            res = mask * (r - self._masked_apply(lvl, mask, x,
                                                 needs_corr[li]))
            _, mask_c, _ = ldata(li + 1)
            rc = mask_c * restrict(li, res)
            xc = vcycle(li + 1, rc)
            x = x + mask * prolong(li, xc)
            x = smooth(li, x, r, self.post)
            return x

        def minv(r):
            return fine_mask * vcycle(0, fine_mask * r) + (1.0 - fine_mask) * r

        return minv
