"""One-level additive-Schwarz preconditioning for unstructured meshes.

Structured box meshes get geometric multigrid (solvers/multigrid.py);
gather/scatter (Gmsh) meshes previously fell back to Jacobi-CG, whose
iteration counts grow with both mesh size and the penalty terms'
conditioning (SURVEY.md: alpha_d = 1e3 inflates kappa(K)). This is the
minimum-viable replacement: element-block additive Schwarz

    M^-1 = sum_e R_e^T (P_e K_e P_e + (I - P_e))^-1 R_e     (free dofs)
           + identity on constrained dofs,

with K_e the per-element KLE stiffness (same blocks the operator itself
applies) and P_e the element-local restriction of the global free-dof
mask. Each term is SPD on its patch and every free dof is covered, so
M^-1 is SPD — safe for CG. The apply is one batched einsum over the
precomputed block inverses through the existing gather/scatter path
(ops/assembly.py ElementOp), i.e. MXU-shaped like the operator apply.

The reference needs no analogue (its LU direct solve handles any mesh,
ksp_solver.py:12-19); parity here means not degrading on gmsh input.
"""

import logging

import jax.numpy as jnp
import numpy as np

from pynama_tpu.ops.assembly import make_element_op

logger = logging.getLogger("pynama_tpu")

# block-inverse storage guard: (E, nk, nk) f64 beyond this many entries
# (~1.6 GB) falls back to Jacobi rather than exhausting device memory
_MAX_BLOCK_ENTRIES = 2 * 10**8


def build_element_schwarz(mesh, K_el, free_mask, dtype=jnp.float64,
                          patches="vertex"):
    """Callable r -> M^-1 r for the masked KLE system, or None (too big).

    K_el: (nk, nk) shared or (E, nk, nk) batched elemental stiffness;
    free_mask: flat (n_nodes*dim,) 1/0 free-dof mask. The returned
    preconditioner matches KLESystem.apply_masked's convention (identity
    on constrained dofs).

    patches: 'vertex' (default) = vertex-star patches (all dofs of the
    cells sharing a corner vertex — the unstructured analogue of the
    structured MG patch smoother, with generous overlap so the two-level
    method's iteration counts stay ~mesh-independent); 'element' =
    smaller non-overlapping element blocks (cheaper, weaker). Either
    way the patch matrices are principal submatrices of the ASSEMBLED
    masked K, NOT raw elemental contributions: an interior element's own
    block is singular (rigid translations carry no strain/div/curl
    energy), while every principal submatrix of the assembled SPD
    operator is SPD.
    """
    import scipy.sparse as sp

    dim = mesh.dim
    dofs = np.asarray(mesh.cell_dofs(dim), dtype=np.int64)
    E, nk = dofs.shape
    n = mesh.n_nodes * dim
    Ke = np.asarray(K_el, dtype=np.float64)
    if Ke.ndim == 2:
        Ke = np.broadcast_to(Ke, (E,) + Ke.shape)
    m = np.asarray(free_mask, dtype=np.float64).reshape(-1)

    rows = np.repeat(dofs, nk, axis=1).reshape(-1)
    cols = np.tile(dofs, (1, nk)).reshape(-1)
    K = sp.coo_matrix((Ke.reshape(-1), (rows, cols)), shape=(n, n)).tocsr()
    D = sp.diags(m)
    K = (D @ K @ D + sp.diags(1.0 - m)).tocsr()

    if patches == "vertex":
        ptab = _vertex_star_dofs(mesh, dofs, n)
    else:
        ptab = dofs
    P, L = ptab.shape
    if P * L * L > _MAX_BLOCK_ENTRIES:
        if patches == "vertex":  # retry with the smaller element blocks
            return build_element_schwarz(mesh, K_el, free_mask, dtype,
                                         patches="element")
        logger.warning(
            "Schwarz blocks would need %d entries (> %d); "
            "falling back to Jacobi", P * L * L, _MAX_BLOCK_ENTRIES,
        )
        return None

    # sentinel dof n (padded slots): identity row in every block — its
    # inverse block stays identity and scatters only into the scratch
    # slot that from_padded drops
    A = np.empty((P, L, L))
    for p in range(P):
        A[p] = K[np.ix_(np.minimum(ptab[p], n - 1),
                        np.minimum(ptab[p], n - 1))].toarray()
        pad = ptab[p] == n
        if pad.any():
            A[p][pad, :] = 0.0
            A[p][:, pad] = 0.0
            A[p][pad, pad] = 1.0
    B = np.linalg.inv(A)
    op = make_element_op(B, ptab, ptab, n + 1, dtype)
    mask_j = jnp.asarray(m, dtype=dtype)

    coarse = _coarse_level(mesh, K, m, dim, dtype)

    def m_inv(r):
        shape = r.shape
        rf = r.reshape(-1)
        r_ext = jnp.concatenate([rf, jnp.zeros((1,), rf.dtype)])
        y = op(r_ext)[:n]
        if coarse is not None:
            y = y + coarse(rf)
        return (mask_j * y + (1.0 - mask_j) * rf).reshape(shape)

    return m_inv


def _vertex_star_dofs(mesh, cell_dofs, n):
    """(n_vertices, L) padded dof table of vertex-star patches.

    Patch v = all dofs of cells having corner vertex v; rows padded to
    the max star size with the sentinel dof n (see build_element_schwarz).
    """
    stars = {}
    corners = np.asarray(mesh._corners_lex)
    for e in range(len(corners)):
        for v in corners[e]:
            stars.setdefault(int(v), set()).update(cell_dofs[e].tolist())
    L = max(len(s) for s in stars.values())
    out = np.full((len(stars), L), n, dtype=np.int64)
    for i, v in enumerate(sorted(stars)):
        d = sorted(stars[v])
        out[i, : len(d)] = d
    return out


# dense coarse inverses beyond this dof count cost more than they save
_MAX_COARSE_DOFS = 6000


def _coarse_level(mesh, K, m, dim, dtype):
    """Additive Q1 corner-vertex coarse correction r -> R A_c^-1 R^T r.

    R is the bilinear/trilinear corner->GLL geometry interpolation
    (mesh.corner_interp) expanded per velocity component; A_c = R^T K R
    with the masked assembled K, dense-inverted in f64 at setup. The
    coarse space carries the global low modes one-level Schwarz cannot
    damp, making CG iteration counts (approximately) mesh-independent.
    Returns None (one-level fallback) without corner_interp or when the
    coarse system exceeds the dense-inverse budget.
    """
    import scipy.sparse as sp

    if not hasattr(mesh, "corner_interp"):
        return None
    cols, wts = mesh.corner_interp
    nv = int(cols.max()) + 1
    if nv * dim > _MAX_COARSE_DOFS:
        logger.warning(
            "Schwarz coarse space %d dofs > %d: running one-level",
            nv * dim, _MAX_COARSE_DOFS,
        )
        return None
    n_nodes, mw = cols.shape
    # R over dofs: node i comp d <- corner cols[i, :] comp d
    ccols = (cols[:, :, None] * dim
             + np.arange(dim)[None, None, :])            # (n, mw, dim)
    rows = (np.arange(n_nodes)[:, None, None] * dim
            + np.arange(dim)[None, None, :]
            + np.zeros((1, mw, 1), dtype=np.int64))      # (n, mw, dim)
    vals = np.broadcast_to(wts[:, :, None], (n_nodes, mw, dim))
    R = sp.coo_matrix(
        (vals.reshape(-1), (rows.reshape(-1), ccols.reshape(-1))),
        shape=(n_nodes * dim, nv * dim),
    ).tocsr()
    Ac = (R.T @ K @ R).toarray()
    Ac_inv = jnp.asarray(np.linalg.inv(Ac), dtype=dtype)

    colsd = jnp.asarray(cols, dtype=jnp.int32)
    wtsd = jnp.asarray(wts, dtype=dtype)

    def coarse(rf):
        rn = rf.reshape(n_nodes, dim)
        contrib = wtsd[:, :, None] * rn[:, None, :]        # (n, mw, dim)
        rc = jnp.zeros((nv, dim), dtype=rf.dtype)
        rc = rc.at[colsd.reshape(-1)].add(
            contrib.reshape(-1, dim), mode="drop")
        xc = (Ac_inv @ rc.reshape(-1)).reshape(nv, dim)
        yn = (wtsd[:, :, None] * xc[colsd]).sum(axis=1)    # (n, dim)
        return yn.reshape(-1)

    return coarse
