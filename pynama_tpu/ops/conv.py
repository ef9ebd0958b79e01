"""Elemental operators on uniform grids as MXU convolutions.

On a uniform box mesh, an assembled spectral-element operator is a
PERIODIC stencil: the coupling weights between nodes depend only on the
node parities (position within an element, period P = ngl-1 per axis)
and the block offset. Blocking the node grid by parity therefore turns
gather -> elemental GEMM -> scatter-add into ONE dense convolution

    y_blocked = conv(x_blocked, W),   W: (3,)*dim x (P^dim k_in) x (P^dim k_out)

which XLA lowers straight onto the MXU - the TPU-native form of the
reference's assembled AIJ SpMV (/root/reference/src/matrices/
mat_generator.py). The slice/stack path in pynama_tpu/ops/structured.py
computes the same product via 2*N^dim strided slices; measured on a real
TPU v5e it reaches ~2 GB/s effective while this conv form is
compute-shaped and bandwidth-light (one read + one write of the grid).

Boundary exactness: a plain conv sums over ALL window cells, including
"phantom" cells outside the mesh whose node ranges still intersect the
grid. Their contributions touch only boundary node planes and are
removed exactly by inclusion-exclusion over pinned axes: for every
nonempty subset S of axes and every lo/hi side choice, the phantom sum
restricted to those sides is itself a (dim-|S|)-dimensional periodic
stencil on the corresponding face/edge/corner, built from the elemental
matrix contracted at the pinned local indices. 2D: 4 face (1D conv) + 4
corner (matrix) corrections; 3D: 6 + 12 + 8.

All kernel construction uses static numpy index bookkeeping + jnp
scatter-adds, so it is safe to run under tracing (the elemental matrix A
may be a tracer when ops are passed through jit as pytrees).
"""

import os
from functools import lru_cache
from itertools import combinations, product

import jax
import jax.numpy as jnp
import numpy as np

_DIMNUMS = {1: ("NWC", "WIO", "NWC"),
            2: ("NHWC", "HWIO", "NHWC"),
            3: ("NDHWC", "DHWIO", "NDHWC")}


@lru_cache(maxsize=None)
def _kernel_indices(ngl: int, dim: int, k_out: int, k_in: int,
                    ext: int = None):
    """Flat scatter indices building W from A.reshape(-1).

    A flat layout: ((l_nodes, k_out), (m_nodes, k_in)) row-major with
    local node lexicographic x fastest, i.e. node axes in GRID ORDER
    (slowest spatial axis first) when reshaped to (E,)*dim.
    Returns (w_idx, w_shape): W.reshape(-1).at[w_idx].add(A.reshape(-1)).
    W shape: (F,)*dim + (P^dim*k_in, P^dim*k_out)   [HWIO-style].

    ext: local node extent E per axis (default ngl — ordinary elements).
    "Cells" of extent E tile the node grid with stride P = ngl-1, so any
    E > ngl describes an OVERLAPPING window (e.g. vertex-star patches,
    E = 2*ngl-1) and yields a wider conv footprint F = 2*((E-1)//P)+1.
    """
    N, P = ngl, ngl - 1
    E = N if ext is None else ext
    maxblk = (E - 1) // P
    F = 2 * maxblk + 1
    nnode = E**dim
    Cin, Cout = P**dim * k_in, P**dim * k_out
    w_shape = (F,) * dim + (Cin, Cout)

    # per-axis digit tables for every local node id (grid order)
    ids = np.arange(nnode)
    digs = []
    for ax in range(dim):  # axis 0 slowest
        digs.append((ids // (E ** (dim - 1 - ax))) % E)
    digs = np.stack(digs)                     # (dim, nnode)
    blk = digs // P                           # 0 .. maxblk
    sub = digs % P

    def chan(subs, k):
        c = np.zeros(nnode, dtype=np.int64)
        for ax in range(dim):
            c = c * P + subs[ax]
        return c * k

    co_node = chan(sub, k_out)                # (nnode,)
    ci_node = chan(sub, k_in)

    l = ids[:, None]                          # out node
    m = ids[None, :]                          # in node
    q = np.zeros((nnode, nnode), dtype=np.int64)
    for ax in range(dim):
        q = q * F + (blk[ax][m] - blk[ax][l] + maxblk)
    # W flat index of the (q, ci, co) cell origin
    cell = (q * Cin + ci_node[m]) * Cout + co_node[l]   # (nnode, nnode)

    ko = np.arange(k_out)
    ki = np.arange(k_in)
    # A flat index (l, ko, m, ki) -> W flat index cell + ki*Cout + ko
    w_idx = (cell[:, None, :, None]
             + ki[None, None, None, :] * Cout
             + ko[None, :, None, None])
    return w_idx.reshape(-1), w_shape  # numpy (cache must stay concrete)


def _build_kernel(A, ngl, dim, k_out, k_in, dtype, ext=None):
    w_idx, w_shape = _kernel_indices(ngl, dim, k_out, k_in, ext)
    if isinstance(A, jax.core.Tracer):
        W = jnp.zeros(int(np.prod(w_shape)), dtype=dtype)
        W = W.at[jnp.asarray(w_idx)].add(A.reshape(-1))
        return W.reshape(w_shape)
    # concrete A: build eagerly in numpy and KEEP it numpy — jnp.asarray
    # under an active trace stages the constant as a tracer, which must
    # never be cached (it leaks); numpy kernels convert at use sites.
    W = np.zeros(int(np.prod(w_shape)), dtype=np.float64)
    np.add.at(W, w_idx, np.asarray(A, dtype=np.float64).reshape(-1))
    return W.reshape(w_shape).astype(np.dtype(dtype))


def _pin(A, ngl, dim, k_out, k_in, pins):
    """Contract the elemental matrix at pinned axes.

    pins: dict {grid_axis: side} with side 0 = lo boundary (phantom cell
    below: pinned local index N-1), 1 = hi (pinned local index 0).
    Returns (A_sub, rem_axes) with A_sub an elemental matrix over the
    remaining axes (grid order preserved).
    """
    N = ngl
    if not isinstance(A, jax.core.Tracer):
        A = np.asarray(A)  # stay numpy: see _build_kernel
    At = A.reshape((N,) * dim + (k_out,) + (N,) * dim + (k_in,))
    idx = []
    for ax in range(dim):  # l axes
        idx.append((N - 1 if pins[ax] == 0 else 0) if ax in pins
                   else slice(None))
    idx.append(slice(None))
    for ax in range(dim):  # m axes
        idx.append((N - 1 if pins[ax] == 0 else 0) if ax in pins
                   else slice(None))
    idx.append(slice(None))
    A_sub = At[tuple(idx)]
    rem = [ax for ax in range(dim) if ax not in pins]
    n_rem = N ** len(rem)
    return A_sub.reshape(n_rem * k_out, n_rem * k_in), rem


def build_conv_kernels(A, ngl, dim, k_out, k_in, dtype):
    """Main conv kernel + boundary corrections for an elemental matrix.

    Returns (W, corrections); corrections is a tuple of
    (pins, sign, W_sub) where pins = ((grid_axis, side), ...) and W_sub
    is a (dim-|pins|)-dim conv kernel (or a (k_in, k_out) matrix when
    every axis is pinned).
    """
    W = _build_kernel(A, ngl, dim, k_out, k_in, dtype)
    corrections = []
    axes = range(dim)
    for r in range(1, dim + 1):
        sign = float((-1) ** r)
        for S in combinations(axes, r):
            for sides in product((0, 1), repeat=r):
                pins = dict(zip(S, sides))
                A_sub, rem = _pin(A, ngl, dim, k_out, k_in, pins)
                if rem:
                    W_sub = _build_kernel(A_sub, ngl, len(rem), k_out,
                                          k_in, dtype)
                else:
                    W_sub = A_sub.T  # (k_in, k_out)
                corrections.append((tuple(sorted(pins.items())), sign, W_sub))
    return W, tuple(corrections)


def build_patch_kernel(Bmat, ngl, dim, k, dtype):
    """Conv kernel of a vertex-star additive-Schwarz smoother.

    Bmat: (((2P+1)^dim)*k)^2 patch matrix (typically the INVERSE of the
    patch stiffness R_p A R_p^T), local nodes in grid order — the
    "elemental matrix" of overlapping windows of extent 2*ngl-1 tiling
    the node grid with stride P = ngl-1 (one window per mesh vertex).
    Returns a footprint-5 conv kernel W computing

        y = sum_p R_p^T Bmat R_p x     over ALL window positions.

    No boundary corrections are returned on purpose: phantom windows
    (centers on/outside the boundary) read the zero-extension of x, so
    their contribution is an extra PSD term — harmless (mild extra
    smoothing near boundaries) and SPD-preserving, unlike an elemental
    OPERATOR where phantom cells would corrupt the result.
    """
    ext = 2 * (ngl - 1) + 1
    return _build_kernel(Bmat, ngl, dim, k, k, dtype, ext=ext)


# ----------------------------------------------------------------------
# superblocking: rebase a parity-lattice kernel to a coarser lattice
# ----------------------------------------------------------------------
@lru_cache(maxsize=None)
def _rebase_map(Fp, dim, P, k_in, k_out, f):
    """Gather map re-indexing a period-P conv kernel onto period s=f*P.

    The parity-blocked layout's channel count (P^dim * k, e.g. 8 for Q2
    2D velocity) under-fills the TPU's 128-wide lanes/MXU by ~16x; the
    SAME operator re-blocked on a lattice of f^dim-element "super-cells"
    has (f*P)^dim * k channels (128 for f=4), turning every conv tap
    into a well-shaped MXU matmul. The rebase is exact re-indexing:
    parity block bp = bs*f + u, so a parity displacement d lands in
    super block bs + floor((u_out+d)/f) at sub-position (u_out+d) mod f.
    Returns (src_map, w_shape): dst entry i takes value W_p.flat[src[i]]
    (or 0 where src < 0).
    """
    Qp = (Fp - 1) // 2
    s = f * P
    all_ds = [(u + d) // f for u in range(f) for d in range(-Qp, Qp + 1)]
    Qs = max(max(all_ds), -min(all_ds))
    Fs = 2 * Qs + 1
    Cp_in, Cp_out = P**dim * k_in, P**dim * k_out
    Cs_in, Cs_out = s**dim * k_in, s**dim * k_out
    mp = np.full(Fs**dim * Cs_in * Cs_out, -1, dtype=np.int64)

    subs = np.array(list(np.ndindex(*(P,) * dim)), dtype=np.int64)
    subs = subs.reshape(-1, dim)

    def chan_sup(u, k):
        lin = np.zeros(len(subs), dtype=np.int64)
        for ax in range(dim):
            lin = lin * s + (u[ax] * P + subs[:, ax])
        return (lin[:, None] * k + np.arange(k)).reshape(-1)

    lin_p = np.zeros(len(subs), dtype=np.int64)
    for ax in range(dim):
        lin_p = lin_p * P + subs[:, ax]

    def chan_par(k):
        return (lin_p[:, None] * k + np.arange(k)).reshape(-1)

    cin_p, cout_p = chan_par(k_in), chan_par(k_out)
    for u_out in np.ndindex(*(f,) * dim):
        co_s = chan_sup(u_out, k_out)
        for dq in np.ndindex(*(Fp,) * dim):
            ds = [(u_out[a] + dq[a] - Qp) // f for a in range(dim)]
            u_in = tuple((u_out[a] + dq[a] - Qp) % f for a in range(dim))
            qs_lin = qp_lin = 0
            for a in range(dim):
                qs_lin = qs_lin * Fs + (ds[a] + Qs)
                qp_lin = qp_lin * Fp + dq[a]
            ci_s = chan_sup(u_in, k_in)
            dst = (qs_lin * Cs_in + ci_s)[:, None] * Cs_out + co_s[None, :]
            src = (qp_lin * Cp_in + cin_p)[:, None] * Cp_out + cout_p[None, :]
            mp[dst.reshape(-1)] = src.reshape(-1)
    return mp, (Fs,) * dim + (Cs_in, Cs_out)


def rebase_conv_kernel(W, f, dim, k_in, k_out, ngl):
    """Re-block a period-(ngl-1) conv kernel onto period f*(ngl-1).

    Exact for any periodic stencil (operators AND vertex-star patch
    kernels); footprint becomes 2*ceil(Q_p/f)+1 (3 for every case here).
    """
    if f == 1:
        return W
    P = ngl - 1
    Fp = W.shape[0]
    mp, shape = _rebase_map(Fp, dim, P, k_in, k_out, f)
    flat = W.reshape(-1)
    if isinstance(W, (jax.core.Tracer, jax.Array)):
        out = jnp.where(jnp.asarray(mp) >= 0,
                        flat[jnp.maximum(jnp.asarray(mp), 0)], 0)
    else:
        out = np.where(mp >= 0, np.asarray(flat)[np.maximum(mp, 0)],
                       0.0).astype(W.dtype)
    return out.reshape(shape)


def rebase_kernels(W, corrections, f, dim, k_in, k_out, ngl):
    """Rebase a (W, corrections) pair from build_conv_kernels."""
    if f == 1:
        return W, corrections
    W_s = rebase_conv_kernel(W, f, dim, k_in, k_out, ngl)
    corr_s = []
    for pins, sign, W_sub in corrections:
        n_rem = dim - len(pins)
        if n_rem:
            W_sub = rebase_conv_kernel(W_sub, f, n_rem, k_in, k_out, ngl)
        corr_s.append((pins, sign, W_sub))
    return W_s, tuple(corr_s)


# ----------------------------------------------------------------------
# apply
# ----------------------------------------------------------------------
def _to_blocked(x, ngl, npts_grid):
    """(npts..., k) -> (1, B..., P^dim*k) parity-blocked NHWC tensor."""
    P = ngl - 1
    dim = len(npts_grid)
    B = tuple((n - 1) // P + 1 for n in npts_grid)
    k = x.shape[-1]
    pads = tuple((0, B[i] * P - npts_grid[i]) for i in range(dim)) + ((0, 0),)
    g = jnp.pad(x, pads)
    shape = ()
    for b in B:
        shape += (b, P)
    g = g.reshape(shape + (k,))
    perm = (tuple(range(0, 2 * dim, 2)) + tuple(range(1, 2 * dim, 2))
            + (2 * dim,))
    g = g.transpose(perm)
    return g.reshape(B + (P**dim * k,)), B


def _from_blocked(y, ngl, npts_grid, k_out):
    P = ngl - 1
    dim = len(npts_grid)
    B = y.shape[:dim]
    g = y.reshape(B + (P,) * dim + (k_out,))
    perm = []
    for i in range(dim):
        perm += [i, dim + i]
    perm.append(2 * dim)
    g = g.transpose(perm).reshape(tuple(b * P for b in B) + (k_out,))
    return g[tuple(slice(0, n) for n in npts_grid) + (slice(None),)]


def conv_blocked(xb, W, precision):
    """Stencil contraction on a parity-blocked tensor (..., B..., Cin).

    Fast path: a Pallas kernel holding the whole tensor in VMEM (one HBM
    read + write per apply — ops/pallas_stencil.py); falls back to F^dim
    shifted GEMMs where the kernel doesn't apply (f64, batch dims, CPU,
    VMEM overflow). The XLA path uses explicit pad + slice + dot rather
    than conv_general_dilated: XLA's TPU conv lowering for these narrow
    channel counts measures ~2.5x slower. Footprint F per axis is read
    off W (3 for elemental operators and super-blocked patch smoothers,
    5 for parity-layout patch smoothers).
    """
    if os.environ.get("PYNAMA_NO_PALLAS", "0") != "1":
        from pynama_tpu.ops.pallas_stencil import (conv_blocked_pallas,
                                                   pallas_ok)

        if pallas_ok(xb.shape, xb.dtype, W.shape):
            return conv_blocked_pallas(xb, W)
    dim = W.ndim - 2
    F = W.shape[0]
    Q = (F - 1) // 2
    B = xb.shape[-dim - 1:-1]
    k_out = W.shape[-1]
    pads = ((0, 0),) * (xb.ndim - dim - 1) + ((Q, Q),) * dim + ((0, 0),)
    g = jnp.pad(xb, pads)
    out = jnp.zeros(xb.shape[:-1] + (k_out,), dtype=xb.dtype)
    for q in np.ndindex(*(F,) * dim):
        sl = (Ellipsis,) + tuple(
            slice(q[i], q[i] + B[i]) for i in range(dim)
        ) + (slice(None),)
        out = out + jnp.matmul(g[sl], W[q], precision=precision)
    return out


def _conv(x, W, ngl, npts_grid, k_out, precision):
    xb, B = _to_blocked(x, ngl, npts_grid)
    yb = conv_blocked(xb, W, precision)
    return _from_blocked(yb, ngl, npts_grid, k_out)


# ----------------------------------------------------------------------
# public blocked-layout helpers (solver state lives in this layout: the
# block/unblock transposes cost ~4x the conv itself at 1M dofs, so hot
# loops carry (B..., P^dim*k) arrays and convert only at IO boundaries)
# ----------------------------------------------------------------------
def blocked_shape(ngl, npts_grid, k):
    P = ngl - 1
    dim = len(npts_grid)
    return tuple((n - 1) // P + 1 for n in npts_grid) + (P**dim * k,)


def to_blocked(grid, ngl):
    """(npts..., k) node grid -> (B..., P^dim*k) parity-blocked tensor."""
    return _to_blocked(grid, ngl, grid.shape[:-1])[0]


def from_blocked(xb, ngl, npts_grid):
    P = ngl - 1
    dim = len(npts_grid)
    k = xb.shape[-1] // (P**dim)
    return _from_blocked(xb, ngl, npts_grid, k)


def to_blocked_np(grid, ngl):
    """numpy twin of to_blocked (host-side kernel probing / setup)."""
    P = ngl - 1
    npts_grid = grid.shape[:-1]
    dim = len(npts_grid)
    B = tuple((n - 1) // P + 1 for n in npts_grid)
    k = grid.shape[-1]
    pads = tuple((0, B[i] * P - npts_grid[i]) for i in range(dim)) + ((0, 0),)
    g = np.pad(np.asarray(grid), pads)
    shape = ()
    for b in B:
        shape += (b, P)
    g = g.reshape(shape + (k,))
    perm = (tuple(range(0, 2 * dim, 2)) + tuple(range(1, 2 * dim, 2))
            + (2 * dim,))
    return g.transpose(perm).reshape(B + (P**dim * k,))


def from_blocked_np(xb, ngl, npts_grid):
    """numpy twin of from_blocked."""
    P = ngl - 1
    dim = len(npts_grid)
    B = xb.shape[:dim]
    k = xb.shape[-1] // (P**dim)
    g = np.asarray(xb).reshape(B + (P,) * dim + (k,))
    perm = []
    for i in range(dim):
        perm += [i, dim + i]
    perm.append(2 * dim)
    g = g.transpose(perm).reshape(tuple(b * P for b in B) + (k,))
    return g[tuple(slice(0, n) for n in npts_grid) + (slice(None),)]


@lru_cache(maxsize=None)
def _pad_mask_np(ngl, npts_grid, k):
    """(B..., P^dim*k) numpy: 1.0 on real node slots, 0.0 on pad slots."""
    P = ngl - 1
    dim = len(npts_grid)
    axes = []
    for n in npts_grid:
        B = (n - 1) // P + 1
        m = (np.arange(B * P) < n).astype(np.float64).reshape(B, P)
        axes.append(m)
    out = axes[0]
    for m in axes[1:]:
        # interleave block axes then sub axes: build (B0..,Bd..,P0..,Pd..)
        out = np.multiply.outer(out, m)
    # out axes: (B0, P0, B1, P1, ...) -> (B..., P...)
    perm = tuple(range(0, 2 * dim, 2)) + tuple(range(1, 2 * dim, 2))
    out = out.transpose(perm)
    B = out.shape[:dim]
    out = out.reshape(B + (P**dim,))
    return np.repeat(out, k, axis=-1)


def pad_mask(ngl, npts_grid, k):
    return _pad_mask_np(ngl, tuple(npts_grid), k)


def mask_frees_boundary(mask, ngl, npts_grid):
    """Does a free-dof mask leave ANY boundary-plane dof free?

    Accepts grid or blocked layout. Returns True conservatively when the
    mask is a tracer (can't inspect). Used to elide the phantom-cell
    boundary corrections inside fully-Dirichlet masked operators.
    """
    if isinstance(mask, jax.core.Tracer):
        return True
    m = np.asarray(mask)
    dim = len(npts_grid)
    if m.shape[:dim] == tuple(npts_grid):         # grid layout
        for ax in range(dim):
            for side in (0, -1):
                idx = [slice(None)] * m.ndim
                idx[ax] = side
                if np.any(m[tuple(idx)] != 0.0):
                    return True
        return False
    P = ngl - 1
    B = m.shape[:dim]
    k = m.shape[-1] // P**dim
    mr = m.reshape(B + (P,) * dim + (k,))
    for ax in range(dim):
        for blk in (0, B[ax] - 1):                # boundary = (blk, sub 0)
            idx = [slice(None)] * mr.ndim
            idx[ax] = blk
            idx[dim + ax] = 0
            if np.any(mr[tuple(idx)] != 0.0):
                return True
    return False


def conv_stencil_apply_blocked(xb, W, corrections, ngl, npts_grid, k_out,
                               precision=jax.lax.Precision.HIGHEST):
    """Blocked-in/blocked-out apply: conv + boundary corrections + pad mask.

    xb: (B..., P^dim*k_in) with ZERO pad slots (an invariant every blocked
    producer maintains — the returned array re-zeroes its own pad slots).
    """
    P = ngl - 1
    dim = len(npts_grid)
    yb = conv_blocked(xb, W, precision)
    yb = yb * jnp.asarray(pad_mask(ngl, npts_grid, k_out), dtype=yb.dtype)
    if not corrections:
        return yb
    B = yb.shape[:dim]
    k_in = xb.shape[-1] // (P**dim)
    xr = xb.reshape(B + (P,) * dim + (k_in,))
    yr = yb.reshape(B + (P,) * dim + (k_out,))
    for pins, sign, W_sub in corrections:
        pind = dict(pins)
        # boundary plane: pinned axes at block 0 (lo) / B-1 (hi), sub 0
        idx = tuple(
            (0 if pind[ax] == 0 else B[ax] - 1) if ax in pind
            else slice(None) for ax in range(dim)
        ) + tuple(0 if ax in pind else slice(None) for ax in range(dim)) \
          + (slice(None),)
        xs = xr[idx]
        rem = [ax for ax in range(dim) if ax not in pind]
        if rem:
            B_rem = tuple(B[ax] for ax in rem)
            cs = conv_blocked(xs.reshape(B_rem + (P**len(rem) * k_in,)),
                              W_sub, precision)
            # pad slots of the sub-plane must not receive corrections
            sub_npts = tuple(npts_grid[ax] for ax in rem)
            cs = cs * jnp.asarray(pad_mask(ngl, sub_npts, k_out),
                                  dtype=cs.dtype)
            cs = cs.reshape(B_rem + (P,) * len(rem) + (k_out,))
        else:
            cs = xs @ W_sub
        yr = yr.at[idx].add(sign * cs)
    return yr.reshape(B + (P**dim * k_out,))


def conv_stencil_apply(x, W, corrections, ngl, npts_grid, k_out,
                       precision=jax.lax.Precision.HIGHEST):
    """y = assembled_operator(x) via parity-blocked convolution.

    x: (npts_grid..., k_in) node grid (axes slowest-first). Returns
    (npts_grid..., k_out). Exact at boundaries via the phantom-cell
    corrections from build_conv_kernels.
    """
    dim = len(npts_grid)
    y = _conv(x, W, ngl, npts_grid, k_out, precision)
    for pins, sign, W_sub in corrections:
        pin_axes = [ax for ax, _ in pins]
        rem = [ax for ax in range(dim) if ax not in pin_axes]
        # slice x at the pinned node planes
        idx = [slice(None)] * (dim + 1)
        for ax, side in pins:
            idx[ax] = 0 if side == 0 else npts_grid[ax] - 1
        xs = x[tuple(idx)]
        if rem:
            sub_npts = tuple(npts_grid[ax] for ax in rem)
            cs = _conv(xs, W_sub, ngl, sub_npts, k_out, precision)
        else:
            cs = xs @ W_sub
        # expand back to the full grid (zero everywhere off the plane)
        pads = []
        for ax in range(dim):
            if ax in pin_axes:
                side = dict(pins)[ax]
                lo = 0 if side == 0 else npts_grid[ax] - 1
                pads.append((lo, npts_grid[ax] - 1 - lo))
            else:
                pads.append((0, 0))
        pads.append((0, 0))
        shape = [1] * (dim + 1)
        for i, ax in enumerate(rem):
            shape[ax] = cs.shape[i]
        shape[dim] = k_out
        y = y + sign * jnp.pad(cs.reshape(shape), pads)
    return y
