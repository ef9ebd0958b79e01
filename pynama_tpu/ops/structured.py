"""Scatter-free elemental operators on uniform structured grids.

XLA lowers generic scatter-add with duplicate indices to a serialized
loop on TPU — measured at ~12 ms per K apply at 33k dofs, ~100x off the
bandwidth roofline. On a structured box mesh none of that is necessary:
an element gather/scatter is a REGULAR access pattern, so the whole
apply becomes

    for each local node (ly, lx):  strided slice of the node grid
    one large GEMM against the shared elemental matrix        (MXU)
    for each local node (ly, lx):  strided slice-ADD into the output

— N^dim static slices each way (9 for Q2 in 2D), which XLA vectorizes
fully. The same trick drives the multigrid transfer operators
(pynama_tpu/solvers/multigrid.py).

This is the TPU-native replacement for the reference's assembled AIJ
SpMV (/root/reference/src/matrices/mat_generator.py) on its box meshes;
unstructured (Gmsh) meshes keep the general gather/GEMM/scatter path
(pynama_tpu/ops/assembly.py).
"""

import os
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _use_conv():
    return os.environ.get("PYNAMA_NO_CONV", "0") != "1"


def pick_super_factor(nelem, ngl, dim):
    """Super-blocking factor f: conv on a lattice of f^dim-element cells.

    The parity-blocked conv's channel count P^dim*k (8 for Q2 2D
    velocity) under-fills the TPU's 128-wide lanes/MXU; re-blocking on
    f^dim-element super-cells raises it to (f*P)^dim*k (128 at f=4),
    measured ~7x faster per K apply at 1M dofs. Exact re-indexing of the
    same operator (pynama_tpu/ops/conv.py rebase_conv_kernel). f=1 when
    parity channels already fill the lanes, when no admissible divisor
    of nelem exists, or under PYNAMA_SB=0.
    """
    if os.environ.get("PYNAMA_SB", "1") == "0":
        return 1
    P = ngl - 1
    if P**dim >= 64:
        return 1
    cands = [f for f in range(2, 9)
             if all(n % f == 0 for n in nelem) and (f * P)**dim <= 256]
    if not cands:
        return 1
    good = [f for f in cands if (f * P)**dim >= 64]
    return min(good) if good else max(cands)


def _axis_index(l, offset, step, nc):
    """Block/sub index for local node l along one axis.

    Node grid rows decompose as r = b*step + s with s < step; local node
    l of cell b sits at r = offset + l + b*step, so
      l_eff = offset + l < step  ->  (blocks [0, nc),  sub l_eff)
      l_eff == step              ->  (blocks [1, nc+1), sub 0)
    Both are CONTIGUOUS slices of the (nc+1, step) block-reshaped axis —
    no strided memory access anywhere (XLA TPU serializes strided
    scatter/update; this keeps everything as plain static slices).
    """
    l_eff = offset + l
    if l_eff < step:
        return slice(0, nc), l_eff
    assert l_eff == step
    return slice(1, nc + 1), 0


def _block_pad(grid, ncells, step):
    """Pad each spatial axis to (nc+1)*step and reshape into blocks."""
    dim = len(ncells)
    k = grid.shape[-1]
    # spatial axes are reversed (z, y, x) relative to ncells (x, y, z)
    ncs = tuple(reversed(ncells))
    pads = tuple(
        (0, (nc + 1) * step - grid.shape[i]) for i, nc in enumerate(ncs)
    ) + ((0, 0),)
    g = jnp.pad(grid, pads)
    shape = ()
    for nc in ncs:
        shape += (nc + 1, step)
    return g.reshape(shape + (k,))


def grid_gather(grid, N, ncells, step, offset):
    """Gather element-local nodal values from a node grid (scatter-free).

    grid: (np_z, np_y, np_x..., k) node axes slowest-first matching the
    lexicographic global numbering. Returns (ncells_total, N**dim * k),
    local node index lexicographic (x fastest), dof node-major.
    """
    dim = len(ncells)
    core = _block_pad(grid, ncells, step)
    pieces = []
    if dim == 2:
        nx, ny = ncells
        for ly in range(N):
            by, sy = _axis_index(ly, offset[1], step, ny)
            for lx in range(N):
                bx, sx = _axis_index(lx, offset[0], step, nx)
                pieces.append(core[by, sy, bx, sx, :])
        xe = jnp.stack(pieces, axis=2)  # (ny, nx, N*N, k)
        return xe.reshape(ny * nx, -1)
    nx, ny, nz = ncells
    for lz in range(N):
        bz, sz = _axis_index(lz, offset[2], step, nz)
        for ly in range(N):
            by, sy = _axis_index(ly, offset[1], step, ny)
            for lx in range(N):
                bx, sx = _axis_index(lx, offset[0], step, nx)
                pieces.append(core[bz, sz, by, sy, bx, sx, :])
    xe = jnp.stack(pieces, axis=3)
    return xe.reshape(nz * ny * nx, -1)


def _axis_map(l, offset, step, ):
    """(pad_shift, sub) for local node l: which block shift and sub-row.

    shift 0 = same block, shift 1 = next block (the shared closing plane).
    """
    l_eff = offset + l
    if l_eff < step:
        return 0, l_eff
    assert l_eff == step
    return 1, 0


def grid_scatter_add(out_grid, vals, N, ncells, step, offset):
    """Adjoint of grid_gather, built from pads + adds + one stack.

    vals: (ncells_total, N**dim * k). Returns out_grid + assembled values.

    NO scatter and NO .at[] updates anywhere: chained block-slice
    `.at[].add` miscompiles on the TPU backend above ~250k nodes
    (verified: fused K(v)+0.5v wrong on 8% of dofs while each piece is
    exact). Instead, every (sub_y, sub_x) plane of the block decomposition
    is the SUM of zero-padded per-local-node value arrays, stacked and
    reshaped back to the node grid — pure functional ops the compiler
    handles correctly.
    """
    dim = len(ncells)
    k = out_grid.shape[-1]
    dtype = out_grid.dtype
    if dim == 2:
        nx, ny = ncells
        v = vals.reshape(ny, nx, N * N, k)
        slabs = {}
        n = 0
        for ly in range(N):
            shy, sy = _axis_map(ly, offset[1], step)
            for lx in range(N):
                shx, sx = _axis_map(lx, offset[0], step)
                term = jnp.pad(
                    v[:, :, n, :],
                    ((shy, 1 - shy), (shx, 1 - shx), (0, 0)),
                )
                key = (sy, sx)
                slabs[key] = slabs.get(key, 0) + term
                n += 1
        zero = jnp.zeros((ny + 1, nx + 1, k), dtype=dtype)
        rows = []
        for sy in range(step):
            cols = [slabs.get((sy, sx), zero) for sx in range(step)]
            rows.append(jnp.stack(cols, axis=2))   # (ny+1, nx+1, step, k)
        core = jnp.stack(rows, axis=1)             # (ny+1, step, nx+1, step, k)
        flat = core.reshape((ny + 1) * step, (nx + 1) * step, k)
        return out_grid + flat[: out_grid.shape[0], : out_grid.shape[1], :]
    nx, ny, nz = ncells
    v = vals.reshape(nz, ny, nx, N**3, k)
    slabs = {}
    n = 0
    for lz in range(N):
        shz, sz = _axis_map(lz, offset[2], step)
        for ly in range(N):
            shy, sy = _axis_map(ly, offset[1], step)
            for lx in range(N):
                shx, sx = _axis_map(lx, offset[0], step)
                term = jnp.pad(
                    v[:, :, :, n, :],
                    ((shz, 1 - shz), (shy, 1 - shy), (shx, 1 - shx), (0, 0)),
                )
                key = (sz, sy, sx)
                slabs[key] = slabs.get(key, 0) + term
                n += 1
    zero = jnp.zeros((nz + 1, ny + 1, nx + 1, k), dtype=dtype)
    zs = []
    for sz in range(step):
        rows = []
        for sy in range(step):
            cols = [slabs.get((sz, sy, sx), zero) for sx in range(step)]
            rows.append(jnp.stack(cols, axis=3))   # (nz+1, ny+1, nx+1, step, k)
        zs.append(jnp.stack(rows, axis=2))         # (nz+1, ny+1, step, nx+1, step, k)
    core = jnp.stack(zs, axis=1)  # (nz+1, step, ny+1, step, nx+1, step, k)
    flat = core.reshape((nz + 1) * step, (ny + 1) * step, (nx + 1) * step, k)
    return out_grid + flat[: out_grid.shape[0], : out_grid.shape[1],
                           : out_grid.shape[2], :]


@jax.tree_util.register_pytree_node_class
@dataclass
class StructuredElementOp:
    """y = scatter(A @ gather(x)) on a uniform box mesh, scatter-free.

    Drop-in alternative to pynama_tpu.ops.assembly.ElementOp with a shared
    elemental matrix A of shape (nnode*k_out, nnode*k_in).
    """

    A: jnp.ndarray
    ngl: int
    nelem: Tuple[int, ...]
    npts: Tuple[int, ...]
    k_in: int
    k_out: int
    # super-blocking factor: the conv/blocked layout runs on a lattice of
    # f^dim-element super-cells (period sb*(ngl-1) nodes per axis) for
    # MXU-friendly channel counts; A stays the ELEMENT matrix. Requires
    # nelem % sb == 0 on every axis. See pick_super_factor.
    sb: int = 1

    def tree_flatten(self):
        return (self.A,), (self.ngl, self.nelem, self.npts, self.k_in,
                           self.k_out, self.sb)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    @property
    def out_size(self):
        return int(np.prod(self.npts)) * self.k_out

    @property
    def shared(self):
        return True

    def _grid_shape(self, k):
        return tuple(reversed(self.npts)) + (k,)

    def __call__(self, x):
        """Layout-polymorphic apply: grid in -> grid out, flat in -> flat out.

        Default path: parity-blocked convolution (pynama_tpu/ops/conv.py)
        — one MXU conv per apply instead of 2*N^dim strided slices;
        measured >10x faster on TPU v5e at 1M dofs. Set PYNAMA_NO_CONV=1
        to fall back to the slice/stack path below.

        IMPORTANT (TPU): pass GRID-shaped arrays in hot loops. Mixing a
        flat->grid reshape with other uses of the same flat vector in one
        fused program miscompiles on the axon TPU backend above ~500
        points per axis (first ~40 output rows garbage; verified against
        f64 references). All solver internals therefore carry grid-shaped
        state; the flat interface remains for setup/IO boundaries and
        small problems.
        """
        N = self.ngl
        flat = x.ndim == 1
        if not flat and x.shape == self.blocked_shape_in:
            return self.apply_blocked(x)
        grid = x.reshape(self._grid_shape(self.k_in)) if flat else x
        if _use_conv():
            out = self._conv_apply(grid)
        else:
            step = N - 1
            off = (0,) * len(self.nelem)
            xe = grid_gather(grid, N, self.nelem, step, off)
            ye = xe @ self.A.T
            out = jnp.zeros(self._grid_shape(self.k_out), dtype=x.dtype)
            out = grid_scatter_add(out, ye, N, self.nelem, step, off)
        return out.reshape(-1) if flat else out

    def _kernels(self):
        from pynama_tpu.ops.conv import build_conv_kernels, rebase_kernels

        kern = getattr(self, "_kern", None)
        if kern is None:
            kern = build_conv_kernels(self.A, self.ngl, len(self.nelem),
                                      self.k_out, self.k_in, self.A.dtype)
            if self.sb > 1:
                kern = rebase_kernels(*kern, self.sb, len(self.nelem),
                                      self.k_in, self.k_out, self.ngl)
            if not isinstance(self.A, jax.core.Tracer):
                object.__setattr__(self, "_kern", kern)
        return kern

    def _conv_apply(self, grid):
        from pynama_tpu.ops.conv import conv_stencil_apply

        W, corr = self._kernels()
        return conv_stencil_apply(grid, W, corr, self.eff_ngl,
                                  tuple(reversed(self.npts)), self.k_out)

    # -- blocked layout (hot-loop) interface ----------------------------
    @property
    def npts_grid(self):
        return tuple(reversed(self.npts))

    @property
    def eff_ngl(self):
        """Blocked-layout period + 1: ngl for sb=1, sb*(ngl-1)+1 super."""
        return self.sb * (self.ngl - 1) + 1

    @property
    def blocked_shape_in(self):
        from pynama_tpu.ops.conv import blocked_shape

        return blocked_shape(self.eff_ngl, self.npts_grid, self.k_in)

    def to_blocked(self, grid):
        from pynama_tpu.ops.conv import to_blocked

        return to_blocked(grid, self.eff_ngl)

    def from_blocked(self, xb):
        from pynama_tpu.ops.conv import from_blocked

        return from_blocked(xb, self.eff_ngl, self.npts_grid)

    def apply_blocked(self, xb, corrections=True):
        """Blocked-in/blocked-out apply (pad slots zeroed on output).

        corrections=False skips the phantom-cell boundary corrections —
        valid when the caller masks out every boundary row and column
        (fully-Dirichlet masked operators), where the phantom terms are
        annihilated anyway.
        """
        from pynama_tpu.ops.conv import conv_stencil_apply_blocked

        W, corr = self._kernels()
        return conv_stencil_apply_blocked(
            xb, W, corr if corrections else (), self.eff_ngl,
            self.npts_grid, self.k_out,
        )

    def diagonal(self):
        N = self.ngl
        d = jnp.diagonal(self.A)
        nE = int(np.prod(self.nelem))
        de = jnp.broadcast_to(d, (nE, d.shape[0]))
        out = jnp.zeros(self._grid_shape(self.k_out), dtype=self.A.dtype)
        out = grid_scatter_add(out, de, N, self.nelem, N - 1,
                               (0,) * len(self.nelem))
        return out.reshape(-1)
