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

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


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


def grid_scatter_add(out_grid, vals, N, ncells, step, offset):
    """Adjoint of grid_gather: block-contiguous slice-adds.

    vals: (ncells_total, N**dim * k). Returns the updated grid.
    """
    dim = len(ncells)
    k = out_grid.shape[-1]
    core = _block_pad(out_grid, ncells, step)
    shp = tuple(reversed(ncells))
    if dim == 2:
        nx, ny = ncells
        v = vals.reshape(ny, nx, N * N, k)
        n = 0
        for ly in range(N):
            by, sy = _axis_index(ly, offset[1], step, ny)
            for lx in range(N):
                bx, sx = _axis_index(lx, offset[0], step, nx)
                core = core.at[by, sy, bx, sx, :].add(v[:, :, n, :])
                n += 1
        flat = core.reshape((ny + 1) * step, (nx + 1) * step, k)
        return flat[: out_grid.shape[0], : out_grid.shape[1], :]
    nx, ny, nz = ncells
    v = vals.reshape(nz, ny, nx, N**3, k)
    n = 0
    for lz in range(N):
        bz, sz = _axis_index(lz, offset[2], step, nz)
        for ly in range(N):
            by, sy = _axis_index(ly, offset[1], step, ny)
            for lx in range(N):
                bx, sx = _axis_index(lx, offset[0], step, nx)
                core = core.at[bz, sz, by, sy, bx, sx, :].add(v[:, :, :, n, :])
                n += 1
    flat = core.reshape((nz + 1) * step, (ny + 1) * step, (nx + 1) * step, k)
    return flat[: out_grid.shape[0], : out_grid.shape[1], : out_grid.shape[2], :]


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

    def tree_flatten(self):
        return (self.A,), (self.ngl, self.nelem, self.npts, self.k_in,
                           self.k_out)

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
        N = self.ngl
        step = N - 1
        off = (0,) * len(self.nelem)
        grid = x.reshape(self._grid_shape(self.k_in))
        xe = grid_gather(grid, N, self.nelem, step, off)
        ye = xe @ self.A.T
        out = jnp.zeros(self._grid_shape(self.k_out), dtype=x.dtype)
        out = grid_scatter_add(out, ye, N, self.nelem, step, off)
        return out.reshape(-1)

    def diagonal(self):
        N = self.ngl
        d = jnp.diagonal(self.A)
        nE = int(np.prod(self.nelem))
        de = jnp.broadcast_to(d, (nE, d.shape[0]))
        out = jnp.zeros(self._grid_shape(self.k_out), dtype=self.A.dtype)
        out = grid_scatter_add(out, de, N, self.nelem, N - 1,
                               (0,) * len(self.nelem))
        return out.reshape(-1)
