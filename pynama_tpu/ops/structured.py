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


def _axis_slices(N, ncells, step, offset):
    """Per-local-index (start, stop) along one axis; stride = step."""
    return [
        (offset + l, offset + l + step * (ncells - 1) + 1) for l in range(N)
    ]


def grid_gather(grid, N, ncells, step, offset):
    """Gather element-local nodal values from a node grid.

    grid: (..., np_axis0, np_axis1[, np_axis2], k) with leading node axes in
    z,y,x order matching the lexicographic global numbering (x fastest).
    Returns (ncells_total, N**dim * k) with local node index lexicographic
    (x fastest) and dof interleaved (node-major).
    """
    dim = len(ncells)
    k = grid.shape[-1]
    pieces = []
    if dim == 2:
        sy = _axis_slices(N, ncells[1], step, offset[1])  # y axis (rows)
        sx = _axis_slices(N, ncells[0], step, offset[0])
        for ly in range(N):
            for lx in range(N):
                (y0, y1), (x0, x1) = sy[ly], sx[lx]
                pieces.append(grid[y0:y1:step, x0:x1:step, :])
        xe = jnp.stack(pieces, axis=2)  # (ny, nx, N*N, k)
        return xe.reshape(ncells[1] * ncells[0], N * N * k)
    sz = _axis_slices(N, ncells[2], step, offset[2])
    sy = _axis_slices(N, ncells[1], step, offset[1])
    sx = _axis_slices(N, ncells[0], step, offset[0])
    for lz in range(N):
        for ly in range(N):
            for lx in range(N):
                (z0, z1), (y0, y1), (x0, x1) = sz[lz], sy[ly], sx[lx]
                pieces.append(grid[z0:z1:step, y0:y1:step, x0:x1:step, :])
    xe = jnp.stack(pieces, axis=3)  # (nz, ny, nx, N^3, k)
    return xe.reshape(int(np.prod(ncells)), N**3 * k)


def grid_scatter_add(out_grid, vals, N, ncells, step, offset):
    """Adjoint of grid_gather: slice-add element values into a node grid.

    vals: (ncells_total, N**dim * k). Returns the updated grid.
    """
    dim = len(ncells)
    k = out_grid.shape[-1]
    if dim == 2:
        v = vals.reshape(ncells[1], ncells[0], N * N, k)
        sy = _axis_slices(N, ncells[1], step, offset[1])
        sx = _axis_slices(N, ncells[0], step, offset[0])
        n = 0
        for ly in range(N):
            for lx in range(N):
                (y0, y1), (x0, x1) = sy[ly], sx[lx]
                out_grid = out_grid.at[y0:y1:step, x0:x1:step, :].add(
                    v[:, :, n, :]
                )
                n += 1
        return out_grid
    v = vals.reshape(ncells[2], ncells[1], ncells[0], N**3, k)
    sz = _axis_slices(N, ncells[2], step, offset[2])
    sy = _axis_slices(N, ncells[1], step, offset[1])
    sx = _axis_slices(N, ncells[0], step, offset[0])
    n = 0
    for lz in range(N):
        for ly in range(N):
            for lx in range(N):
                (z0, z1), (y0, y1), (x0, x1) = sz[lz], sy[ly], sx[lx]
                out_grid = out_grid.at[z0:z1:step, y0:y1:step, x0:x1:step, :].add(
                    v[:, :, :, n, :]
                )
                n += 1
    return out_grid


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
