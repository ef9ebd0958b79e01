"""Multi-chip slab decomposition with explicit halo exchange over ICI.

TPU-native replacement for the reference's PETSc mesh distribution + MPI
assembly exchange (/root/reference/src/domain/dmplex.py:29 distribute();
SURVEY.md section 2c): the box mesh is split into equal element slabs along
its last axis, one per device in a 1D jax.sharding.Mesh. Each device owns a
contiguous block of fine-grid node PLANES, overlapping its neighbors by
exactly one plane (the shared element-interface nodes).

Because global node numbering is lexicographic with the last axis slowest,
a device's node block is a CONTIGUOUS slice of every global vector — so
distributed state is just the global vector reshaped to (P, n_loc) with a
one-plane overlap, and:

  * gather/GEMM/scatter-add of elemental operators is device-local,
  * after scatter-add, interface planes hold partial sums completed by a
    two-way neighbor exchange (lax.ppermute over ICI) — `halo_sum`,
  * reductions (CG dots, RK error norms) weight interface planes on a
    single owner and psum.

Everything runs inside shard_map, so XLA compiles one SPMD program per
step: CG iterations, halo exchanges, stage loop and dt control included.
"""

from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pynama_tpu.mesh.structured import BoxMesh

AXIS = "dev"


def _plane_owner(row0, rows):
    """Owning device of each global node plane.

    Shared interface planes (first plane of device d > 0) belong to
    device d-1 — the owned_weights/owned_grid_weights convention.
    """
    row0 = np.asarray(row0)
    owner = np.searchsorted(row0, rows, side="right") - 1
    shared = (owner > 0) & (rows == row0[owner])
    return np.where(shared, owner - 1, owner)


@dataclass
class SlabDecomposition:
    """Element-slab partition of a BoxMesh over n_dev devices."""

    mesh: BoxMesh
    n_dev: int

    def __post_init__(self):
        m = self.mesh
        last = m.nelem[-1]
        if last % self.n_dev != 0:
            raise ValueError(
                f"nelem[-1]={last} must divide evenly over {self.n_dev} devices"
            )
        self.ne_loc = last // self.n_dev  # element planes per device
        N = m.ngl
        # nodes per fine-grid plane (all axes but the last)
        self.plane = int(np.prod(m.npts[:-1]))
        self.rows_loc = self.ne_loc * (N - 1) + 1  # node planes per device
        self.n_loc = self.plane * self.rows_loc
        # global node-plane start of each device block
        self.row0 = np.arange(self.n_dev) * self.ne_loc * (N - 1)
        # elements per device (contiguous: last axis is slowest in cell id)
        self.cells_loc = m.n_cells // self.n_dev

    # -- distribution of vectors ----------------------------------------
    def node_slices(self, k: int):
        """Global dof index block of each device for k dofs/node."""
        starts = self.row0 * self.plane * k
        length = self.n_loc * k
        return starts, length

    def to_local(self, x_global, k: int):
        """(n_nodes*k,) -> (P, n_loc*k) stacked overlapping blocks (host)."""
        x = np.asarray(x_global)
        starts, length = self.node_slices(k)
        return np.stack([x[s : s + length] for s in starts])

    def from_local(self, x_stacked, k: int):
        """(P, n_loc*k) -> (n_nodes*k,): drop the duplicated first plane."""
        xs = np.asarray(x_stacked)
        pk = self.plane * k
        parts = [xs[0]] + [xs[d][pk:] for d in range(1, self.n_dev)]
        return np.concatenate(parts)

    def local_cell_dofs(self, k: int):
        """(P, cells_loc, nnode*k) int32, device-local dof numbering."""
        g = np.asarray(self.mesh.cell_dofs(k))
        out = []
        for d in range(self.n_dev):
            cells = slice(d * self.cells_loc, (d + 1) * self.cells_loc)
            off = self.row0[d] * self.plane * k
            out.append(g[cells] - off)
        return np.stack(out).astype(np.int32)

    def owned_weights(self, k: int):
        """(P, n_loc*k): 1 on owned dofs, 0 on the duplicated first plane."""
        w = np.ones((self.n_dev, self.n_loc * k))
        w[1:, : self.plane * k] = 0.0
        return w

    # -- grid-shaped distribution ---------------------------------------
    @property
    def local_npts(self):
        """Local node counts, MESH-axis order (last axis = sliced)."""
        return tuple(self.mesh.npts[:-1]) + (self.rows_loc,)

    def local_grid_shape(self, k: int):
        """Local grid shape, GRID order (sliced axis slowest/first)."""
        return (self.rows_loc,) + tuple(reversed(self.mesh.npts[:-1])) + (k,)

    def to_local_grid(self, x_global, k: int):
        """(n_nodes*k,) -> (P, rows_loc, ..., k) stacked local grids."""
        g = np.asarray(x_global).reshape(
            tuple(reversed(self.mesh.npts)) + (k,)
        )
        return np.stack(
            [g[r0 : r0 + self.rows_loc] for r0 in self.row0]
        )

    def from_local_grid(self, x_stacked):
        """(P, rows_loc, ..., k) -> flat (n_nodes*k,), dedup first planes."""
        xs = np.asarray(x_stacked)
        parts = [xs[0]] + [xs[d][1:] for d in range(1, self.n_dev)]
        return np.concatenate(parts).reshape(-1)

    def owned_grid_weights(self, k: int):
        """(P, rows_loc, ..., k): 1 on owned planes, 0 on duplicated."""
        w = np.ones((self.n_dev,) + self.local_grid_shape(k))
        w[1:, 0] = 0.0
        return w

    def owner_field(self):
        """(n_nodes,) float: owning device index of every node.

        The analogue of the reference's createNumProcVec rank-ownership
        debug field (base_problem.py:164-172) — write it with XdmfWriter
        or io.vtk to inspect the partition visually. Shared interface
        planes belong to the lower device (owned_weights convention).
        """
        rows = np.arange(self.mesh.npts[-1])
        return np.repeat(_plane_owner(self.row0, rows).astype(np.float64),
                         self.plane)

    # -- device mesh -----------------------------------------------------
    def device_mesh(self, devices=None):
        devices = devices if devices is not None else jax.devices()[: self.n_dev]
        return Mesh(np.array(devices), (AXIS,))

    def sharding(self, mesh):
        return NamedSharding(mesh, P(AXIS))


@dataclass
class GridDecomposition:
    """N-D pencil partition of a BoxMesh over a device grid.

    pgrid[j] devices partition GRID axis j (slowest-first, i.e. grid axis
    0 = the LAST mesh axis); pgrid=(n,) reproduces the slab. Each device
    owns a contiguous block of node planes per partitioned axis with a
    one-plane overlap, so interface sums complete by one ppermute per
    axis (halo_sum_blocked_axis) — sequential exchanges carry the
    edge/corner coupling. The device mesh axes are named dev0, dev1, ...
    matching pgrid order.
    """

    mesh: BoxMesh
    pgrid: tuple

    def __post_init__(self):
        m = self.mesh
        self.naxes = len(self.pgrid)
        if self.naxes > m.dim:
            raise ValueError("more partitioned axes than mesh dimensions")
        N = m.ngl
        self.ne_loc = []
        self.rows_loc = []
        self.row0 = []
        for j, p in enumerate(self.pgrid):
            nel = m.nelem[m.dim - 1 - j]  # grid axis j = mesh axis dim-1-j
            if nel % p != 0:
                raise ValueError(
                    f"nelem[{m.dim - 1 - j}]={nel} must divide evenly "
                    f"over {p} devices (grid axis {j})"
                )
            ne = nel // p
            self.ne_loc.append(ne)
            self.rows_loc.append(ne * (N - 1) + 1)
            self.row0.append(np.arange(p) * ne * (N - 1))
        self.axis_names = tuple(f"dev{j}" for j in range(self.naxes))

    @property
    def local_npts(self):
        """Local node counts, MESH-axis order."""
        npts = list(self.mesh.npts)
        for j in range(self.naxes):
            npts[self.mesh.dim - 1 - j] = self.rows_loc[j]
        return tuple(npts)

    @property
    def local_nelem(self):
        nel = list(self.mesh.nelem)
        for j in range(self.naxes):
            nel[self.mesh.dim - 1 - j] = self.ne_loc[j]
        return tuple(nel)

    def local_grid_shape(self, k: int):
        return tuple(reversed(self.local_npts)) + (k,)

    def owner_field(self):
        """(n_nodes,) float: linear owning-device index of every node.

        Pencil analogue of SlabDecomposition.owner_field (the reference's
        createNumProcVec, base_problem.py:164-172): per partitioned grid
        axis the plane owner is computed with the shared-plane-to-lower
        convention, then axis owners combine row-major in pgrid order
        (matching np.ndindex(*pgrid) device linearization).
        """
        gshape = tuple(reversed(self.mesh.npts))
        lin = np.zeros(gshape, dtype=np.int64)
        for j, p in enumerate(self.pgrid):
            rows = np.arange(gshape[j])
            own = _plane_owner(self.row0[j], rows)
            bshape = [1] * len(gshape)
            bshape[j] = gshape[j]
            lin = lin * p + own.reshape(bshape)
        return lin.reshape(-1).astype(np.float64)

    def to_local_grid(self, x_global, k: int):
        """flat global -> (pgrid..., local_grid...) stacked local grids."""
        g = np.asarray(x_global).reshape(
            tuple(reversed(self.mesh.npts)) + (k,)
        )
        out = np.empty(tuple(self.pgrid) + self.local_grid_shape(k),
                       dtype=g.dtype)
        for didx in np.ndindex(*self.pgrid):
            sl = [slice(None)] * g.ndim
            for j, d in enumerate(didx):
                sl[j] = slice(self.row0[j][d],
                              self.row0[j][d] + self.rows_loc[j])
            out[didx] = g[tuple(sl)]
        return out

    def from_local_grid(self, x_stacked):
        """Inverse of to_local_grid (drops duplicated first planes)."""
        xs = np.asarray(x_stacked)
        gshape = tuple(reversed(self.mesh.npts)) + xs.shape[-1:]
        g = np.empty(gshape, dtype=xs.dtype)
        for didx in np.ndindex(*self.pgrid):
            src = [slice(None)] * (len(gshape))
            dst = [slice(None)] * (len(gshape))
            for j, d in enumerate(didx):
                lo = 0 if d == 0 else 1
                src[j] = slice(lo, self.rows_loc[j])
                dst[j] = slice(self.row0[j][d] + lo,
                               self.row0[j][d] + self.rows_loc[j])
            g[tuple(dst)] = xs[didx][tuple(src)]
        return g.reshape(-1)

    def owned_grid_weights(self, k: int):
        """(pgrid..., local_grid...): 1 on owned planes, 0 on duplicated."""
        w = np.ones(tuple(self.pgrid) + self.local_grid_shape(k))
        for j, p in enumerate(self.pgrid):
            if p == 1:
                continue
            idx = [slice(None)] * w.ndim
            idx[j] = slice(1, None)            # devices > 0 on this axis
            idx[self.naxes + j] = 0            # their first local plane
            w[tuple(idx)] = 0.0
        return w

    def device_mesh(self, devices=None):
        n = int(np.prod(self.pgrid))
        devices = devices if devices is not None else jax.devices()[:n]
        return Mesh(np.array(devices).reshape(self.pgrid), self.axis_names)


# ----------------------------------------------------------------------
# inside-shard_map primitives
# ----------------------------------------------------------------------
def halo_sum(x_loc, plane_k: int, n_dev: int):
    """Complete interface-plane partial sums with both neighbors.

    x_loc: (n_loc*k,) local post-scatter vector. The first plane_k entries
    duplicate the lower neighbor's last plane; symmetric for the last.
    lax.ppermute yields zeros for absent neighbors (slab ends).
    """
    if n_dev == 1:
        return x_loc
    first = jax.lax.dynamic_slice(x_loc, (0,), (plane_k,))
    last = jax.lax.dynamic_slice(x_loc, (x_loc.shape[0] - plane_k,), (plane_k,))
    from_above = jax.lax.ppermute(
        first, AXIS, [(i, i - 1) for i in range(1, n_dev)]
    )
    from_below = jax.lax.ppermute(
        last, AXIS, [(i, i + 1) for i in range(n_dev - 1)]
    )
    x_loc = x_loc.at[-plane_k:].add(from_above)
    x_loc = x_loc.at[:plane_k].add(from_below)
    return x_loc


def local_element_apply(A, x_loc, in_dofs, out_dofs, out_size, plane_k, n_dev):
    """Distributed ElementOp apply: local gather/GEMM/scatter + halo_sum."""
    xe = x_loc[in_dofs]
    if A.ndim == 2:
        ye = xe @ A.T
    else:
        ye = jnp.einsum("eoi,ei->eo", A, xe)
    y = jnp.zeros((out_size,), dtype=x_loc.dtype)
    y = y.at[out_dofs.reshape(-1)].add(ye.reshape(-1))
    return halo_sum(y, plane_k, n_dev)


def halo_sum_grid(x, n_dev: int):
    """halo_sum for GRID-shaped local state (rows_loc, ..., k).

    The first/last node planes along grid axis 0 are the element-interface
    planes shared with the neighbor slabs; after a local element apply they
    hold partial sums completed here via ppermute.
    """
    if n_dev == 1:
        return x
    from_above = jax.lax.ppermute(
        x[0], AXIS, [(i, i - 1) for i in range(1, n_dev)]
    )
    from_below = jax.lax.ppermute(
        x[-1], AXIS, [(i, i + 1) for i in range(n_dev - 1)]
    )
    x = x.at[-1].add(from_above)
    x = x.at[0].add(from_below)
    return x


def halo_sum_grid_axis(x, grid_axis: int, axis_name: str, n_dev: int):
    """halo_sum for GRID-shaped local state along one partitioned axis."""
    if n_dev == 1:
        return x

    def plane(block):
        idx = [slice(None)] * x.ndim
        idx[grid_axis] = block
        return tuple(idx)

    lo = x[plane(0)]
    hi = x[plane(x.shape[grid_axis] - 1)]
    from_above = jax.lax.ppermute(
        lo, axis_name, [(i, i - 1) for i in range(1, n_dev)]
    )
    from_below = jax.lax.ppermute(
        hi, axis_name, [(i, i + 1) for i in range(n_dev - 1)]
    )
    x = x.at[plane(x.shape[grid_axis] - 1)].add(from_above)
    x = x.at[plane(0)].add(from_below)
    return x


def halo_sum_blocked_axis(xb, P: int, dim: int, grid_axis: int,
                          axis_name: str, n_dev: int):
    """Complete interface partial sums along ONE partitioned grid axis of
    a parity-blocked tensor (B0..Bd-1, P^dim*k).

    Grid plane r on axis a lives at (block r//P, sub r%P); the interface
    planes are (block 0, sub 0) and (block B_a-1, sub 0). Works for any
    axis by exposing the sub-index structure of the channel dim; on a
    multi-axis device mesh, apply once per partitioned axis in sequence —
    the second exchange carries the first's corner contributions, so
    edge/corner coupling completes without dedicated corner messages.
    """
    if n_dev == 1:
        return xb
    B = xb.shape[:dim]
    k = xb.shape[-1] // P**dim
    xr = xb.reshape(B + (P,) * dim + (k,))

    def plane_idx(block):
        idx = [slice(None)] * xr.ndim
        idx[grid_axis] = block
        idx[dim + grid_axis] = 0
        return tuple(idx)

    lo = xr[plane_idx(0)]
    hi = xr[plane_idx(B[grid_axis] - 1)]
    from_above = jax.lax.ppermute(
        lo, axis_name, [(i, i - 1) for i in range(1, n_dev)]
    )
    from_below = jax.lax.ppermute(
        hi, axis_name, [(i, i + 1) for i in range(n_dev - 1)]
    )
    xr = xr.at[plane_idx(B[grid_axis] - 1)].add(from_above)
    xr = xr.at[plane_idx(0)].add(from_below)
    return xr.reshape(xb.shape)


def halo_sum_blocked(xb, plane_c: int, n_dev: int):
    """halo_sum for parity-BLOCKED local state (B0, ..., P^dim*k).

    Grid plane r maps to (block r//P, sub r%P); channel packing puts grid
    axis 0's sub-index most significant, so the interface planes (sub 0 of
    block 0 / block B0-1) are the first ``plane_c = P^(dim-1)*k`` channels
    of those blocks. Pad slots in the last block sit at sub>0 and are
    untouched.
    """
    if n_dev == 1:
        return xb
    lo = xb[0, ..., :plane_c]
    hi = xb[-1, ..., :plane_c]
    from_above = jax.lax.ppermute(
        lo, AXIS, [(i, i - 1) for i in range(1, n_dev)]
    )
    from_below = jax.lax.ppermute(
        hi, AXIS, [(i, i + 1) for i in range(n_dev - 1)]
    )
    xb = xb.at[-1, ..., :plane_c].add(from_above)
    xb = xb.at[0, ..., :plane_c].add(from_below)
    return xb


def make_pdot(w_owned):
    """Distributed dot: interface planes counted once, psum over devices."""

    def pdot(a, b):
        return jax.lax.psum(jnp.sum(a * b * w_owned), AXIS)

    return pdot


def make_pnorm_mean(w_owned, n_global):
    """Distributed RMS norm over owned dofs (for RK error control)."""

    def norm_mean(e2):
        s = jax.lax.psum(jnp.sum(e2 * w_owned), AXIS)
        return jnp.sqrt(s / n_global)

    return norm_mean
