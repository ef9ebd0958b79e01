"""Euler-Lagrange delta-function coupling, fixed-window and matrix-free.

TPU re-design of the reference's IBM matrices
(/root/reference/src/cases/immersed_boundary.py:213-251 buildIBMMatrix):
the reference builds a sparse interpolation matrix H (lag x euler) with
Python loops, S = H^T (dl h), A = H S, and LU-factors A — rebuilding
everything each step for moving bodies (:428-434).

Here every Lagrange point owns a STATIC 6x6 window of fine-grid nodes
(the 4-point kernel's support is 4x4; 6 covers the floor() jitter), so:

  * interpolation (H u)  = windowed gather + weighted sum,
  * spreading    (S q)   = weighted scatter-add,
  * the flux system A q = rhs is solved matrix-free with CG
    (A = H S is SPD; ~couple dozen iterations at these sizes),

all with static shapes — a moving body only changes index/weight VALUES,
so the dynamic case re-traces nothing and needs no host-side rebuild.

Scalings follow the reference exactly: H entries are the dimensionless
kernel products (after its h^2 rescale), S entries carry dl/h.
Requires a uniform fine grid (ngl <= 3 box mesh — the reference's IBM
assumption, immersed_boundary.py:48-58).
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pynama_tpu.ibm.diracs import KERNELS
from pynama_tpu.mesh.structured import BoxMesh
from pynama_tpu.solvers.cg import cg_solve

WIN = 6  # window size per axis


@dataclass
class IBMCoupling:
    mesh: BoxMesh
    dl: float
    kernel: str = "fourGrid"
    dtype: object = jnp.float64

    def __post_init__(self):
        m = self.mesh
        if not hasattr(m, "axis_coords"):
            raise NotImplementedError(
                "IBM coupling needs a structured box mesh for ON-DEVICE "
                "window computation; on unstructured gmsh domains use "
                "UnstructuredIBMCoupling (static) / LatticeIBMCoupling "
                "(moving)"
            )
        if m.dim != 2:
            raise NotImplementedError("IBM coupling is 2D (like the reference)")
        ax = m.axis_coords
        dx = np.diff(ax[0])
        dy = np.diff(ax[1])
        if not (np.allclose(dx, dx[0], rtol=1e-10) and np.allclose(dy, dy[0], rtol=1e-10)):
            raise ValueError(
                "IBM needs a uniform fine grid: use ngl<=3 box meshes "
                "(GLL spacing is non-uniform inside ngl>3 elements)"
            )
        if not np.isclose(dx[0], dy[0]):
            raise ValueError("IBM needs square grid cells")
        self.h = float(dx[0])
        self.lower = np.asarray(m.lower)
        self.npx, self.npy = m.npts
        self.phi = KERNELS[self.kernel]

    # ------------------------------------------------------------------
    def windows(self, X):
        """Window node ids + kernel weights for Lagrange points X (L, 2).

        Returns (nodes (L, WIN*WIN) int32, weights (L, WIN*WIN)); weights
        are the dimensionless products phi(dx/h) phi(dy/h) (each row sums
        to 1 — the discrete mass condition).
        """
        s = (X - jnp.asarray(self.lower, dtype=X.dtype)[None, :]) / self.h
        base = jnp.floor(s).astype(jnp.int32) - (WIN // 2 - 1)
        offs = jnp.arange(WIN, dtype=jnp.int32)
        ix = base[:, 0:1] + offs[None, :]              # (L, WIN)
        iy = base[:, 1:2] + offs[None, :]
        wx = self.phi(s[:, 0:1] - ix.astype(X.dtype))  # (L, WIN)
        wy = self.phi(s[:, 1:2] - iy.astype(X.dtype))
        # clip out-of-domain indices and kill their weights
        okx = (ix >= 0) & (ix < self.npx)
        oky = (iy >= 0) & (iy < self.npy)
        wx = jnp.where(okx, wx, 0.0)
        wy = jnp.where(oky, wy, 0.0)
        ix = jnp.clip(ix, 0, self.npx - 1)
        iy = jnp.clip(iy, 0, self.npy - 1)
        nodes = (iy[:, :, None] * self.npx + ix[:, None, :]).reshape(X.shape[0], -1)
        weights = (wy[:, :, None] * wx[:, None, :]).reshape(X.shape[0], -1)
        return nodes, weights

    # -- operator applies (vel dof layout: node*2 + c) -------------------
    def interp(self, u, nodes, weights):
        """(H u): fluid velocity at Lagrange points, (L, 2)."""
        ue = u.reshape(-1, 2)[nodes]                   # (L, K, 2)
        return jnp.einsum("lk,lkc->lc", weights, ue)

    def spread(self, q, nodes, weights, n_nodes):
        """(S q): spread Lagrange flux to fluid dofs, scaled dl/h."""
        vals = weights[:, :, None] * q[:, None, :] * (self.dl / self.h)
        out = jnp.zeros((n_nodes, 2), dtype=q.dtype)
        out = out.at[nodes.reshape(-1)].add(vals.reshape(-1, 2))
        return out.reshape(-1)

    def flux_diag(self, weights):
        """diag(A) = dl/h * sum_k w^2 (Jacobi preconditioner)."""
        return (weights * weights).sum(axis=1) * (self.dl / self.h)

    def solve_correction(self, vel, body_vel, nodes, weights, rtol=1e-10,
                         maxiter=500):
        """Velocity correction u += S q with A q = -(H u - U_body).

        Parity: computeVelocityCorrection
        (immersed_boundary.py:205-211) — LU on the assembled A replaced
        by matrix-free Jacobi-CG.
        Returns (corrected velocity, virtual flux q (L,2)).
        """
        n_nodes = vel.shape[0] // 2
        rhs = body_vel - self.interp(vel, nodes, weights)  # -(Hu - Ub)

        def A(qf):
            q = qf.reshape(-1, 2)
            return self.interp(
                self.spread(q, nodes, weights, n_nodes), nodes, weights
            ).reshape(-1)

        d = self.flux_diag(weights)
        m_inv = 1.0 / jnp.repeat(jnp.maximum(d, 1e-30), 2)
        res = cg_solve(A, rhs.reshape(-1), m_inv=m_inv, rtol=rtol,
                       maxiter=maxiter)
        q = res.x.reshape(-1, 2)
        vel = vel + self.spread(q, nodes, weights, n_nodes)
        return vel, q


@dataclass
class UnstructuredIBMCoupling(IBMCoupling):
    """Delta-function coupling on a LOCALLY-UNIFORM unstructured region.

    Parity: the reference runs IBM on any DMPlex/gmsh mesh using the
    config 'h-min' as the IBM grid spacing
    (/root/reference/src/cases/immersed_boundary.py:55-58). The Peskin
    discrete-delta identities (sum phi = 1, linear reproduction) only
    hold on a uniform grid, so validity requires the mesh to be uniform
    with spacing ~h inside the 4h x 4h kernel support of every Lagrange
    point — the usual gmsh construction (a uniformly refined box around
    the body, coarsening outward). Construction VALIDATES this: window
    weight rows must sum to 1 within 1%.

    Windows are precomputed HOST-side (the node set has no grid
    structure to index on device), so bodies must be static; moving
    bodies keep the on-device box-mesh path (IBMCoupling.windows).
    Operator applies (interp/spread/flux solve) are inherited — they
    only consume (nodes, weights).
    """

    h_min: float = None  # kernel-support spacing ('h-min' / (ngl-1))

    def __post_init__(self):
        if self.mesh.dim != 2:
            raise NotImplementedError("IBM coupling is 2D (like the reference)")
        if self.h_min is None:
            raise ValueError("UnstructuredIBMCoupling needs h_min")
        self.h = float(self.h_min)
        self.phi = KERNELS[self.kernel]
        self._cache = None

    def windows_host(self, X):
        """Precompute (nodes, weights) for static Lagrange points X.

        Brute-force support search (L x N distances, host numpy): every
        euler node within the kernel's 4h x 4h box contributes
        phi(dx/h) phi(dy/h); rows are padded to a fixed capacity with
        zero-weight entries pointing at node 0.
        """
        X = np.asarray(X, dtype=np.float64)
        coords = np.asarray(self.mesh.coords, dtype=np.float64)[:, :2]
        h = self.h
        nodes_l, weights_l = [], []
        for x in X:
            d = (coords - x[None, :]) / h
            sel = np.flatnonzero((np.abs(d[:, 0]) < 2.0)
                                 & (np.abs(d[:, 1]) < 2.0))
            w = (np.asarray(self.phi(jnp.asarray(d[sel, 0])))
                 * np.asarray(self.phi(jnp.asarray(d[sel, 1]))))
            keep = np.abs(w) > 1e-14
            nodes_l.append(sel[keep])
            weights_l.append(w[keep])
        rowsums = np.array([w.sum() for w in weights_l])
        bad = np.abs(rowsums - 1.0) > 1e-2
        if bad.any():
            raise ValueError(
                f"mesh is not locally uniform at spacing h={h:g} around "
                f"{int(bad.sum())}/{len(X)} Lagrange points (window "
                f"weight sums {rowsums[bad][:4]} != 1): refine the gmsh "
                f"region around the body uniformly or fix 'h-min'"
            )
        cap = max(len(n) for n in nodes_l)
        L = len(nodes_l)
        nodes = np.zeros((L, cap), dtype=np.int32)
        weights = np.zeros((L, cap))
        for i, (n, w) in enumerate(zip(nodes_l, weights_l)):
            nodes[i, :len(n)] = n
            weights[i, :len(w)] = w
        self._cache = (jnp.asarray(nodes),
                       jnp.asarray(weights, dtype=self.dtype))
        return self._cache

    def windows(self, X):
        """Static precomputed windows (X is ignored: bodies are static;
        windows_host must have been called at setup)."""
        if self._cache is None:
            raise RuntimeError(
                "UnstructuredIBMCoupling.windows_host(X) must run at "
                "setup (static bodies only on gmsh domains)"
            )
        return self._cache


@dataclass
class LatticeIBMCoupling(IBMCoupling):
    """MOVING bodies on a locally-uniform unstructured (gmsh) region.

    Parity: the reference's dynamic IBM runs on any DMPlex mesh by
    reassembling H/S/KSP from scratch every step
    (/root/reference/src/cases/immersed_boundary.py:335-434). Here the
    uniform sub-region the body moves through is snapped HOST-side, once,
    onto a virtual lattice (spacing h = 'h-min'/(ngl-1)); a dense
    lattice -> global-node-id table then lets the ON-DEVICE box-window
    math (floor + static WIN x WIN offsets + kernel weights) run
    unchanged for any body position inside the envelope — a moving body
    only changes index/weight VALUES, so nothing re-traces and no
    host-side rebuild happens.

    ``envelope`` is the (lo, hi) bounding box of every Lagrange point
    over the whole run (the caller samples the prescribed kinematics);
    construction VALIDATES that every lattice site within kernel reach
    (2h) of it is occupied by a mesh node, so windows never read a
    missing site with nonzero weight.
    """

    h_min: float = None
    envelope: tuple = None  # (lo (2,), hi (2,)) box the body stays inside

    def __post_init__(self):
        if self.mesh.dim != 2:
            raise NotImplementedError("IBM coupling is 2D (like the reference)")
        if self.h_min is None or self.envelope is None:
            raise ValueError("LatticeIBMCoupling needs h_min and envelope")
        h = self.h = float(self.h_min)
        self.phi = KERNELS[self.kernel]
        lo = np.asarray(self.envelope[0], dtype=np.float64)
        hi = np.asarray(self.envelope[1], dtype=np.float64)
        # lattice must cover the kernel support (2h) around the envelope,
        # plus the WIN-window slack ring (zero-weight reads are clipped
        # in-table, so one extra cell suffices for floor() jitter)
        pad = (WIN // 2 + 1) * h
        coords = np.asarray(self.mesh.coords, dtype=np.float64)[:, :2]
        sel = np.flatnonzero(
            (coords[:, 0] >= lo[0] - pad) & (coords[:, 0] <= hi[0] + pad)
            & (coords[:, 1] >= lo[1] - pad) & (coords[:, 1] <= hi[1] + pad)
        )
        if sel.size == 0:
            raise ValueError("no mesh nodes inside the IBM envelope")
        sub = coords[sel]
        origin = sub.min(axis=0)
        idx = np.rint((sub - origin[None, :]) / h).astype(np.int64)
        on_lattice = (
            np.abs(sub - (origin[None, :] + idx * h)) < 0.05 * h
        ).all(axis=1)
        idx, lat_nodes = idx[on_lattice], sel[on_lattice]
        nx = int(idx[:, 0].max()) + 1
        ny = int(idx[:, 1].max()) + 1
        table = np.full((ny, nx), -1, dtype=np.int32)
        flat = idx[:, 1] * nx + idx[:, 0]
        if len(np.unique(flat)) != len(flat):
            raise ValueError(
                "two mesh nodes snapped to the same lattice site: the "
                "region around the body is not uniform at spacing "
                f"h={h:g} — fix 'h-min' or refine the gmsh region"
            )
        table.reshape(-1)[flat] = lat_nodes
        # strict-support occupancy: every site within 2h of the envelope
        # (where kernel weights can be nonzero) must hold a mesh node
        i_lo = np.floor((lo - 2 * h - origin) / h + 0.5).astype(int)
        i_hi = np.ceil((hi + 2 * h - origin) / h - 0.5).astype(int)
        out_of_table = int(
            np.maximum(-i_lo, 0).sum()
            + np.maximum(i_hi - [nx - 1, ny - 1], 0).sum()
        )
        i_lo = np.maximum(i_lo, 0)
        i_hi = np.minimum(i_hi, [nx - 1, ny - 1])
        core = table[i_lo[1]:i_hi[1] + 1, i_lo[0]:i_hi[0] + 1]
        n_missing = int((core < 0).sum()) + out_of_table
        if n_missing:
            raise ValueError(
                f"{n_missing} lattice sites within kernel "
                f"reach of the body envelope have no mesh node at "
                f"spacing h={h:g}: refine the gmsh region uniformly "
                "over the whole motion envelope (+2h) or fix 'h-min'"
            )
        self.lower = origin
        self.npx, self.npy = nx, ny
        self._table = jnp.asarray(table.reshape(-1))

    def windows(self, X):
        """On-device lattice windows -> global node ids (moving-safe)."""
        lat_nodes, weights = IBMCoupling.windows(self, X)
        g = self._table[lat_nodes]
        weights = jnp.where(g >= 0, weights, jnp.zeros_like(weights))
        return jnp.maximum(g, 0), weights
