"""Unstructured 2D quad GLL mesh (Gmsh import path).

Parity: DMPlexDom with a gmsh file (/root/reference/src/domain/dmplex.py:
22-23, 66-95 computeFullCoordinates) + Section-based high-order numbering
(indices.py). Numbering comes from the native meshcore component (or its
Python mirror); high-order node coordinates come from the bilinear corner
map evaluated at GLL points, exactly like the reference's HCoo
interpolation.
"""

from functools import cached_property
from typing import Dict, Optional

import numpy as np

from pynama_tpu.elements.quadrature import lobatto_points
from pynama_tpu.mesh.native import quad_highorder_numbering


class UnstructuredQuadMesh:
    """2D quad spectral-element mesh from corner connectivity."""

    def __init__(self, points, quads_ccw, ngl, boundary_lines=None,
                 force_python_numbering=False):
        """points (nv,2); quads_ccw (nc,4) gmsh counterclockwise corners;
        boundary_lines: dict name -> (nl,2) corner-id pairs."""
        self.dim = 2
        self.dim_w = 1
        self.dim_s = 3
        self.ngl = int(ngl)
        self.uniform = False
        points = np.asarray(points, dtype=np.float64)
        quads_ccw = np.asarray(quads_ccw, dtype=np.int64)
        # gmsh ccw (v0,v1,v2,v3) -> lexicographic (v0,v1,v3,v2)
        self._corners_lex = quads_ccw[:, [0, 1, 3, 2]]
        self._corner_coords = points
        self.n_cells = len(quads_ccw)

        c2n, n_nodes, edge_pairs = quad_highorder_numbering(
            self._corners_lex, len(points), self.ngl,
            force_python=force_python_numbering,
        )
        self.cell2node = c2n.astype(np.int32)
        self.n_nodes = n_nodes
        self._edge_pairs = edge_pairs
        self._boundary_lines = boundary_lines or {}

    @classmethod
    def from_gmsh(cls, path, ngl):
        from pynama_tpu.mesh.gmsh import read_msh

        data = read_msh(path)
        return cls(data.points, data.quads, ngl,
                   boundary_lines=data.boundary_lines)

    # ------------------------------------------------------------------
    @cached_property
    def coords(self):
        """(n_nodes, 2): corners, straight-edge GLL nodes, bilinear interior.

        Parity: computeFullCoordinates (dmplex.py:66-95) — corner-based
        (bilinear) geometry interpolated at GLL points.
        """
        N = self.ngl
        gll, _ = lobatto_points(N)
        t = (gll[1:-1] + 1.0) / 2.0  # edge parameters in (0,1)
        nv = len(self._corner_coords)
        ni = N - 2
        n_edges = len(self._edge_pairs)
        out = np.empty((self.n_nodes, 2))
        out[:nv] = self._corner_coords
        if n_edges:
            lo = self._corner_coords[self._edge_pairs[:, 0]]  # (ne,2)
            hi = self._corner_coords[self._edge_pairs[:, 1]]
            edge_nodes = lo[:, None, :] + t[None, :, None] * (hi - lo)[:, None, :]
            out[nv : nv + n_edges * ni] = edge_nodes.reshape(-1, 2)
        if ni > 0:
            # interior: bilinear map at (tx, ty)
            tx, ty = np.meshgrid(t, t, indexing="xy")  # (ni, ni), x fastest
            w00 = ((1 - tx) * (1 - ty)).reshape(-1)
            w10 = (tx * (1 - ty)).reshape(-1)
            w01 = ((1 - tx) * ty).reshape(-1)
            w11 = (tx * ty).reshape(-1)
            c = self._corner_coords[self._corners_lex]  # (nc, 4, 2)
            interior = (
                w00[None, :, None] * c[:, 0, None, :]
                + w10[None, :, None] * c[:, 1, None, :]
                + w01[None, :, None] * c[:, 2, None, :]
                + w11[None, :, None] * c[:, 3, None, :]
            )  # (nc, ni*ni, 2)
            out[nv + n_edges * ni :] = interior.reshape(-1, 2)
        return out

    @cached_property
    def cell_corners(self):
        return self._corner_coords[self._corners_lex]

    # -- boundary topology -------------------------------------------------
    @cached_property
    def _edge_lookup(self):
        nv = len(self._corner_coords)
        return {
            (int(lo), int(hi)): k
            for k, (lo, hi) in enumerate(self._edge_pairs)
        }

    def _line_nodes(self, pairs):
        """All GLL node ids on the given corner-pair boundary lines."""
        N, ni = self.ngl, self.ngl - 2
        nv = len(self._corner_coords)
        nodes = set()
        for a, b in pairs:
            a, b = int(a), int(b)
            nodes.add(a)
            nodes.add(b)
            lo, hi = (a, b) if a < b else (b, a)
            eid = self._edge_lookup.get((lo, hi))
            if eid is not None:
                base = nv + eid * ni
                nodes.update(range(base, base + ni))
        return np.asarray(sorted(nodes), dtype=np.int32)

    @cached_property
    def face_nodes(self) -> Dict[str, np.ndarray]:
        return {
            name: self._line_nodes(pairs)
            for name, pairs in self._boundary_lines.items()
        }

    @cached_property
    def boundary_nodes(self):
        """All boundary nodes: edges referenced by exactly one cell.

        Parity: markBoundaryFaces 'External Boundary' (dmplex.py:27-28).
        """
        counts = {}
        for cell in self._corners_lex:
            for ia, ib in ((0, 1), (2, 3), (0, 2), (1, 3)):
                a, b = int(cell[ia]), int(cell[ib])
                key = (a, b) if a < b else (b, a)
                counts[key] = counts.get(key, 0) + 1
        pairs = [k for k, v in counts.items() if v == 1]
        return self._line_nodes(np.asarray(pairs, dtype=np.int64))

    # -- dof helpers (same layout as BoxMesh) ------------------------------
    def cell_dofs(self, k: int):
        c2n = self.cell2node.astype(np.int64)
        dofs = c2n[:, :, None] * k + np.arange(k)[None, None, :]
        return dofs.reshape(self.n_cells, -1).astype(np.int32)

    def node_dofs(self, nodes, k: int):
        nodes = np.asarray(nodes, dtype=np.int64)
        dofs = nodes[:, None] * k + np.arange(k)[None, :]
        return dofs.reshape(-1).astype(np.int32)
