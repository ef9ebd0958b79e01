"""ctypes loader for the native meshcore library, with Python fallback.

The native component (native/meshcore.cpp) plays the role PETSc's
DMPlex/Section C code plays for the reference (SURVEY.md section 2b):
high-order GLL node numbering over unstructured meshes and structured
connectivity tables. If libmeshcore.so has not been built (run
`make -C native`), a pure-Python implementation with identical semantics
is used — tests assert both agree.
"""

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(root, "native", "libmeshcore.so")
    if not os.path.exists(path):
        # try building it (best effort; toolchain is available in-image)
        try:
            import subprocess

            subprocess.run(["make", "-C", os.path.join(root, "native")],
                           capture_output=True, timeout=120)
        except Exception:
            pass
    if os.path.exists(path):
        lib = ctypes.CDLL(path)
        lib.quad_highorder_numbering.restype = ctypes.c_int64
        lib.quad_highorder_numbering.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ]
        lib.box_cell2node_2d.restype = None
        lib.box_cell2node_2d.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ]
        _LIB = lib
    return _LIB


def have_native():
    return _load() is not None


def quad_highorder_numbering(cells, nverts, ngl, force_python=False):
    """GLL node numbering for a 2D quad mesh.

    cells: (ncells, 4) int corner ids in lexicographic corner order.
    Returns (cell2node (ncells, ngl*ngl) int64, n_nodes, edge_pairs
    (n_edges, 2)).
    """
    cells = np.ascontiguousarray(cells, dtype=np.int64)
    ncells = cells.shape[0]
    N = int(ngl)
    lib = None if force_python else _load()
    if lib is not None:
        c2n = np.empty((ncells, N * N), dtype=np.int64)
        pairs = np.empty((4 * ncells, 2), dtype=np.int64)
        n_edges = np.zeros(1, dtype=np.int64)
        total = lib.quad_highorder_numbering(
            ncells, int(nverts), cells, N, c2n, pairs, n_edges
        )
        if total < 0:
            raise ValueError("quad_highorder_numbering failed")
        return c2n, int(total), pairs[: int(n_edges[0])].copy()
    return _quad_numbering_py(cells, int(nverts), N)


def _quad_numbering_py(cells, nverts, N):
    """Pure-Python mirror of the native numbering."""
    ni = N - 2
    ncells = cells.shape[0]
    c2n = np.empty((ncells, N * N), dtype=np.int64)
    edge_ids = {}
    pairs = []
    locals_ = [
        (0, 1, 1, 0, 1, 0),
        (2, 3, 1, N - 1, 1, 0),
        (0, 2, 0, 1, 0, 1),
        (1, 3, N - 1, 1, 0, 1),
    ]
    for e in range(ncells):
        c = cells[e]
        out = c2n[e]
        out[0] = c[0]
        out[N - 1] = c[1]
        out[(N - 1) * N] = c[2]
        out[(N - 1) * N + N - 1] = c[3]
        for (ia, ib, lx0, ly0, dx, dy) in locals_:
            a, b = int(c[ia]), int(c[ib])
            lo, hi = (a, b) if a < b else (b, a)
            key = (lo, hi)
            eid = edge_ids.get(key)
            if eid is None:
                eid = len(pairs)
                edge_ids[key] = eid
                pairs.append(key)
            base = nverts + eid * ni
            forward = a == lo
            for k in range(ni):
                lx, ly = lx0 + k * dx, ly0 + k * dy
                g = base + k if forward else base + (ni - 1 - k)
                out[ly * N + lx] = g
        ibase = None  # interior filled below with a placeholder then rebased
        for ly in range(1, N - 1):
            for lx in range(1, N - 1):
                out[ly * N + lx] = -(e * ni * ni + (ly - 1) * ni + (lx - 1)) - 1
    interior0 = nverts + len(pairs) * ni
    neg = c2n < 0
    c2n[neg] = interior0 + (-c2n[neg] - 1)
    total = interior0 + ncells * ni * ni
    return c2n, int(total), np.asarray(pairs, dtype=np.int64).reshape(-1, 2)
