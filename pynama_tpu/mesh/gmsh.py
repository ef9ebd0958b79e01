"""Gmsh .msh reader (ASCII v2.2 and v4.1) for quad meshes.

Parity: the reference creates DMPlex meshes from Gmsh files
(/root/reference/src/domain/dmplex.py:22-23 createFromFile) and relies on
PETSc's parser. This is the framework-native equivalent: it extracts node
coordinates, 4-node quad connectivity (gmsh type 3) and boundary line
elements (type 1) grouped by physical name.
"""

from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np


@dataclass
class GmshData:
    points: np.ndarray                    # (nv, 2)
    quads: np.ndarray                     # (nc, 4) gmsh ccw corner order
    boundary_lines: Dict[str, np.ndarray] # name -> (nl, 2) corner pairs


def read_msh(path: str) -> GmshData:
    with open(path) as f:
        lines = [ln.strip() for ln in f]
    sections = {}
    i = 0
    while i < len(lines):
        ln = lines[i]
        if ln.startswith("$") and not ln.startswith("$End"):
            name = ln[1:]
            j = i + 1
            while j < len(lines) and not lines[j].startswith("$End"):
                j += 1
            sections[name] = lines[i + 1 : j]
            i = j + 1
        else:
            i += 1
    if "MeshFormat" not in sections:
        raise ValueError("not a Gmsh .msh file")
    version = float(sections["MeshFormat"][0].split()[0])

    phys = {}
    for ln in sections.get("PhysicalNames", [])[1:]:
        parts = ln.split(maxsplit=2)
        if len(parts) == 3:
            phys[int(parts[1])] = parts[2].strip().strip('"')

    if version < 4.0:
        return _read_v2(sections, phys)
    return _read_v4(sections, phys)


def _read_v2(sections, phys):
    node_lines = sections["Nodes"]
    n = int(node_lines[0])
    ids = np.empty(n, dtype=np.int64)
    pts = np.empty((n, 2))
    for k in range(n):
        parts = node_lines[1 + k].split()
        ids[k] = int(parts[0])
        pts[k] = [float(parts[1]), float(parts[2])]
    remap = {int(g): k for k, g in enumerate(ids)}

    elem_lines = sections["Elements"]
    ne = int(elem_lines[0])
    quads, blines = [], {}
    for k in range(ne):
        parts = [int(x) for x in elem_lines[1 + k].split()]
        etype, ntags = parts[1], parts[2]
        tags = parts[3 : 3 + ntags]
        nodes = parts[3 + ntags :]
        pname = phys.get(tags[0], str(tags[0])) if tags else "boundary"
        if etype == 3:  # 4-node quad
            quads.append([remap[v] for v in nodes])
        elif etype == 1:  # 2-node line
            blines.setdefault(pname, []).append([remap[v] for v in nodes])
    return GmshData(
        points=pts,
        quads=np.asarray(quads, dtype=np.int64),
        boundary_lines={k: np.asarray(v, dtype=np.int64)
                        for k, v in blines.items()},
    )


def _read_v4(sections, phys):
    # $Entities maps (dim, entityTag) -> physical tag
    ent_phys = {}
    ent = sections.get("Entities")
    if ent:
        np_, nc_, ns_, nv_ = (int(x) for x in ent[0].split())
        row = 1
        for dim, count, ncoord in ((0, np_, 3), (1, nc_, 6), (2, ns_, 6),
                                   (3, nv_, 6)):
            for _ in range(count):
                parts = ent[row].split()
                row += 1
                tag = int(parts[0])
                nphys = int(parts[1 + ncoord])
                if nphys > 0:
                    ent_phys[(dim, tag)] = int(parts[2 + ncoord])

    node_lines = sections["Nodes"]
    nblocks, ntotal = int(node_lines[0].split()[0]), int(node_lines[0].split()[1])
    pts = np.empty((ntotal, 2))
    remap = {}
    row, count = 1, 0
    for _ in range(nblocks):
        hdr = node_lines[row].split()
        row += 1
        nb = int(hdr[3])
        tags = [int(node_lines[row + k]) for k in range(nb)]
        row += nb
        for k in range(nb):
            parts = node_lines[row + k].split()
            pts[count] = [float(parts[0]), float(parts[1])]
            remap[tags[k]] = count
            count += 1
        row += nb

    elem_lines = sections["Elements"]
    nblocks = int(elem_lines[0].split()[0])
    quads, blines = [], {}
    row = 1
    for _ in range(nblocks):
        hdr = elem_lines[row].split()
        row += 1
        edim, etag, etype, nb = (int(x) for x in hdr)
        pname = phys.get(ent_phys.get((edim, etag)), None)
        for k in range(nb):
            parts = [int(x) for x in elem_lines[row + k].split()]
            nodes = parts[1:]
            if etype == 3:
                quads.append([remap[v] for v in nodes])
            elif etype == 1:
                blines.setdefault(pname or f"ent{etag}", []).append(
                    [remap[v] for v in nodes]
                )
        row += nb
    return GmshData(
        points=pts,
        quads=np.asarray(quads, dtype=np.int64),
        boundary_lines={k: np.asarray(v, dtype=np.int64)
                        for k, v in blines.items()},
    )
