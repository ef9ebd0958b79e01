"""Allocation introspection: what a problem keeps on device (and host).

The analogue of the reference's printMatsInfo nnz/bytes report
(/root/reference/src/matrices/mat_generator.py:120-130) for the
matrix-free design: instead of assembled AIJ matrices, the dominant
allocations are conv stencil kernels, multigrid level operators/patch
kernels, coarse dense inverses, masks and weight vectors. The walker
follows pynama_tpu-owned objects (dataclasses, pytrees, containers) and
records every jax/numpy array with its attribute path.
"""

from dataclasses import fields, is_dataclass

import jax
import numpy as np


def _is_ours(obj):
    return type(obj).__module__.startswith("pynama_tpu")


def collect_arrays(obj, name="", _seen=None, _depth=0):
    """[(path, shape, dtype, nbytes, device?)] for all reachable arrays."""
    out = []
    if _seen is None:
        _seen = set()
    if _depth > 8 or id(obj) in _seen:
        return out
    if isinstance(obj, jax.Array):
        out.append((name, tuple(obj.shape), str(obj.dtype),
                    obj.size * obj.dtype.itemsize, True))
        return out
    if isinstance(obj, np.ndarray):
        out.append((name, tuple(obj.shape), str(obj.dtype),
                    obj.nbytes, False))
        return out
    if isinstance(obj, (list, tuple)):
        _seen.add(id(obj))
        for i, v in enumerate(obj):
            out += collect_arrays(v, f"{name}[{i}]", _seen, _depth + 1)
        return out
    if isinstance(obj, dict):
        _seen.add(id(obj))
        for k, v in obj.items():
            out += collect_arrays(v, f"{name}[{k!r}]", _seen, _depth + 1)
        return out
    if is_dataclass(obj) and not isinstance(obj, type):
        _seen.add(id(obj))
        for f in fields(obj):
            out += collect_arrays(getattr(obj, f.name, None),
                                  f"{name}.{f.name}", _seen, _depth + 1)
        # lazily-cached attrs live outside the dataclass fields
        extra = set(vars(obj)) - {f.name for f in fields(obj)}
        for k in sorted(extra):
            out += collect_arrays(vars(obj)[k], f"{name}.{k}",
                                  _seen, _depth + 1)
        return out
    if _is_ours(obj) and hasattr(obj, "__dict__"):
        _seen.add(id(obj))
        for k, v in sorted(vars(obj).items()):
            out += collect_arrays(v, f"{name}.{k}", _seen, _depth + 1)
        return out
    return out


def device_report(problem, top=40):
    """Human-readable allocation report for a set-up problem.

    Lists the `top` largest arrays (path, shape, dtype, MB, device/host)
    plus aggregate totals — run in the bench tail so every recorded
    benchmark documents its memory footprint.
    """
    rows = collect_arrays(problem, problem.__class__.__name__)
    rows.sort(key=lambda r: -r[3])
    dev = sum(r[3] for r in rows if r[4])
    host = sum(r[3] for r in rows if not r[4])
    lines = [f"allocation report: {len(rows)} arrays, "
             f"device {dev / 1e6:.1f} MB, host {host / 1e6:.1f} MB"]
    for path, shape, dtype, nbytes, on_dev in rows[:top]:
        where = "dev " if on_dev else "host"
        lines.append(f"  {nbytes / 1e6:9.2f} MB  {where}  {dtype:<8s} "
                     f"{str(shape):<24s} {path}")
    rest = rows[top:]
    if rest:
        lines.append(f"  ... {len(rest)} smaller arrays, "
                     f"{sum(r[3] for r in rest) / 1e6:.1f} MB total")
    return "\n".join(lines)
