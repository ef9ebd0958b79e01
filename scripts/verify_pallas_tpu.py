"""On-TPU verification of the Pallas flat-window stencil kernels.

The pallas kernels only engage on the TPU backend (ops/pallas_stencil.py
pallas_ok), so the CPU-pinned pytest suite cannot exercise them — this
script runs on the real chip and checks conv_blocked_pallas against the
XLA tap-loop path (PYNAMA_NO_PALLAS semantics) across 2D and 3D shapes,
including non-multiple-of-TR leading axes and both footprints.

Usage:  python scripts/verify_pallas_tpu.py
Writes: run-artifacts/pallas_verify.json
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from pynama_tpu.ops.pallas_stencil import (conv_blocked_pallas, pallas_ok,
                                           _plan)


def xla_ref(xb, W):
    """The XLA tap-loop path (ops/conv.py conv_blocked fallback)."""
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
        out = out + jnp.matmul(g[sl], W[q],
                               precision=jax.lax.Precision.HIGHEST)
    return out


CASES = [
    # (name, blocked shape, kernel shape)
    ("2d_f3", (40, 24, 128), (3, 3, 128, 128)),
    ("2d_f5", (33, 17, 96), (5, 5, 96, 96)),
    ("2d_rect", (52, 9, 128), (3, 3, 128, 64)),
    ("3d_f3", (14, 14, 33, 192), (3, 3, 3, 192, 192)),
    ("3d_small", (7, 9, 11, 81), (3, 3, 3, 81, 81)),
    ("3d_f5", (10, 8, 12, 96), (5, 5, 5, 96, 96)),
    ("3d_rect_out", (12, 10, 20, 192), (3, 3, 3, 192, 64)),
]


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    rng = np.random.default_rng(11)
    results = {}
    for name, xs, ws in CASES:
        xb = jnp.asarray(rng.normal(size=xs), jnp.float32)
        W = jnp.asarray(rng.normal(size=ws), jnp.float32)
        ok = pallas_ok(xs, jnp.float32, ws)
        if not ok:
            results[name] = {"engaged": False,
                             "plan": _plan(xs, "float32", ws)}
            print(f"{name}: pallas_ok=False (fallback)")
            continue
        y_p = np.asarray(jax.jit(conv_blocked_pallas)(xb, W))
        y_r = np.asarray(jax.jit(xla_ref)(xb, W))
        err = float(np.abs(y_p - y_r).max() / np.abs(y_r).max())
        results[name] = {"engaged": True, "rel_err": err,
                         "plan_TR": _plan(xs, "float32", ws)}
        print(f"{name}: TR={_plan(xs, 'float32', ws)} rel_err={err:.3e}")
        assert err < 1e-5, (name, err)
    out = os.path.join(REPO, "run-artifacts", "pallas_verify.json")
    json.dump({"platform": "tpu", "results": results},
              open(out, "w"), indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
