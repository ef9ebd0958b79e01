"""On-TPU verification + microbench of the Pallas stencil kernels.

The pallas kernels only engage on the TPU backend (ops/pallas_stencil.py
pallas_ok), so the CPU-pinned pytest suite exercises them only through
the interpreter (tests/test_pallas_interpret.py) — this script runs on
the real chip and checks conv_blocked_pallas against the XLA tap-loop
path (PYNAMA_NO_PALLAS semantics) across 2D and 3D shapes, footprints
3/5, BOTH kernel variants (xc / flat) and dot precisions, then times the
variants at the production shapes (1.18M-dof cavity K apply, channel3d
K apply) so kernel-default changes are always measurement-backed.

Usage:  python scripts/verify_pallas_tpu.py [--no-bench]
Writes: run-artifacts/pallas_verify.json
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("PYNAMA_JAX_CACHE",
                                 "/tmp/pynama-jax-cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pynama_tpu.ops import pallas_stencil as ps
from pynama_tpu.ops.pallas_stencil import conv_blocked_pallas, pallas_ok


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

# production shapes: cavity 1.18M dofs (nelem 384^2, ngl 3, sb 4) K
# apply; channel3d 2.04M dofs (nelem 32x32x80, ngl 3, sb 2) K apply
BENCH_CASES = [
    ("cavity_K", (97, 97, 128), (3, 3, 128, 128)),
    ("channel3d_K", (41, 17, 17, 192), (3, 3, 3, 192, 192)),
]

# gates: HIGHEST must match the f32 reference to 1e-5; HIGH (bf16x3)
# may drift to ~1e-4 relative — both orders of magnitude below the
# tolerances the f32 stencil applies ever serve (kle.py solve_ir)
GATE = {"highest": 1e-5, "high": 1e-4}


def _set(variant, precision):
    os.environ["PYNAMA_STENCIL_KERNEL"] = variant
    os.environ["PYNAMA_STENCIL_PRECISION"] = precision
    ps._plan.cache_clear()


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    rng = np.random.default_rng(11)
    results = {}
    n_engaged = 0
    for name, xs, ws in CASES:
        xb = jnp.asarray(rng.normal(size=xs), jnp.float32)
        W = jnp.asarray(rng.normal(size=ws), jnp.float32)
        y_r = np.asarray(jax.jit(xla_ref)(xb, W))
        row = {}
        for variant in ("xc", "flat"):
            for precision in ("highest", "high"):
                _set(variant, precision)
                if not pallas_ok(xs, jnp.float32, ws):
                    row[f"{variant}_{precision}"] = {"engaged": False}
                    continue
                try:
                    y_p = np.asarray(jax.jit(
                        lambda xb, W: conv_blocked_pallas(xb, W))(xb, W))
                except NotImplementedError as e:
                    row[f"{variant}_{precision}"] = {"engaged": False,
                                                     "error": str(e)}
                    continue
                err = float(np.abs(y_p - y_r).max() / np.abs(y_r).max())
                row[f"{variant}_{precision}"] = {
                    "engaged": True, "rel_err": err,
                    "TR": ps._plan(xs, "float32", ws, variant)}
                assert err < GATE[precision], (name, variant, precision, err)
        if any(v.get("engaged") for v in row.values()):
            n_engaged += 1
        results[name] = row
        print(f"{name}: " + "  ".join(
            f"{k}={v.get('rel_err', 'off'):.2e}" if v.get("engaged")
            else f"{k}=off" for k, v in row.items()))

    bench = {}
    if "--no-bench" not in sys.argv:
        for name, xs, ws in BENCH_CASES:
            xb = jnp.asarray(rng.normal(size=xs), jnp.float32)
            W = jnp.asarray(rng.normal(size=ws), jnp.float32)
            row = {}
            for variant in ("xc", "flat"):
                for precision in ("highest", "high"):
                    _set(variant, precision)
                    if not pallas_ok(xs, jnp.float32, ws):
                        continue

                    def loop(xb, W=W):
                        def body(i, v):
                            return conv_blocked_pallas(v, W) * jnp.float32(
                                1e-3)
                        return jax.lax.fori_loop(0, 32, body, xb)

                    f = jax.jit(loop)
                    try:
                        jax.block_until_ready(f(xb))
                    except NotImplementedError:
                        continue
                    t0 = time.perf_counter()
                    jax.block_until_ready(f(xb))
                    per = (time.perf_counter() - t0) / 32 * 1e3
                    nbytes = (np.prod(xs) + np.prod(xs[:-1]) * ws[-1]) * 4
                    row[f"{variant}_{precision}"] = {
                        "ms": round(per, 4),
                        "gbps_eff": round(nbytes / per * 1e3 / 1e9, 1)}
                    print(f"bench {name} {variant}/{precision}: "
                          f"{per:.3f} ms "
                          f"({nbytes / per * 1e3 / 1e9:.0f} GB/s eff)")
            # XLA fallback for scale
            os.environ["PYNAMA_NO_PALLAS"] = "1"
            try:
                from pynama_tpu.ops.conv import conv_blocked

                def loop_x(xb, W=W):
                    def body(i, v):
                        return conv_blocked(
                            v, W, jax.lax.Precision.HIGHEST) * jnp.float32(
                                1e-3)
                    return jax.lax.fori_loop(0, 8, body, xb)

                f = jax.jit(loop_x)
                jax.block_until_ready(f(xb))
                t0 = time.perf_counter()
                jax.block_until_ready(f(xb))
                row["xla_highest"] = {
                    "ms": round((time.perf_counter() - t0) / 8 * 1e3, 4)}
                print(f"bench {name} xla/highest: {row['xla_highest']['ms']:.3f} ms")
            finally:
                os.environ.pop("PYNAMA_NO_PALLAS", None)
            bench[name] = row

    out = os.path.join(REPO, "run-artifacts", "pallas_verify.json")
    json.dump({"platform": "tpu", "results": results,
               "engaged_cases": n_engaged, "bench": bench},
              open(out, "w"), indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
