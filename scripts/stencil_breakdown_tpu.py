"""Isolate the cost components of the Pallas stencil kernel on the TPU.

At the production cavity shape the K apply measures ~1.1 ms while the
FLOP/byte roofline says ~0.3 ms; this experiment times stripped-down
kernels — fill-only (memset + shifted copies, no matmuls), matmul-only
(no window fill, dots on the raw block), and the full kernel at both
dot precisions — plus a same-FLOPs dense GEMM for MXU calibration.

Usage: python scripts/stencil_breakdown_tpu.py [TR]
"""

import os
import sys
import time
from functools import partial

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/pynama-jax-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B1, B2, C = 97, 97, 128
F, Q = 3, 1
TR = int(sys.argv[1]) if len(sys.argv) > 1 else 16
B2p = -(-B2 // 8) * 8


def timed(name, fn, *args, n=64):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(4):
        out = f(*args)
    jax.block_until_ready(out)
    per = (time.perf_counter() - t0) / 4 / n * 1e3
    print(f"{name:<34s} {per:8.4f} ms")
    return per


def loop(body1, x, n=64):
    def body(i, v):
        return body1(v) * jnp.float32(1.0)
    return jax.lax.fori_loop(0, n, body, x)


def make_pallas(mode, prec):
    def kern(cur_ref, prev_ref, next_ref, w_ref, o_ref, xc_ref):
        i = pl.program_id(0)
        nprog = pl.num_programs(0)
        if mode in ("fill", "full"):
            xc_ref[...] = jnp.zeros(xc_ref.shape, xc_ref.dtype)
            for q2 in range(F):
                sh = q2 - Q
                dst = slice(max(0, -sh), B2 - max(0, sh))
                src = slice(max(0, sh), B2 - max(0, -sh))
                ch = slice(q2 * C, (q2 + 1) * C)
                xc_ref[Q:Q + TR, dst, ch] = cur_ref[:, src, :]

                @pl.when(i > 0)
                def _(dst=dst, src=src, ch=ch):
                    xc_ref[0:Q, dst, ch] = prev_ref[:, src, :]

                @pl.when(i < nprog - 1)
                def _(dst=dst, src=src, ch=ch):
                    xc_ref[Q + TR:2 * Q + TR, dst, ch] = next_ref[:, src, :]

        if mode == "fill":
            o_ref[...] = xc_ref[Q:Q + TR, 0:B2, 0:C]
            return
        if mode == "mm":
            # matmuls straight off the cur block (wrong result, right cost)
            acc = None
            for q1 in range(F):
                v = jnp.dot(
                    cur_ref[...].reshape(TR * B2, C),
                    w_ref[q1][:C], preferred_element_type=jnp.float32,
                    precision=prec)
                acc = v if acc is None else acc + v
                v = jnp.dot(
                    cur_ref[...].reshape(TR * B2, C),
                    w_ref[q1][C:2 * C], preferred_element_type=jnp.float32,
                    precision=prec)
                acc = acc + v
                v = jnp.dot(
                    cur_ref[...].reshape(TR * B2, C),
                    w_ref[q1][2 * C:], preferred_element_type=jnp.float32,
                    precision=prec)
                acc = acc + v
            o_ref[...] = acc.reshape(TR, B2, C)
            return
        acc = None
        for q1 in range(F):
            v = jnp.dot(
                xc_ref[q1:q1 + TR].reshape(TR * B2p, F * C), w_ref[q1],
                preferred_element_type=jnp.float32, precision=prec)
            acc = v if acc is None else acc + v
        o_ref[...] = acc.reshape(TR, B2p, C)[:, 0:B2, :]

    def apply(xb, W):
        B1p = -(-B1 // TR) * TR
        xbp = jnp.pad(xb, ((0, B1p - B1), (0, 0), (0, 0)))
        n_tiles = B1p // TR

        def _i32(v):
            return jnp.asarray(v, jnp.int32)

        out = pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((TR, B2, C), lambda i: (_i32(i), _i32(0),
                                                     _i32(0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Q, B2, C),
                             lambda i: (_i32(jnp.maximum(i * (TR // Q) - 1,
                                                         0)),
                                        _i32(0), _i32(0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Q, B2, C),
                             lambda i: (_i32(jnp.minimum(
                                 i * (TR // Q) + TR // Q,
                                 B1p // Q - 1)), _i32(0), _i32(0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((F, F * C, C), lambda i: (_i32(0),) * 3,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TR, B2, C),
                                   lambda i: (_i32(i), _i32(0), _i32(0)),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B1p, B2, C), xb.dtype),
            scratch_shapes=[pltpu.VMEM((TR + 2 * Q, B2p, F * C),
                                       jnp.float32)],
        )(xbp, xbp, xbp, W)
        return out[:B1]

    return apply


def main():
    assert jax.devices()[0].platform == "tpu"
    rng = np.random.default_rng(3)
    xb = jnp.asarray(rng.normal(size=(B1, B2, C)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(F, F * C, C)), jnp.float32)
    HI = jax.lax.Precision.HIGHEST
    DE = jax.lax.Precision.DEFAULT

    print(f"shape ({B1},{B2},{C}) TR={TR}")
    for name, mode, prec in [("full/highest", "full", HI),
                             ("full/default", "full", DE),
                             ("fill-only", "fill", HI),
                             ("mm-only/highest", "mm", HI),
                             ("mm-only/default", "mm", DE)]:
        ap = make_pallas(mode, prec)
        timed(name, lambda x, W=W, ap=ap: loop(lambda v: ap(v, W), x), xb)

    # MXU calibration: one dense GEMM with the same total FLOPs
    M = B1 * B2
    A = jnp.asarray(rng.normal(size=(M, F * C)), jnp.float32)
    Wd = jnp.asarray(rng.normal(size=(F * C, C)), jnp.float32)
    for name, prec in [("dense gemm x3/highest", HI),
                       ("dense gemm x3/default", DE)]:
        def g(a, Wd=Wd, prec=prec):
            def body(i, v):
                o = (jnp.dot(v, Wd, precision=prec,
                             preferred_element_type=jnp.float32)
                     @ Wd.T.astype(jnp.float32))
                return o * jnp.float32(1.0)
            return jax.lax.fori_loop(0, 96, body, a)  # 96 ~= 64 * 1.5
        timed(name, g, A, n=96)

    # HBM bandwidth calibration: pure copy of the tensor
    def cp(x):
        def body(i, v):
            return v * jnp.float32(1.000001)
        return jax.lax.fori_loop(0, 64, body, x)
    timed("elementwise scale (HBM r+w)", cp, xb)

    # the PRODUCTION path at the same shape, same harness
    from pynama_tpu.ops.pallas_stencil import conv_blocked_pallas

    W4 = jnp.asarray(rng.normal(size=(F, F, C, C)), jnp.float32)
    for variant in ("xc", "flat"):
        os.environ["PYNAMA_STENCIL_KERNEL"] = variant
        timed(f"production conv_blocked [{variant}]",
              lambda x, W4=W4: loop(
                  lambda v: conv_blocked_pallas(v, W4), x), xb)
    os.environ.pop("PYNAMA_STENCIL_KERNEL", None)


if __name__ == "__main__":
    main()
