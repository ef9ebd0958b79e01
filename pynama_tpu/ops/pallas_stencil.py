"""Pallas TPU kernel for the blocked stencil contraction (ops/conv.py).

conv_blocked's XLA lowering materializes every tap's partial sum in HBM
(the accumulation chain exceeds VMEM at ~1M dofs), so the apply is HBM
bound several times over. This kernel tiles the leading block axis and
carries each row-stripe through ALL taps in VMEM.

The tap matmuls use a FLAT window: the padded stripe is stored as a 2D
((TR+2Q)*(B2+2Q)+2Q, C) scratch, so every tap is one CONTIGUOUS row
slice and one large 2D matmul (M = TR*(B2+2Q)) — a rank-3 window would
decompose into TR small batched matmuls and go latency-bound. The
junk columns a flat shift drags in land outside the [0, B2) output
column range and are cropped by the final slice; the column zero-pads
between rows isolate the taps exactly (zero-extension semantics,
matching conv_blocked's jnp.pad).

Scope: f32, 2D blocked tensors without leading batch dims, TPU backend,
channels >= 64 (the parity layout should super-block first). Everything
else falls back to the XLA path.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

_TR = 16  # stripe rows (leading block axis) per grid step

try:  # import guarded so CPU-only environments never touch pallas
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None


@lru_cache(maxsize=None)
def _backend_is_tpu():
    try:
        return pl is not None and jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def pallas_ok(xb_shape, dtype, w_shape):
    """Can the tiled flat-window VMEM kernel handle this apply?"""
    if not _backend_is_tpu():
        return False
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    dim = len(w_shape) - 2
    if dim != 2:
        return False
    if len(xb_shape) != dim + 1:  # no leading batch dims
        return False
    F = w_shape[0]
    if F not in (3, 5):
        return False
    c_in, c_out = w_shape[-2], w_shape[-1]
    if c_in < 64 or c_out < 64:
        return False

    def tiled(shape):  # VMEM bytes incl. (8, 128) tile padding, f32
        pad = list(shape)
        pad[-1] = -(-pad[-1] // 128) * 128
        if len(pad) >= 2:
            pad[-2] = -(-pad[-2] // 8) * 8
        return int(np.prod(pad)) * 4

    B2 = xb_shape[1]
    Q = (F - 1) // 2
    W2 = B2 + 2 * Q
    win = tiled(((_TR + 2 * Q) * W2 + 2 * Q, c_in))
    blocks = tiled((_TR, B2, c_in)) * 2 + tiled((Q, B2, c_in)) * 2
    acc = tiled((_TR * W2, c_out)) * 2 + tiled((_TR, B2, c_out)) * 2
    wb = tiled(w_shape)
    return win + blocks + acc + wb < 12 * 1024 * 1024


def _kernel(F, TR, B2, c_in, c_out, cur_ref, prev_ref, next_ref,
            w_ref, o_ref, xw_ref):
    Q = (F - 1) // 2
    W2 = B2 + 2 * Q
    M = TR * W2
    i = pl.program_id(0)
    n = pl.num_programs(0)

    xw_ref[...] = jnp.zeros(xw_ref.shape, xw_ref.dtype)
    for r in range(TR):
        off = (r + Q) * W2 + Q
        xw_ref[off:off + B2, :] = cur_ref[r]

    @pl.when(i > 0)
    def _():
        for r in range(Q):
            xw_ref[r * W2 + Q:r * W2 + Q + B2, :] = prev_ref[r]

    @pl.when(i < n - 1)
    def _():
        for r in range(Q):
            off = (TR + Q + r) * W2 + Q
            xw_ref[off:off + B2, :] = next_ref[r]

    acc = None
    for q1 in range(F):
        for q2 in range(F):
            off = q1 * W2 + q2
            v = jnp.dot(
                xw_ref[off:off + M, :], w_ref[q1, q2],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            acc = v if acc is None else acc + v
    o_ref[...] = acc.reshape(TR, W2, c_out)[:, 0:B2, :]


def conv_blocked_pallas(xb, W):
    """y[b] = sum_q x[b + q - Q] @ W[q], zero-extended, row-tiled VMEM."""
    F = W.shape[0]
    Q = (F - 1) // 2
    c_in, c_out = W.shape[-2], W.shape[-1]
    B1, B2 = xb.shape[0], xb.shape[1]
    TR = _TR
    B1p = -(-B1 // TR) * TR
    if B1p != B1:
        xb = jnp.pad(xb, ((0, B1p - B1), (0, 0), (0, 0)))
    n_tiles = B1p // TR
    W2 = B2 + 2 * Q
    NF = (TR + 2 * Q) * W2 + 2 * Q

    def _i32(v):
        return jnp.asarray(v, jnp.int32)

    # edge blocks are Q rows; their index maps are in Q-row block units
    def im_cur(i):
        return (_i32(i), _i32(0), _i32(0))

    def im_prev(i):
        return (_i32(jnp.maximum(i * (TR // Q) - 1, 0)), _i32(0), _i32(0))

    def im_next(i):
        return (_i32(jnp.minimum(i * (TR // Q) + TR // Q,
                                 B1p // Q - 1)), _i32(0), _i32(0))

    kern = partial(_kernel, F, TR, B2, c_in, c_out)
    out = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TR, B2, c_in), im_cur, memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, B2, c_in), im_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, B2, c_in), im_next, memory_space=pltpu.VMEM),
            pl.BlockSpec(W.shape, lambda i: (_i32(0),) * 4,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, B2, c_out), im_cur,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B1p, B2, c_out), xb.dtype),
        scratch_shapes=[pltpu.VMEM((NF, c_in), jnp.float32)],
    )(xb, xb, xb, jnp.asarray(W, dtype=xb.dtype))
    if B1p != B1:
        out = out[:B1]
    return out
