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

Scope: f32, 2D/3D blocked tensors without leading batch dims, TPU
backend, channels >= 64 (the parity layout should super-block first).
Everything else falls back to the XLA path.

3D uses the same flat-window trick one axis deeper: the (B2, B3) planes
of a leading-axis stripe are stored row-major into one 2D scratch with
W2 = B2+2Q, W3 = B3+2Q padded pitches, so tap (q1, q2, q3) is the
contiguous row slice starting at (q1*W2 + q2)*W3 + q3 and the 27 taps
are 27 large 2D matmuls. The stripe height TR is planned against the
VMEM budget per shape (the 2D kernel's fixed 16 can exceed VMEM at 3D
channel counts).
"""

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

_TR = 16  # stripe rows (leading block axis) per grid step

# In-kernel dot precision (f32 operands). Measured on-chip
# (scripts/stencil_breakdown_tpu.py, cavity K shape): HIGHEST 0.239 ms,
# DEFAULT (single-pass bf16, too lossy for the operator) 0.160 ms — the
# kernel is fill/copy-bound, not MXU-bound, so cheaper dot passes buy
# <1.5x and HIGHEST stays the default. Mosaic's dot lowering rejects
# Precision.HIGH (bf16x3), so "high" maps to HIGHEST here (the XLA
# fallback path still honors true HIGH).
_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGHEST,
    "highest": jax.lax.Precision.HIGHEST,
}


def _dot_precision():
    return _PRECISIONS[os.environ.get("PYNAMA_STENCIL_PRECISION", "highest")]


def _variant():
    """Kernel variant: 'xc' folds innermost-axis taps into channels
    (F aligned matmuls in 2D, F^2 in 3D); 'flat' is the round-3/4
    flat-window kernel (F^dim misaligned matmuls), kept for A/B
    measurement via PYNAMA_STENCIL_KERNEL=flat."""
    return os.environ.get("PYNAMA_STENCIL_KERNEL", "xc")

try:  # import guarded so CPU-only environments never touch pallas
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None


def _interpret():
    """Run the kernels in Pallas interpret mode (CPU correctness tests)."""
    return os.environ.get("PYNAMA_PALLAS_INTERPRET", "0") == "1"


@lru_cache(maxsize=None)
def _backend_is_tpu():
    try:
        if pl is not None and _interpret():
            return True
        return pl is not None and jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _tiled(shape):  # VMEM bytes incl. (8, 128) tile padding, f32
    pad = list(shape)
    pad[-1] = -(-pad[-1] // 128) * 128
    if len(pad) >= 2:
        pad[-2] = -(-pad[-2] // 8) * 8
    return int(np.prod(pad)) * 4


_VMEM_BUDGET = 12 * 1024 * 1024


@lru_cache(maxsize=None)
def _plan(xb_shape, dtype, w_shape, variant="xc"):
    """Stripe height TR for the stencil kernel, or None (fallback)."""
    if not _backend_is_tpu():
        return None
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return None
    dim = len(w_shape) - 2
    if dim not in (2, 3):
        return None
    if len(xb_shape) != dim + 1:  # no leading batch dims
        return None
    F = w_shape[0]
    if F not in (3, 5):
        return None
    c_in, c_out = w_shape[-2], w_shape[-1]
    if c_in < 64 or c_out < 64:
        return None
    Q = (F - 1) // 2
    wb = _tiled(w_shape)
    if dim == 2:
        B2 = xb_shape[1]
        W2 = B2 + 2 * Q
        for TR in (16, 8, 4, 2, 1):
            if TR % Q != 0:
                continue
            blocks = _tiled((TR, B2, c_in)) * 2 + _tiled((Q, B2, c_in)) * 2
            if variant == "xc":
                B2p = -(-B2 // 8) * 8
                win = _tiled((TR + 2 * Q, B2p, F * c_in))
                acc = (_tiled((TR * B2p, c_out)) * 2
                       + _tiled((TR, B2, c_out)) * 2)
            else:
                win = _tiled(((TR + 2 * Q) * W2 + 2 * Q, c_in))
                acc = (_tiled((TR * W2, c_out)) * 2
                       + _tiled((TR, B2, c_out)) * 2)
            if win + blocks + acc + wb < _VMEM_BUDGET:
                return TR
        return None
    # 3D: pick the largest stripe height that fits VMEM (the per-stripe
    # working set scales with the full (B2, B3) plane). The 3D kernels
    # raise Mosaic's scoped limit to 64 MB; budget the ESTIMATE at 24 MB
    # (double-buffering and scheduler temporaries run the true footprint
    # to ~2x the sum below).
    B2, B3 = xb_shape[1], xb_shape[2]
    W2, W3 = B2 + 2 * Q, B3 + 2 * Q
    for TR in (16, 8, 4, 2, 1):
        if TR % Q != 0:
            continue
        blocks = (_tiled((TR, B2, B3, c_in)) * 2
                  + _tiled((Q, B2, B3, c_in)) * 2)
        if variant == "xc":
            B3p = -(-B3 // 8) * 8
            M = TR * W2 * B3p
            win = _tiled(((TR + 2 * Q) * W2 + 2 * Q, B3p, F * c_in))
            acc = _tiled((M, c_out)) * 2 + _tiled((TR, B2, B3, c_out))
        else:
            NF3 = (TR + 2 * Q) * W2 * W3 + 2 * Q * W3 + 2 * Q
            M = TR * W2 * W3
            win = _tiled((NF3, c_in))
            acc = _tiled((M, c_out)) * 2 + _tiled((TR, B2, B3, c_out))
        if win + blocks + acc + wb < 24 * 1024 * 1024:
            return TR
    return None


def pallas_ok(xb_shape, dtype, w_shape):
    """Can the tiled VMEM stencil kernel handle this apply?"""
    return _plan(tuple(xb_shape), jnp.dtype(dtype).name,
                 tuple(w_shape), _variant()) is not None


def _sup(n):  # round up to the f32 sublane tile
    return -(-n // 8) * 8


def _kernel_xc(F, TR, B2, c_in, c_out, prec, cur_ref, prev_ref, next_ref,
               w_ref, o_ref, xc_ref):
    """2D stencil, axis-2 taps folded into channels.

    xc[r, j, q2*C:(q2+1)*C] = x[r - Q, j + q2 - Q] (stripe-local rows,
    zero-extended), so tap q1 is the CONTIGUOUS leading-axis slice
    [q1, q1+TR) and the apply is F large ALIGNED matmuls
    (TR*B2p, F*C) @ (F*C, c_out) — vs the flat-window kernel's F^2
    sublane-misaligned ones. The scratch row pitch B2p is padded to the
    f32 sublane tile so the (TR, B2p, FC) -> (TR*B2p, FC) collapse is a
    layout no-op (collapsing into an unaligned sublane extent forces a
    Mosaic relayout copy). w_ref: (F, F*c_in, c_out), w_ref[q1] rows
    stacked in q2 order.
    """
    Q = (F - 1) // 2
    B2p = _sup(B2)
    i = pl.program_id(0)
    n = pl.num_programs(0)

    xc_ref[...] = jnp.zeros(xc_ref.shape, xc_ref.dtype)
    for q2 in range(F):
        sh = q2 - Q
        dst = slice(max(0, -sh), B2 - max(0, sh))
        src = slice(max(0, sh), B2 - max(0, -sh))
        ch = slice(q2 * c_in, (q2 + 1) * c_in)
        xc_ref[Q:Q + TR, dst, ch] = cur_ref[:, src, :]

        @pl.when(i > 0)
        def _(dst=dst, src=src, ch=ch):
            xc_ref[0:Q, dst, ch] = prev_ref[:, src, :]

        @pl.when(i < n - 1)
        def _(dst=dst, src=src, ch=ch):
            xc_ref[Q + TR:2 * Q + TR, dst, ch] = next_ref[:, src, :]

    acc = None
    for q1 in range(F):
        v = jnp.dot(
            xc_ref[q1:q1 + TR].reshape(TR * B2p, F * c_in), w_ref[q1],
            preferred_element_type=jnp.float32, precision=prec,
        )
        acc = v if acc is None else acc + v
    o_ref[...] = acc.reshape(TR, B2p, c_out)[:, 0:B2, :]


def _kernel3d_xc(F, TR, B2, B3, c_in, c_out, prec, cur_ref, prev_ref,
                 next_ref, w_ref, o_ref, xc_ref, acc_ref):
    """3D stencil: axis-3 taps folded into channels, (r, b2) flat rows.

    xc row (r*W2 + b2 + Q) holds x[r - Q, b2, :] with the F axis-3 shifts
    concatenated along channels; tap (q1, q2) is the contiguous row slice
    starting at q1*W2 + q2 (junk b2 columns outside [0, B2) cropped by
    the output slice) — F^2 ALIGNED matmuls of (TR*W2*B3p, F*C) vs the
    flat kernel's F^3 misaligned ones, and (TR+2Q)*F fill copies vs its
    (TR+2Q)*B2. B3p pads the sublane pitch so the row collapse is a
    layout no-op (see _kernel_xc). w_ref: (F, F, F*c_in, c_out).
    """
    Q = (F - 1) // 2
    W2 = B2 + 2 * Q
    B3p = _sup(B3)
    M = TR * W2 * B3p
    i = pl.program_id(0)
    n = pl.num_programs(0)

    xc_ref[...] = jnp.zeros(xc_ref.shape, xc_ref.dtype)
    for q3 in range(F):
        sh = q3 - Q
        dst = slice(max(0, -sh), B3 - max(0, sh))
        src = slice(max(0, sh), B3 - max(0, -sh))
        ch = slice(q3 * c_in, (q3 + 1) * c_in)
        for r in range(TR):
            off = (r + Q) * W2 + Q
            xc_ref[off:off + B2, dst, ch] = cur_ref[r, :, src, :]

        @pl.when(i > 0)
        def _(dst=dst, src=src, ch=ch):
            for r in range(Q):
                off = r * W2 + Q
                xc_ref[off:off + B2, dst, ch] = prev_ref[r, :, src, :]

        @pl.when(i < n - 1)
        def _(dst=dst, src=src, ch=ch):
            for r in range(Q):
                off = (TR + Q + r) * W2 + Q
                xc_ref[off:off + B2, dst, ch] = next_ref[r, :, src, :]

    first = True
    for q1 in range(F):
        for q2 in range(F):
            off = q1 * W2 + q2
            v = jnp.dot(
                xc_ref[off:off + TR * W2].reshape(M, F * c_in),
                w_ref[q1, q2],
                preferred_element_type=jnp.float32, precision=prec,
            )
            acc_ref[...] = v if first else acc_ref[...] + v
            first = False
    o_ref[...] = acc_ref[...].reshape(TR, W2, B3p, c_out)[:, 0:B2, 0:B3, :]


def _kernel(F, TR, B2, c_in, c_out, prec, cur_ref, prev_ref, next_ref,
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
                precision=prec,
            )
            acc = v if acc is None else acc + v
    o_ref[...] = acc.reshape(TR, W2, c_out)[:, 0:B2, :]


def _kernel3d(F, TR, B2, B3, c_in, c_out, prec, cur_ref, prev_ref, next_ref,
              w_ref, o_ref, xw_ref, acc_ref):
    Q = (F - 1) // 2
    W2, W3 = B2 + 2 * Q, B3 + 2 * Q
    M = TR * W2 * W3
    i = pl.program_id(0)
    n = pl.num_programs(0)

    xw_ref[...] = jnp.zeros(xw_ref.shape, xw_ref.dtype)
    for r in range(TR):
        for i2 in range(B2):
            off = ((r + Q) * W2 + (i2 + Q)) * W3 + Q
            xw_ref[off:off + B3, :] = cur_ref[r, i2]

    @pl.when(i > 0)
    def _():
        for r in range(Q):
            for i2 in range(B2):
                off = (r * W2 + (i2 + Q)) * W3 + Q
                xw_ref[off:off + B3, :] = prev_ref[r, i2]

    @pl.when(i < n - 1)
    def _():
        for r in range(Q):
            for i2 in range(B2):
                off = ((TR + Q + r) * W2 + (i2 + Q)) * W3 + Q
                xw_ref[off:off + B3, :] = next_ref[r, i2]

    # accumulate through a VMEM scratch: a pure value chain lets the
    # scheduler keep all F^3 (M, c_out) dot temporaries alive at once
    # (observed: 38 MB scoped VMEM at F=3), the ref write serializes them
    first = True
    for q1 in range(F):
        for q2 in range(F):
            for q3 in range(F):
                off = (q1 * W2 + q2) * W3 + q3
                v = jnp.dot(
                    xw_ref[off:off + M, :], w_ref[q1, q2, q3],
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )
                acc_ref[...] = v if first else acc_ref[...] + v
                first = False
    o_ref[...] = acc_ref[...].reshape(TR, W2, W3, c_out)[:, 0:B2, 0:B3, :]


def _conv3d_pallas(xb, W, TR, variant):
    """3D stencil kernel: leading-axis stripes over (B2, B3) planes."""
    F = W.shape[0]
    Q = (F - 1) // 2
    c_in, c_out = W.shape[-2], W.shape[-1]
    B1, B2, B3 = xb.shape[0], xb.shape[1], xb.shape[2]
    B1p = -(-B1 // TR) * TR
    if B1p != B1:
        xb = jnp.pad(xb, ((0, B1p - B1), (0, 0), (0, 0), (0, 0)))
    n_tiles = B1p // TR
    W2, W3 = B2 + 2 * Q, B3 + 2 * Q

    def _i32(v):
        return jnp.asarray(v, jnp.int32)

    def im_cur(i):
        return (_i32(i), _i32(0), _i32(0), _i32(0))

    def im_prev(i):
        return (_i32(jnp.maximum(i * (TR // Q) - 1, 0)), _i32(0), _i32(0),
                _i32(0))

    def im_next(i):
        return (_i32(jnp.minimum(i * (TR // Q) + TR // Q,
                                 B1p // Q - 1)), _i32(0), _i32(0), _i32(0))

    prec = _dot_precision()
    Wd = jnp.asarray(W, dtype=xb.dtype)
    if variant == "xc":
        B3p = -(-B3 // 8) * 8
        kern = partial(_kernel3d_xc, F, TR, B2, B3, c_in, c_out, prec)
        # (F, F, F*c_in, c_out): q3 folded into kernel rows
        Wd = Wd.reshape(F, F, F * c_in, c_out)
        w_spec = pl.BlockSpec((F, F, F * c_in, c_out),
                              lambda i: (_i32(0),) * 4,
                              memory_space=pltpu.VMEM)
        scratch = [
            pltpu.VMEM(((TR + 2 * Q) * W2 + 2 * Q, B3p, F * c_in),
                       jnp.float32),
            pltpu.VMEM((TR * W2 * B3p, c_out), jnp.float32),
        ]
    else:
        NF3 = (TR + 2 * Q) * W2 * W3 + 2 * Q * W3 + 2 * Q
        kern = partial(_kernel3d, F, TR, B2, B3, c_in, c_out, prec)
        w_spec = pl.BlockSpec(W.shape, lambda i: (_i32(0),) * 5,
                              memory_space=pltpu.VMEM)
        scratch = [
            pltpu.VMEM((NF3, c_in), jnp.float32),
            pltpu.VMEM((TR * W2 * W3, c_out), jnp.float32),
        ]
    out = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TR, B2, B3, c_in), im_cur,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, B2, B3, c_in), im_prev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, B2, B3, c_in), im_next,
                         memory_space=pltpu.VMEM),
            w_spec,
        ],
        out_specs=pl.BlockSpec((TR, B2, B3, c_out), im_cur,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B1p, B2, B3, c_out), xb.dtype),
        scratch_shapes=scratch,
        # the 3D working set (window scratch + double-buffered plane
        # blocks + folded kernel) legitimately exceeds Mosaic's 16 MB
        # default scoped budget at production channel counts
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(xb, xb, xb, Wd)
    if B1p != B1:
        out = out[:B1]
    return out


def conv_blocked_pallas(xb, W):
    """y[b] = sum_q x[b + q - Q] @ W[q], zero-extended, row-tiled VMEM."""
    F = W.shape[0]
    Q = (F - 1) // 2
    c_in, c_out = W.shape[-2], W.shape[-1]
    variant = _variant()
    TR = _plan(tuple(xb.shape), jnp.dtype(xb.dtype).name,
               tuple(W.shape), variant)
    if W.ndim - 2 == 3:
        return _conv3d_pallas(xb, W, TR, variant)
    B1, B2 = xb.shape[0], xb.shape[1]
    B1p = -(-B1 // TR) * TR
    if B1p != B1:
        xb = jnp.pad(xb, ((0, B1p - B1), (0, 0), (0, 0)))
    n_tiles = B1p // TR
    W2 = B2 + 2 * Q

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

    prec = _dot_precision()
    Wd = jnp.asarray(W, dtype=xb.dtype)
    if variant == "xc":
        kern = partial(_kernel_xc, F, TR, B2, c_in, c_out, prec)
        Wd = Wd.reshape(F, F * c_in, c_out)  # q2 folded into kernel rows
        w_spec = pl.BlockSpec((F, F * c_in, c_out),
                              lambda i: (_i32(0),) * 3,
                              memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((TR + 2 * Q, -(-B2 // 8) * 8, F * c_in),
                              jnp.float32)]
    else:
        NF = (TR + 2 * Q) * W2 + 2 * Q
        kern = partial(_kernel, F, TR, B2, c_in, c_out, prec)
        w_spec = pl.BlockSpec(W.shape, lambda i: (_i32(0),) * 4,
                              memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((NF, c_in), jnp.float32)]
    out = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TR, B2, c_in), im_cur, memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, B2, c_in), im_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, B2, c_in), im_next, memory_space=pltpu.VMEM),
            w_spec,
        ],
        out_specs=pl.BlockSpec((TR, B2, c_out), im_cur,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B1p, B2, c_out), xb.dtype),
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(xb, xb, xb, Wd)
    if B1p != B1:
        out = out[:B1]
    return out
