"""CPU correctness tests for the Pallas stencil kernels (interpret mode).

The kernels only engage on the TPU backend; PYNAMA_PALLAS_INTERPRET=1
runs them through the Pallas interpreter so the index bookkeeping (stripe
tiling, edge blocks, zero-extension, tap folding, pitch padding) is
testable in the CPU suite. On-chip behavior (tiling/alignment/VMEM) is
verified separately by scripts/verify_pallas_tpu.py.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pynama_tpu.ops import pallas_stencil as ps  # noqa: E402


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
    # (blocked shape, kernel shape) — leading axes off the TR multiples,
    # sublane-unaligned B2/B3, rectangular c_in != c_out
    ((21, 13, 64), (3, 3, 64, 64)),
    ((17, 9, 64), (5, 5, 64, 64)),
    ((33, 11, 64), (3, 3, 64, 128)),
    ((7, 5, 9, 64), (3, 3, 3, 64, 64)),
    ((6, 4, 11, 64), (3, 3, 3, 64, 128)),
]


@pytest.fixture(autouse=True)
def _interpret_env(monkeypatch):
    monkeypatch.setenv("PYNAMA_PALLAS_INTERPRET", "1")
    ps._backend_is_tpu.cache_clear()
    ps._plan.cache_clear()
    yield
    ps._backend_is_tpu.cache_clear()
    ps._plan.cache_clear()


@pytest.mark.parametrize("variant", ["xc", "flat"])
@pytest.mark.parametrize("case", CASES, ids=lambda c: "x".join(map(str, c[0])))
def test_kernel_matches_xla_taps(monkeypatch, variant, case):
    if ps.pl is None:
        pytest.skip("pallas unavailable")
    monkeypatch.setenv("PYNAMA_STENCIL_KERNEL", variant)
    xs, ws = case
    rng = np.random.default_rng(5)
    xb = jnp.asarray(rng.normal(size=xs), jnp.float32)
    W = jnp.asarray(rng.normal(size=ws), jnp.float32)
    assert ps.pallas_ok(xs, jnp.float32, ws), (variant, case)
    y_p = np.asarray(ps.conv_blocked_pallas(xb, W))
    y_r = np.asarray(xla_ref(xb, W))
    err = np.abs(y_p - y_r).max() / np.abs(y_r).max()
    assert err < 1e-5, (variant, case, err)
