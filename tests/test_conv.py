"""Conv-stencil elemental apply (ops/conv.py) vs the slice/stack path.

The parity-blocked convolution must reproduce the scatter-free
slice/stack apply (itself verified against assembled matrices in
test_structured.py) to roundoff, INCLUDING boundary nodes where the
phantom-cell inclusion-exclusion corrections act.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pynama_tpu.ops.structured import StructuredElementOp


def make_op(rng, dim, ngl, k_in, k_out, nelem):
    nnode = ngl**dim
    A = rng.normal(size=(nnode * k_out, nnode * k_in))
    npts = tuple(n * (ngl - 1) + 1 for n in nelem)
    return StructuredElementOp(
        A=jnp.asarray(A), ngl=ngl, nelem=nelem, npts=npts,
        k_in=k_in, k_out=k_out,
    ), npts


@pytest.mark.parametrize(
    "dim,ngl,k_in,k_out,nelem",
    [
        (2, 3, 2, 2, (4, 5)),
        (2, 3, 1, 2, (3, 3)),
        (2, 4, 2, 3, (5, 2)),
        (2, 2, 2, 1, (6, 4)),
        (3, 3, 2, 3, (2, 3, 2)),
        (3, 2, 1, 6, (3, 2, 2)),
    ],
)
def test_conv_matches_slices(dim, ngl, k_in, k_out, nelem):
    rng = np.random.default_rng(dim * 100 + ngl)
    op, npts = make_op(rng, dim, ngl, k_in, k_out, nelem)
    x = jnp.asarray(rng.normal(size=(int(np.prod(npts)) * k_in,)))
    os.environ["PYNAMA_NO_CONV"] = "1"
    try:
        y_ref = np.asarray(op(x))
    finally:
        os.environ["PYNAMA_NO_CONV"] = "0"
    y = np.asarray(op(x))
    err = np.abs(y - y_ref).max() / np.abs(y_ref).max()
    assert err < 1e-12


def test_conv_under_jit_pytree_arg():
    """Op passed as a jit argument (A traced) must match the direct call."""
    rng = np.random.default_rng(7)
    op, npts = make_op(rng, 2, 3, 2, 2, (4, 4))
    x = jnp.asarray(rng.normal(size=(int(np.prod(npts)) * 2,)))
    y1 = np.asarray(op(x))
    y2 = np.asarray(jax.jit(lambda o, v: o(v))(op, x))
    assert np.abs(y1 - y2).max() < 1e-12


def test_conv_grid_layout():
    """Grid-shaped input returns grid-shaped output, same values."""
    rng = np.random.default_rng(3)
    op, npts = make_op(rng, 2, 3, 2, 2, (5, 3))
    gshape = tuple(reversed(npts)) + (2,)
    xg = jnp.asarray(rng.normal(size=gshape))
    y_flat = np.asarray(op(xg.reshape(-1)))
    y_grid = np.asarray(op(xg))
    assert y_grid.shape == gshape
    assert np.abs(y_grid.reshape(-1) - y_flat).max() == 0.0
