"""Matrix-free elemental operator application: gather -> GEMM -> scatter-add.

This replaces the reference's assembled PETSc AIJ matrices and their
setValues/assemble scatter machinery (/root/reference/src/matrices/
mat_generator.py:95-170, base_problem.py:499-552) with the TPU-idiomatic
form: per-element dof gather, one batched (or shared) dense matmul on the
MXU, and a scatter-add reduction back to the global vector.

On uniform box meshes every element shares ONE elemental matrix, so the
apply is a single large GEMM of shape (n_cells, in_dofs) @ (in_dofs,
out_dofs) — exactly what the MXU wants. The general (per-element geometry)
path uses a batched einsum.
"""

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def gather(u, dof_table):
    """u[dof_table] — (n_cells, k) element-local dof values."""
    return u[dof_table]


def scatter_add(values, dof_table, out_size, dtype=None):
    """Sum per-element contributions into a global vector.

    values: (n_cells, k); dof_table: (n_cells, k) int32.
    """
    dtype = dtype or values.dtype
    out = jnp.zeros((out_size,), dtype=dtype)
    return out.at[dof_table.reshape(-1)].add(
        values.reshape(-1), mode="drop", unique_indices=False
    )


@jax.tree_util.register_pytree_node_class
@dataclass
class ElementOp:
    """A global linear operator y = scatter(A_e @ gather(x)).

    A:        (out_k, in_k) shared elemental matrix, or (E, out_k, in_k)
              batched per-element matrices.
    in_dofs:  (E, in_k) int32 gather table.
    out_dofs: (E, out_k) int32 scatter table.
    out_size: global output vector length.
    """

    A: jnp.ndarray
    in_dofs: jnp.ndarray
    out_dofs: jnp.ndarray
    out_size: int

    def tree_flatten(self):
        return (self.A, self.in_dofs, self.out_dofs), (self.out_size,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        A, in_dofs, out_dofs = children
        return cls(A=A, in_dofs=in_dofs, out_dofs=out_dofs, out_size=aux[0])

    @property
    def shared(self) -> bool:
        return self.A.ndim == 2

    def __call__(self, x):
        xe = gather(x, self.in_dofs)                      # (E, in_k)
        if self.shared:
            ye = xe @ self.A.T                            # one big GEMM
        else:
            ye = jnp.einsum("eoi,ei->eo", self.A, xe)
        return scatter_add(ye, self.out_dofs, self.out_size, dtype=x.dtype)

    def diagonal(self):
        """Assembled diagonal (only meaningful for square node maps)."""
        if self.shared:
            d = jnp.diagonal(self.A)
            de = jnp.broadcast_to(d, self.in_dofs.shape)
        else:
            de = jnp.diagonal(self.A, axis1=1, axis2=2)
        return scatter_add(de, self.out_dofs, self.out_size, dtype=self.A.dtype)

def make_element_op(A, in_dofs, out_dofs, out_size, dtype=jnp.float64):
    return ElementOp(
        A=jnp.asarray(A, dtype=dtype),
        in_dofs=jnp.asarray(np.asarray(in_dofs), dtype=jnp.int32),
        out_dofs=jnp.asarray(np.asarray(out_dofs), dtype=jnp.int32),
        out_size=int(out_size),
    )
