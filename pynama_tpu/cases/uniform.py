"""Uniform far-field flow: constant-velocity Dirichlet everywhere.

Parity: /root/reference/src/cases/uniform.py (UniformFlow). The exact
solution is the constant field, so the KLE solve must reproduce it to
machine precision (test_solver.py:20-27,52-62).
"""

import jax.numpy as jnp
import numpy as np

from pynama_tpu.cases.base import FreeSlipProblem


class UniformFlowProblem(FreeSlipProblem):
    def __init__(self, config, **kw):
        super().__init__(config, **kw)
        self.cte_value = (1.0, 0.0) if self.dim == 2 else (1.0, 0.0, 0.0)

    def setup_bc(self):
        super().setup_bc()
        u = np.tile(np.asarray(self.cte_value), self.mesh.n_nodes)
        self._u_bc = jnp.asarray(
            u.reshape(self._gshape(self.dim)), dtype=self.dtype
        )

    def vel_bc(self, t):
        return self._u_bc

    def exact_fields(self, t):
        vel = self._u_bc.reshape(-1, self.dim)
        vort = jnp.zeros((self.mesh.n_nodes, self.dim_w), dtype=self.dtype)
        return vel, vort
