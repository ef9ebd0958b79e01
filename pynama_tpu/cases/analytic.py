"""Analytic-solution verification cases (Taylor-Green, senoidal, flat plate).

Parity: /root/reference/src/cases/custom_func.py (CustomFuncCase): exact
velocity/vorticity/convective/diffusive fields drive boundary conditions,
initial conditions, KLE convergence charts and operator-error tests.
"""

import jax.numpy as jnp
import numpy as np

from pynama_tpu.cases.analytic_fields import CASES_2D, CASES_3D
from pynama_tpu.cases.base import FreeSlipProblem
from pynama_tpu.kle import v_tens_v


class CustomFuncProblem(FreeSlipProblem):
    def __init__(self, config, case="taylor-green", **kw):
        super().__init__(config, **kw)
        self.case = case
        table = CASES_2D if self.dim == 2 else CASES_3D
        if case not in table:
            raise ValueError(f"case '{case}' not defined for dim {self.dim}")
        (self.vel_fn, self.vort_fn, self.conv_fn, self.diff_fn) = table[case]

    def setup_bc(self):
        super().setup_bc()
        self._coords = jnp.asarray(self.mesh.coords, dtype=self.dtype)

    # -- BC / IC ----------------------------------------------------------
    def vel_bc(self, t):
        """Exact velocity (only boundary dofs are read through the mask).

        Parity: CustomFuncCase.applyBoundaryConditions (custom_func.py:76-83).
        """
        return self.vel_fn(self._coords, self.nu, t).reshape(
            self._gshape(self.dim)
        )

    def vort_bc(self, t, vort):
        """Clamp boundary vorticity to the exact solution.

        The reference overwrites boundary vorticity values on every
        applyBoundaryConditions call (custom_func.py:81); here the clamp is
        an explicit mask blend.
        """
        exact = self.vort_fn(self._coords, self.nu, t).reshape(
            self._gshape(self.dim_w)
        )
        if vort.ndim > 1 and vort.shape != exact.shape:  # blocked layout
            exact = self._blk(exact)
            m = self.bc_vort_mask_b
        else:
            m = self.bc_vort_mask
        return vort * (1.0 - m) + exact * m

    def initial_vorticity(self):
        """Parity: computeInitialCondition (custom_func.py:57-61)."""
        return self.vort_fn(self._coords, self.nu, self.t_start).reshape(
            self._gshape(self.dim_w)
        )

    def exact_fields(self, t):
        vel = self.vel_fn(self._coords, self.nu, t)
        vort = self.vort_fn(self._coords, self.nu, t)
        return vel, vort

    # -- verification ------------------------------------------------------
    def kle_error(self, viscous_times):
        return super().kle_error(viscous_times, self.exact_fields)

    def operators_test(self, viscous_time=1.0):
        """Weighted L2 errors of convective/diffusive/curl operators.

        Parity: CustomFuncCase.OperatorsTests (custom_func.py:131-153) —
        fixed here: the reference version references an undefined variable
        and is unrunnable at HEAD (see SURVEY.md section 2 'latent bugs').
        Error norm: sqrt(sum_i w_i err_i^2) with w the lumped node weights.
        """
        t = (viscous_time**2) / (4.0 * self.nu)
        ops = self.operators
        vel_e = self.vel_fn(self._coords, self.nu, t).reshape(-1)
        vort_e = self.vort_fn(self._coords, self.nu, t).reshape(-1)
        conv_e = self.conv_fn(self._coords, self.nu, t).reshape(-1)
        diff_e = self.diff_fn(self._coords, self.nu, t).reshape(-1)

        # convective = Curl(DivSrT(u (x) u))   (custom_func.py:155-161)
        aux = ops.div_srt(v_tens_v(vel_e, self.dim))
        convective = ops.curl(aux)
        # diffusive = Curl(DivSrT(2 mu SrT(u)) / rho)  (custom_func.py:163-171)
        aux = ops.div_srt(2.0 * self.mu * ops.strain_rate(vel_e))
        diffusive = ops.curl(aux / self.rho)
        curl = ops.curl(vel_e)

        w = ops.w_curl

        def werr(a, b):
            e = a - b
            return float(jnp.sqrt(jnp.sum(e * e * w)))

        return werr(convective, conv_e), werr(diffusive, diff_e), werr(curl, vort_e)
