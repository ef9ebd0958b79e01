"""3D coverage: KLE solve, transient Taylor-Green (full 3D and 2D-in-3D).

Parity: the reference's 3D paths (dim_w=3, dim_s=6 —
base_problem.py:68-69; taylor-green / taylor-green2d-3d cases,
custom_func.py:25-36; 3D solver gate test_solver.py:52-62).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pynama_tpu.cases.analytic import CustomFuncProblem
from tests.test_cases import make_config


def test_taylor_green_3d_kle_converges():
    errs = []
    for ngl in (3, 4):
        p = CustomFuncProblem(
            make_config((2, 2, 2), ngl, rho=0.5, mu=0.01),
            case="taylor-green",
        ).setup()
        errs.append(p.kle_error([0.3])[0])
    # one order of p-refinement on the full 3D Taylor-Green
    assert errs[1] < 0.4 * errs[0], errs


def test_taylor_green_2d3d_transient():
    cfg = make_config((3, 3, 3), 3, rho=0.5, mu=0.01, end=0.02, max_steps=50)
    p = CustomFuncProblem(cfg, case="taylor-green2d-3d").setup()
    vort, t, n = p.run()
    assert abs(t - 0.02) < 1e-12
    vel_e, vort_e = p.exact_fields(t)
    rel = float(jnp.linalg.norm(p.vel - vel_e.reshape(-1))) / float(
        jnp.linalg.norm(vel_e)
    )
    assert rel < 0.15, rel  # coarse 3x3x3 ngl3 spatial resolution


def test_taylor_green_3d_operators():
    p = CustomFuncProblem(
        make_config((2, 2, 2), 4, rho=0.5, mu=0.01), case="taylor-green"
    ).setup()
    conv, diff, curl = p.operators_test(viscous_time=0.5)
    p2 = CustomFuncProblem(
        make_config((2, 2, 2), 6, rho=0.5, mu=0.01), case="taylor-green"
    ).setup()
    conv2, diff2, curl2 = p2.operators_test(viscous_time=0.5)
    assert curl2 < curl and conv2 < conv and diff2 < diff
