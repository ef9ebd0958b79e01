"""Case-level verification: uniform flow, analytic operators, transient
Taylor-Green, lid-driven cavity smoke.

Parity: the reference's chart/test modes (run_case.py:30-130) and
test_solver.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pynama_tpu.cases.analytic import CustomFuncProblem
from pynama_tpu.cases.cavity import CavityProblem
from pynama_tpu.cases.uniform import UniformFlowProblem


def make_config(nelem, ngl, rho=1.0, mu=0.01, lower=None, upper=None, **ts):
    dim = len(nelem)
    return {
        "name": "test",
        "material-properties": {"rho": rho, "mu": mu},
        "domain": {
            "ngl": ngl,
            "box-mesh": {
                "nelem": list(nelem),
                "lower": lower or [0] * dim,
                "upper": upper or [1] * dim,
            },
        },
        "time-solver": {
            "start-time": ts.get("start", 0.0),
            "end-time": ts.get("end", 1.0),
            "max-steps": ts.get("max_steps", 50),
        },
    }


def test_uniform_case_2d():
    p = UniformFlowProblem(make_config((6, 6), 3)).setup()
    u = p.solve_kle(0.0, p.initial_vorticity(), rtol=1e-14, maxiter=10000,
                    restarts=2)
    vel_e, _ = p.exact_fields(0.0)
    diff = np.asarray(u).reshape(-1) - np.asarray(vel_e).reshape(-1)
    assert float(np.linalg.norm(diff)) < 1e-12


def test_taylor_green_kle_error_decreases_with_p():
    """p-refinement convergence of the KLE solve (chart mode analogue,
    run_case.py:30-77)."""
    errs = []
    for ngl in (3, 5, 7):
        p = CustomFuncProblem(
            make_config((2, 2), ngl, rho=0.5, mu=0.01), case="taylor-green"
        ).setup()
        errs.append(p.kle_error([0.1])[0])
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] < 1e-3 * errs[0]


def test_senoidal_operator_errors_converge():
    """Operator-error chart analogue (run_case.py:79-130)."""
    errs = []
    for ngl in (4, 6, 8):
        p = CustomFuncProblem(
            make_config((2, 2), ngl, rho=1.0, mu=1.0), case="senoidal"
        ).setup()
        errs.append(p.operators_test(viscous_time=1.0))
    conv = [e[0] for e in errs]
    diff = [e[1] for e in errs]
    curl = [e[2] for e in errs]
    assert conv[0] > conv[-1] and diff[0] > diff[-1] and curl[0] > curl[-1]
    # senoidal has 2 full waves per element: ngl 4 -> 8 gives ~200x on curl
    assert curl[-1] < 1e-2 * curl[0]


def test_taylor_green_transient():
    """Short adaptive NS run tracks the analytic decay.

    Parity: transient KLE-error mode (convergedStepFunctionKLET,
    base_problem.py:184-204).
    """
    cfg = make_config((4, 4), 4, rho=0.5, mu=0.01, end=0.05, max_steps=200)
    p = CustomFuncProblem(cfg, case="taylor-green").setup()
    vort, t, n = p.run()
    assert abs(t - 0.05) < 1e-12
    vel_e, vort_e = p.exact_fields(t)
    err = float(jnp.linalg.norm(p.vel - vel_e.reshape(-1))) / float(
        jnp.linalg.norm(vel_e)
    )
    # dominated by the ngl=4 / 4x4 spatial truncation (~1e-2), not time error
    assert err < 2e-2, err


def test_ws_extrapolation_matches_plain_run():
    """kle-ws-extrapolate changes only warm starts, not the trajectory.

    Dual-mask cavity (pair aux, the hardest structure): per-slot
    extrapolated warm starts must reproduce the plain within-step-chain
    run to solver tolerance — same accepted steps, same final state.
    """
    cfg = make_config((8, 8), 3, rho=1.0, mu=0.1, end=0.3, max_steps=8)
    cfg["boundary-conditions"] = {"no-slip": {"up": [1.0, 0.0]}}
    outs = {}
    for ws in (False, True):
        p = CavityProblem({**cfg, "kle-ws-extrapolate": ws}).setup()
        p.run()
        outs[ws] = np.asarray(p.vort)
    dv = float(np.linalg.norm(outs[True] - outs[False]))
    ref = float(np.linalg.norm(outs[False]))
    assert dv / max(ref, 1e-30) < 1e-6, dv / max(ref, 1e-30)


def test_cavity_smoke():
    """Lid-driven cavity: masks, dual solve, a few transient steps."""
    cfg = make_config((8, 8), 3, rho=1.0, mu=0.1, end=0.5, max_steps=10)
    cfg["boundary-conditions"] = {"no-slip": {"up": [1.0, 0.0]}}
    p = CavityProblem(cfg).setup()

    # mask structure: lid tangential dof free at FS stage, pinned at final
    up = p.mesh.face_nodes["up"].astype(np.int64)
    interior_up = up[(p.mesh.coords[up, 0] > 0) & (p.mesh.coords[up, 0] < 1)]
    fm = np.asarray(p.free_mask).reshape(-1)
    fmfs = np.asarray(p.free_mask_fs).reshape(-1)
    assert np.all(fm[interior_up * 2] == 0) and np.all(fm[interior_up * 2 + 1] == 0)
    assert np.all(fmfs[interior_up * 2] == 1)   # tangential free at FS
    assert np.all(fmfs[interior_up * 2 + 1] == 0)  # normal pinned
    # corners pinned in both
    corner = up[p.mesh.coords[up, 0] == 0]
    assert np.all(fmfs[corner * 2] == 0)

    vort, t, n = p.run(max_steps=5)
    assert np.isfinite(np.asarray(vort)).all()
    vel = np.asarray(p.vel).reshape(-1, 2)
    # lid velocity imposed; flow develops beneath the lid
    assert np.isfinite(vel).all()
    assert abs(vel[int(interior_up[len(interior_up) // 2]), 0] - 1.0) < 1e-8
    assert np.abs(vel[:, 0]).max() <= 1.5  # bounded by lid speed (no blowup)
