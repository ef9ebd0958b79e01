"""IO subsystem + CLI driver tests: XDMF/HDF5 output, checkpoint/resume,
run modes. Parity: run_case.py entry modes + paraviewer output layout.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from pynama_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from pynama_tpu.io.xdmf import XdmfWriter
from tests.test_cases import make_config


def test_checkpoint_round_trip(tmp_path):
    pth = str(tmp_path / "ck.npz")
    vort = np.random.default_rng(0).normal(size=100)
    save_checkpoint(pth, step=7, t=1.25, dt=0.01, vort=vort, vel=vort * 2,
                    f1=vort * 3, extra={"case": "x"})
    ck = load_checkpoint(pth)
    assert ck["step"] == 7 and ck["t"] == 1.25 and ck["dt"] == 0.01
    np.testing.assert_allclose(ck["vort"], vort)
    np.testing.assert_allclose(ck["vel"], vort * 2)
    assert ck["extra"]["case"] == "x"


def test_resume_matches_uninterrupted():
    """Run 4 steps straight vs 2 + checkpoint + resume 2: identical."""
    from pynama_tpu.cases.analytic import CustomFuncProblem

    cfg = make_config((3, 3), 3, rho=0.5, mu=0.01, end=0.5, max_steps=10)
    p1 = CustomFuncProblem(cfg, case="taylor-green").setup()
    w1, t1, n1 = p1.run(max_steps=4)

    import tempfile

    ck = os.path.join(tempfile.mkdtemp(), "ck.npz")
    p2 = CustomFuncProblem(cfg, case="taylor-green").setup()
    p2.run(max_steps=2, checkpoint_path=ck, checkpoint_every=1)
    w2, t2, n2 = p2.run(max_steps=4, resume_from=ck)

    assert n2 == n1
    assert abs(t1 - t2) < 1e-14
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-12)


def test_xdmf_writer(tmp_path):
    import h5py

    w = XdmfWriter(str(tmp_path), dim=2)
    coords = np.random.default_rng(1).normal(size=(20, 2))
    w.save_mesh(coords)
    w.save_fields(0, 0.0, velocity=np.zeros(40), vorticity=np.ones(20))
    w.save_fields(5, 0.5, velocity=np.ones(40), vorticity=np.ones(20))
    out = w.write_xmf("case")
    assert os.path.exists(out)
    with h5py.File(tmp_path / "vec-data-00005.h5") as f:
        assert f["fields/velocity"].shape == (40,)
    txt = open(out).read()
    assert "Polyvertex" in txt and "HyperSlab" in txt and "velocity_x" in txt


def run_cli(*argv):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "pynama_tpu.run_case", *argv],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), env=env, timeout=600,
    )


@pytest.mark.slow
def test_cli_uniform_run(tmp_path):
    r = run_cli("-case", "uniform", "-log", "WARNING")
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists("run-uniform/uniform-metrics.yaml")


def test_apply_opts_nested_and_scalars():
    """-opt passthrough: the analogue of the open PETSc options DB."""
    from pynama_tpu.run_case import apply_opts

    cfg = {"multigrid": True, "kle-rtol": 1e-10}
    apply_opts(cfg, ["multigrid.smoother=jacobi", "multigrid.pre=2",
                     "kle-solver=gmres", "kle-rtol=1e-7",
                     "kle-refine=true",
                     "time-solver.max-steps=3"])
    assert cfg["multigrid"] == {"smoother": "jacobi", "pre": 2}
    assert cfg["kle-solver"] == "gmres"
    assert cfg["kle-rtol"] == pytest.approx(1e-7)
    assert cfg["kle-refine"] is True
    assert cfg["time-solver"]["max-steps"] == 3
    with pytest.raises(SystemExit):
        apply_opts(cfg, ["no-equals-sign"])


def test_cli_opt_passthrough_reaches_solver():
    """-opt flags change solver behavior from the command line."""
    r = run_cli("-case", "uniform", "-log", "INFO", "-max-steps", "1",
                "-opt", "kle-solver=gmres", "-opt", "multigrid=false",
                "-opt", "save-dir=run-uniform-opt")
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists("run-uniform-opt/uniform-metrics.yaml")


@pytest.mark.slow
def test_cli_kle_chart():
    r = run_cli("-case", "taylor-green", "-test", "kle", "-max-ngl", "5",
                "-log", "WARNING")
    assert r.returncode == 0, r.stderr[-2000:]
    data = json.loads(r.stdout.strip().splitlines()[-1])
    errs = data["errors"]
    assert errs[-1][0] < errs[0][0]  # p-refinement converges


def test_vtk_writers(tmp_path):
    from pynama_tpu.io.vtk import write_body_polyline, write_point_cloud

    coords = np.random.default_rng(0).normal(size=(12, 2))
    p1 = write_point_cloud(
        str(tmp_path / "cloud.vtk"), coords,
        fields={"vorticity": np.arange(12.0), "velocity": np.ones((12, 2))},
    )
    txt = open(p1).read()
    assert "POINTS 12 double" in txt and "SCALARS vorticity" in txt
    assert "VECTORS velocity" in txt
    p2 = write_body_polyline(str(tmp_path / "body.vtk"), coords)
    assert "LINES 1 14" in open(p2).read()


def test_device_report_lists_allocations():
    """printMatsInfo analogue (mat_generator.py:120-130): every major
    allocation (MG kernels, coarse inverse, masks, elemental matrices)
    shows up with a path and byte count."""
    from pynama_tpu.cases.cavity import CavityProblem
    from pynama_tpu.utils.report import collect_arrays, device_report

    cfg = make_config((8, 8), 3, rho=1.0, mu=0.1, end=0.1, max_steps=2)
    cfg["boundary-conditions"] = {"no-slip": {"up": [1.0, 0.0]}}
    p = CavityProblem(cfg).setup()
    p.solve_kle(0.0, p.initial_vorticity())  # populate lazy conv kernels
    rows = collect_arrays(p, "p")
    paths = [r[0] for r in rows]
    assert any(".system.K.A" in s for s in paths), paths[:5]
    assert any(".mg.coarse_inv" in s for s in paths)
    assert any("free_mask" in s for s in paths)
    assert sum(r[3] for r in rows if r[4]) > 0  # device bytes
    rep = device_report(p, top=10)
    assert "allocation report" in rep and "MB" in rep
    assert len(rep.splitlines()) <= 13
