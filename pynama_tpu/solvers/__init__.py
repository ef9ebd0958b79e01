from pynama_tpu.solvers.cg import CGResult, cg_solve
from pynama_tpu.solvers.gmres import GMRESResult, gmres_solve
from pynama_tpu.solvers.rk import integrate, make_bs5_stepper

__all__ = ["cg_solve", "CGResult", "gmres_solve", "GMRESResult",
           "integrate", "make_bs5_stepper"]
