from pynama_tpu.solvers.cg import CGResult, cg_solve

__all__ = ["cg_solve", "CGResult"]
