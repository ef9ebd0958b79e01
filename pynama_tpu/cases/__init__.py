from pynama_tpu.cases.base import BaseProblem, FreeSlipProblem
from pynama_tpu.cases.analytic import CustomFuncProblem
from pynama_tpu.cases.uniform import UniformFlowProblem
from pynama_tpu.cases.cavity import CavityProblem

__all__ = [
    "BaseProblem",
    "FreeSlipProblem",
    "CustomFuncProblem",
    "UniformFlowProblem",
    "CavityProblem",
]
