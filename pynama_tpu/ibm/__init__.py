from pynama_tpu.ibm.bodies import Circle, Line, OpenBox, BodiesContainer
from pynama_tpu.ibm.coupling import IBMCoupling

__all__ = ["Circle", "Line", "OpenBox", "BodiesContainer", "IBMCoupling"]
