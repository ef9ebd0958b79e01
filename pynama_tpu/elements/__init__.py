from pynama_tpu.elements.quadrature import gauss_points, lobatto_points
from pynama_tpu.elements.lagrange import lagrange_basis
from pynama_tpu.elements.spectral import SpectralElement

__all__ = ["gauss_points", "lobatto_points", "lagrange_basis", "SpectralElement"]
