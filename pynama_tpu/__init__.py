"""pynama_tpu — a TPU-native spectral-element FEM/CFD framework in JAX.

A from-scratch rebuild of the capabilities of the petsc4py reference
(ibejarano/Pynama, mounted at /root/reference): incompressible Navier-Stokes
in the vorticity-velocity (KLE) formulation on Gauss-Lobatto-Legendre
spectral elements, with free-slip/no-slip boundary handling, an immersed
boundary method, analytic verification cases, adaptive explicit Runge-Kutta
time integration, and XDMF/HDF5 output.

Architecture (TPU-first, not a translation):
  * element integration  -> batched dense GEMMs (MXU) over congruent elements
  * global sparse ops    -> matrix-free gather/GEMM/scatter-add
  * PETSc KSP (LU)       -> jit-compiled CG/Jacobi with warm starts
  * PETSc TS rk 5bs      -> Bogacki-Shampine RK5(4) in lax.while_loop
  * MPI mesh distribute  -> jax.sharding Mesh + shard_map halo exchange

Float64 is enabled at import: the numerical parity gates (1e-12 uniform
flow, 2e-8 Taylor-Green; see /root/reference/src/tests/test_solver.py:26,36)
require double precision. Speed paths pass explicit float32 dtypes.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)
# TPU matmuls default to bfloat16 multiplies; the ~1e-2 relative error
# destabilizes the Chebyshev-smoothed multigrid V-cycle (verified: V-cycle
# diverges on TPU, converges on CPU at identical f32). Scientific solves
# need true float32 GEMMs.
_jax.config.update("jax_default_matmul_precision", "float32")

__version__ = "0.1.0"

from pynama_tpu.elements.spectral import SpectralElement  # noqa: E402,F401
from pynama_tpu.mesh.structured import BoxMesh  # noqa: E402,F401
