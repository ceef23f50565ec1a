"""polysolve_tpu — a TPU-native sparse linear-algebra and nonlinear-optimization
framework (JAX / XLA / Pallas / pjit), built from scratch with the capabilities
of polyfem/polysolve (reference mounted at /root/reference).

Two sub-libraries mirroring the reference's split (reference CMakeLists.txt:177-180):

- ``polysolve_tpu.linear``    — the linear-solver facade, Krylov family, AMG,
  direct factorizations, saddle-point solver and FEM helpers
  (reference src/polysolve/linear/).
- ``polysolve_tpu.nonlinear`` — the nonlinear optimization stack: Problem
  protocol, Solver driver with descent-strategy fallback chains, line searches
  and box-constrained variants (reference src/polysolve/nonlinear/).

Design: matrices live on device in padded-row (ELL) or block-ELL form, SpMV/SpMM
are XLA/Pallas kernels, Krylov loops are ``lax.while_loop`` bodies with mesh-wide
``psum`` reductions, and multi-chip scaling is 1-D row partitioning over a
``jax.sharding.Mesh`` (see SURVEY.md §7).
"""

from polysolve_tpu import utils  # noqa: F401
from polysolve_tpu.types import (  # noqa: F401
    ELLMatrix,
    BlockELLMatrix,
    DIAMatrix,
    default_dtype,
    ell_from_scipy,
    bell_from_scipy,
    dia_from_scipy,
)
from polysolve_tpu import linear  # noqa: F401
from polysolve_tpu import nonlinear  # noqa: F401
from polysolve_tpu import checkpoint  # noqa: F401
from polysolve_tpu import validate  # noqa: F401

__version__ = "0.1.0"


def enable_x64() -> None:
    """Enable double precision globally (the reference is double-only:
    Types.hpp:11-15). On TPU hardware fp64 is unsupported; the library then
    runs in fp32 with relaxed tolerances — see ``types.default_dtype``."""
    import jax

    jax.config.update("jax_enable_x64", True)
