"""Multi-chip parallelism: device mesh setup, row partitioning, and
distributed solves (the framework's first-class replacement for the
reference's MPI-formality + single-GPU design — SURVEY.md §2.5)."""

from polysolve_tpu.parallel.mesh import make_mesh  # noqa: F401
from polysolve_tpu.parallel.distributed import (  # noqa: F401
    DistributedDIA,
    DistributedPoisson,
    dist_cg,
    sharded_dia_matvec,
)
