"""Device compute kernels: SpMV/SpMM dispatch + Pallas TPU fast paths."""

from polysolve_tpu.ops.spmv import (  # noqa: F401
    matmat,
    matmat_bt,
    matvec,
    rmatvec,
    to_device_matrix,
)
