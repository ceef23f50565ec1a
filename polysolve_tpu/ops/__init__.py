"""Device compute kernels: SpMV/SpMM dispatch + Pallas TPU fast paths."""

from polysolve_tpu.ops.spmv import matvec, matmat, rmatvec, to_device_matrix  # noqa: F401
