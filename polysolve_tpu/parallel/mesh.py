"""Device-mesh helpers.

The distributed design (SURVEY.md §2.5, §5): a 1-D mesh over the ``rows``
axis — matrices are row-partitioned into contiguous blocks, vectors sharded
conformally. Krylov dot-products become ``psum`` over the axis; banded SpMV
exchanges halo segments with nearest-neighbor ``ppermute`` (which rides ICI on
real hardware). This replaces the reference's MPI initialization formality
(HypreSolver.cpp:15-39, rank-0-only matrix — effectively sequential)."""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh

ROWS_AXIS = "rows"


def make_mesh(n_devices: Optional[int] = None, axis: str = ROWS_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))
