"""PostStepData bundle for the post_step callback
(reference nonlinear/PostStepData.{hpp,cpp})."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict

import numpy as np


@dataclass
class PostStepData:
    iter_num: int
    solver_info: Dict[str, Any]
    x: np.ndarray
    grad: np.ndarray
