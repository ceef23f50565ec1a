"""First-order strategies: gradient descent (+stochastic mask) and ADAM
(reference descent_strategies/GradientDescent.cpp:18-35, ADAM.cpp:33-68)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from polysolve_tpu.nonlinear.descent.base import DescentStrategy


class GradientDescent(DescentStrategy):
    name_str = "GradientDescent"

    def compute_update_direction(self, problem, x, grad) -> Optional[np.ndarray]:
        return -grad


class StochasticGradientDescent(GradientDescent):
    """Random coordinate mask with erase probability
    (reference GradientDescent stochastic variant)."""

    name_str = "StochasticGradientDescent"

    def __init__(self, params=None, logger=None):
        super().__init__(params, logger)
        self.erase_component_probability = float(
            self.params.get("erase_component_probability", 0.3)
        )
        self._rng = np.random.default_rng(int(self.params.get("seed", 0)))

    def compute_update_direction(self, problem, x, grad) -> Optional[np.ndarray]:
        mask = self._rng.random(grad.shape) >= self.erase_component_probability
        if not mask.any():
            mask[self._rng.integers(len(mask))] = True
        return -grad * mask


class ADAM(DescentStrategy):
    """ADAM with bias correction (reference ADAM.cpp:33-68)."""

    name_str = "ADAM"

    def __init__(self, params=None, logger=None):
        super().__init__(params, logger)
        self.beta1 = float(self.params.get("beta_1", 0.9))
        self.beta2 = float(self.params.get("beta_2", 0.999))
        self.eps = float(self.params.get("epsilon", 1e-8))
        self.alpha = float(self.params.get("alpha_learning_rate", 0.001))
        self.m = None
        self.v = None
        self.t = 0

    def reset(self, ndof: int) -> None:
        self.m = np.zeros(ndof)
        self.v = np.zeros(ndof)
        self.t = 0

    def _masked_grad(self, grad):
        return grad

    def compute_update_direction(self, problem, x, grad) -> Optional[np.ndarray]:
        if self.m is None:
            self.reset(len(x))
        g = self._masked_grad(grad)
        self.t += 1
        self.m = self.beta1 * self.m + (1 - self.beta1) * g
        self.v = self.beta2 * self.v + (1 - self.beta2) * g * g
        mhat = self.m / (1 - self.beta1 ** self.t)
        vhat = self.v / (1 - self.beta2 ** self.t)
        return -self.alpha * mhat / (np.sqrt(vhat) + self.eps)

    def is_direction_descent(self) -> bool:
        return False  # momentum can overshoot


class StochasticADAM(ADAM):
    name_str = "StochasticADAM"

    def __init__(self, params=None, logger=None):
        super().__init__(params, logger)
        self.erase_component_probability = float(
            self.params.get("erase_component_probability", 0.3)
        )
        self._rng = np.random.default_rng(int(self.params.get("seed", 0)))

    def _masked_grad(self, grad):
        mask = self._rng.random(grad.shape) >= self.erase_component_probability
        if not mask.any():
            mask[self._rng.integers(len(mask))] = True
        return grad * mask
