"""The user-facing Problem protocol (reference nonlinear/Problem.hpp:22-141).

The reference makes the user hand-write ``value`` / ``gradient`` / ``hessian``
(its tests use a vendored forward-mode autodiff, tests/autodiff.h). Here JAX
*is* the autodiff: subclassing ``Problem`` and implementing only ``value`` as
a jax-traceable function gets exact ``gradient`` (reverse-mode) and
``hessian`` (forward-over-reverse) for free, jit-compiled and cached. Users
can still override either for hand-tuned or sparse versions.

All the reference's hooks are kept with the same semantics:
step validity (``is_step_valid``, Problem.hpp:71), the CCD maximum-step hook
(``max_step_size``, :77), the line-search bracketing callbacks (:84-87),
``post_step`` (:91), PSD projection control (:95), ``solution_changed`` (:99),
user stop ``callback``/``stop`` (:107-112), norm-type selection (:114-119) and
``sample_along_direction`` (:132-140, impl Problem.cpp:5-31).
"""

from __future__ import annotations

import enum
from typing import Callable, Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp


class NormType(enum.Enum):
    """Gradient-norm flavor used by the convergence criteria
    (reference Problem.hpp:14-19)."""

    EUCLIDEAN = "euclidean"
    L2 = "l2"       # mesh-weighted L2 in polyfem; == euclidean here
    LINF = "linf"


class Problem:
    """Subclass and implement at least :meth:`value` (jax-traceable for free
    derivatives, or plain numpy with an explicit ``gradient`` override)."""

    def __init__(self):
        self._project_to_psd = False
        self._grad_fn: Optional[Callable] = None
        self._hess_fn: Optional[Callable] = None

    # -- energy/derivatives (reference Problem.hpp:47-65) ------------------- #

    def value(self, x: np.ndarray) -> float:
        raise NotImplementedError

    def gradient(self, x: np.ndarray) -> np.ndarray:
        if self._grad_fn is None:
            self._grad_fn = jax.jit(jax.grad(lambda z: jnp.asarray(self.value(z))))
        return np.asarray(self._grad_fn(jnp.asarray(x, dtype=jnp.float64)))

    def hessian(self, x: np.ndarray) -> np.ndarray:
        """Dense Hessian (sparse overrides welcome — Newton handles both)."""
        if self._hess_fn is None:
            self._hess_fn = jax.jit(jax.hessian(lambda z: jnp.asarray(self.value(z))))
        return np.asarray(self._hess_fn(jnp.asarray(x, dtype=jnp.float64)))

    # -- step hooks (reference Problem.hpp:71-101) --------------------------- #

    def is_step_valid(self, x0: np.ndarray, x1: np.ndarray) -> bool:
        return True

    def max_step_size(self, x0: np.ndarray, x1: np.ndarray) -> float:
        """CCD hook: largest admissible fraction of the step (∞ = unlimited)."""
        return np.inf

    def line_search_begin(self, x0: np.ndarray, x1: np.ndarray) -> None:
        pass

    def line_search_end(self) -> None:
        pass

    def post_step(self, data) -> None:
        pass

    def set_project_to_psd(self, project: bool) -> None:
        self._project_to_psd = project

    @property
    def project_to_psd(self) -> bool:
        return self._project_to_psd

    def solution_changed(self, x: np.ndarray) -> None:
        pass

    def after_line_search_custom_operation(self, x0: np.ndarray,
                                           x1: np.ndarray) -> None:
        pass

    # -- user stop (reference Problem.hpp:107-112) --------------------------- #

    def callback(self, criteria, x: np.ndarray) -> bool:
        """Return False to stop the solver (reference: returning false stops)."""
        return True

    def stop(self, x: np.ndarray) -> bool:
        """Return True to stop with ObjectiveCustomStop."""
        return False

    # -- norms (reference Problem.hpp:114-119) ------------------------------- #

    norm_type: NormType = NormType.EUCLIDEAN

    def gradient_norm(self, g: np.ndarray) -> float:
        if self.norm_type == NormType.LINF:
            return float(np.abs(g).max(initial=0.0))
        return float(np.linalg.norm(g))

    def use_grad_norm(self) -> bool:
        """Whether convergence measures ‖∇f‖ directly (vs a rescaled norm)."""
        return True

    # -- diagnostics (reference Problem.hpp:132-140, Problem.cpp:5-31) ------- #

    def sample_along_direction(
        self, x: np.ndarray, direction: np.ndarray,
        start: float = -1.0, end: float = 1.0, num_samples: int = 100,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Energies at ``num_samples`` points x + α·direction, α ∈ [start, end]."""
        alphas = np.linspace(start, end, num_samples)
        vals = np.array([self.value(x + a * direction) for a in alphas])
        return alphas, vals


class FunctionProblem(Problem):
    """Wrap a plain jax function f(x) -> scalar as a Problem."""

    def __init__(self, fn: Callable, constraints=()):
        super().__init__()
        self._fn = fn
        self.constraints = list(constraints)

    def value(self, x):
        return float(self._fn(jnp.asarray(x, dtype=jnp.float64)))

    def gradient(self, x):
        if self._grad_fn is None:
            self._grad_fn = jax.jit(jax.grad(self._fn))
        return np.asarray(self._grad_fn(jnp.asarray(x, dtype=jnp.float64)))

    def hessian(self, x):
        if self._hess_fn is None:
            self._hess_fn = jax.jit(jax.hessian(self._fn))
        return np.asarray(self._hess_fn(jnp.asarray(x, dtype=jnp.float64)))
