"""Line-search base pipeline (reference line_search/LineSearch.cpp:68-182).

Three phases, exactly as the reference:

1. **NaN-free step**: halve the step until the trial energy is finite
   (LineSearch.cpp:184-218);
2. **Collision-safe step**: clamp by the problem's CCD hook
   ``max_step_size`` with conservative downward rounding — the reference
   flips the FPU to FE_DOWNWARD while scaling (LineSearch.cpp:221-249); here
   ``np.nextafter`` provides the same conservatism;
3. **Descent loop**: method-specific acceptance criterion, step scaled by
   0.5 each rejection, floor at ``min_step_size``.

The final strategy in the solver's fallback chain gets relaxed limits
(``min_step_size_final`` / ``max_step_size_iter_final``,
reference LineSearch.hpp:58-66).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from polysolve_tpu.utils import PhaseTimings


class LineSearch:
    name_str = "LineSearch"

    def __init__(self, params: Optional[Dict[str, Any]] = None, logger=None):
        self.params = dict(params or {})
        self.logger = logger
        self.min_step_size = float(self.params.get("min_step_size", 1e-10))
        self.max_step_size_iter = int(self.params.get("max_step_size_iter", 30))
        self.min_step_size_final = float(self.params.get("min_step_size_final", 1e-20))
        self.max_step_size_iter_final = int(
            self.params.get("max_step_size_iter_final", 100)
        )
        self.default_init_step_size = float(
            self.params.get("default_init_step_size", 1.0)
        )
        self.step_ratio = 0.5
        self.use_grad_norm_tol = float(self.params.get("use_grad_norm_tol", -1.0))
        self.is_final_strategy = False
        self.timings = PhaseTimings()
        self.iterations = 0

    def name(self) -> str:
        return self.name_str

    # ------------------------------------------------------------------ #

    def _limits(self):
        if self.is_final_strategy:
            return self.min_step_size_final, self.max_step_size_iter_final
        return self.min_step_size, self.max_step_size_iter

    def line_search(self, x: np.ndarray, delta_x: np.ndarray, problem) -> float:
        """Returns the accepted step size, or NaN on failure
        (reference LineSearch.cpp:68-182)."""
        self.iterations = 0
        if not np.all(np.isfinite(delta_x)):
            return float("nan")
        dnorm = np.linalg.norm(delta_x)
        if dnorm == 0:
            return float("nan")

        old_energy = problem.value(x)
        if not np.isfinite(old_energy):
            return float("nan")
        grad = problem.gradient(x)

        step = self.default_init_step_size
        min_step, max_iters = self._limits()

        problem.line_search_begin(x, x + step * delta_x)
        try:
            # phase 1: nan-free (LineSearch.cpp:184-218)
            with self.timings.scope("checking_for_nan_inf"):
                for _ in range(max_iters):
                    if np.isfinite(problem.value(x + step * delta_x)):
                        break
                    step *= self.step_ratio
                else:
                    return float("nan")

            # phase 2: CCD max step (LineSearch.cpp:221-249)
            with self.timings.scope("broad_phase_ccd"):
                max_frac = problem.max_step_size(x, x + step * delta_x)
                if max_frac <= 0:
                    return float("nan")
                if np.isfinite(max_frac) and max_frac < 1.0:
                    # conservative downward rounding (FE_DOWNWARD analog)
                    step = np.nextafter(step * max_frac, 0.0)

            # phase 3: method-specific descent loop (LineSearch.cpp:251+)
            with self.timings.scope("classical_line_search"):
                rate = self._descent_loop(x, delta_x, problem, old_energy, grad,
                                          step, min_step, max_iters)
            return rate
        finally:
            problem.line_search_end()

    # ------------------------------------------------------------------ #

    def _descent_loop(self, x, delta_x, problem, old_energy, grad,
                      step, min_step, max_iters) -> float:
        for it in range(max_iters):
            self.iterations = it + 1
            if step < min_step:
                break
            new_x = x + step * delta_x
            problem.solution_changed(new_x)
            if problem.is_step_valid(x, new_x):
                new_energy = problem.value(new_x)
                if np.isfinite(new_energy) and self._accept(
                    problem, x, new_x, delta_x, step, old_energy, new_energy, grad
                ):
                    return step
            step *= self.step_ratio
        return float("nan")

    def _accept(self, problem, x, new_x, delta_x, step, old_energy,
                new_energy, grad) -> bool:
        raise NotImplementedError
