"""Nonlinear Solver driver (reference nonlinear/Solver.{hpp,cpp}).

The driver is deliberately host-side Python orchestration (like the
reference's C++): the heavy pieces — energy/gradient/Hessian evaluation (JAX,
jit-cached), the Newton linear solve (the full linear stack incl. AMG/Pallas),
and line-search energy evaluations — all run on device.

Faithfully ported behavior:

- factory with multi-strategy expansion (``Newton`` →
  [Newton → ProjectedNewton → RegularizedNewton] + GradientDescent fallback —
  reference Solver.cpp:147-186, Newton.cpp:14-58; an explicit JSON list picks
  its own chain, pinned by the reference's `nonlinear-fallbacks` test);
- the big minimize loop (reference Solver.cpp:254-553, walked in SURVEY.md
  §3.3): energy/grad NaN guards, convergence check *before* the direction
  ("avoid impossible linear solves"), strategy-failure fallback state machine
  (:367-386), non-descent fallback (:405-434), line-search-failure fallback
  (:457-472), revert-to-strongest after ``iterations_per_strategy`` successes
  (:485-503);
- finite-difference gradient verification modes (:624-680);
- per-phase timing + ``solver_info`` (:586-622).
"""

from __future__ import annotations

import logging
import time
from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np

from polysolve_tpu import spec as spec_mod
from polysolve_tpu.nonlinear import descent as descent_mod
from polysolve_tpu.nonlinear.criteria import Criteria, Status, check_convergence
from polysolve_tpu.nonlinear.line_search import create_line_search
from polysolve_tpu.nonlinear.post_step import PostStepData
from polysolve_tpu.nonlinear.problem import Problem
from polysolve_tpu.utils import PhaseTimings, default_logger


class NonlinearSolverError(RuntimeError):
    """Raised on hard failures (NaN, exhausted strategies, iteration limit) —
    the reference throws std::runtime_error with a typed Status message."""

    def __init__(self, status: Status, message: str = ""):
        super().__init__(f"{status.value}: {message}" if message else status.value)
        self.status = status


def build_nonlinear_spec_rules() -> List[Dict[str, Any]]:
    """The nonlinear parameter surface (reference nonlinear-solver-spec.json;
    defaults from BASELINE.md: grad_norm 1e-10, rel 1e-10, first 1e-12,
    max_iterations 500)."""
    f = lambda d, **kw: dict({"type": "float", "default": d}, **kw)
    i = lambda d: {"type": "int", "default": d}
    b = lambda d: {"type": "bool", "default": d}
    tree = {
        "x_delta": f(0.0, min=0),
        "grad_norm": f(1e-10, min=0),
        "first_grad_norm_tol": f(1e-12, min=0),
        "relative_gradient": f(1e-10, min=0),
        "rel_x_delta": f(0.0, min=0),
        "newton_decrement": f(0.0, min=0),
        "max_iterations": i(500),
        "iterations_per_strategy": {"type": ["int", "list"], "default": 5},
        "allow_out_of_iterations": b(False),
        "line_search": {
            # the reference's exact option set (nonlinear-solver-spec.json
            # /line_search/method)
            "method": {"type": "string", "default": "RobustArmijo",
                       "options": ["Armijo", "RobustArmijo", "Backtracking",
                                   "None"]},
            "use_grad_norm_tol": f(1e-6),
            "min_step_size": f(1e-10),
            "max_step_size_iter": i(30),
            "min_step_size_final": f(1e-20),
            "max_step_size_iter_final": i(100),
            "default_init_step_size": f(1.0),
            "step_ratio": f(0.5),
            "c": f(1e-4),
            "delta_relative_tolerance": f(0.1),
        },
        "advanced": {
            "f_delta": f(0.0, min=0),
            "f_delta_step_tol": i(100),
            "derivative_along_delta_x_tol": f(0.0),
            "apply_gradient_fd": {"type": "string", "default": "None",
                                  "options": ["None", "DirectionalDerivative",
                                              "FullFiniteDiff"]},
            "gradient_fd_eps": f(1e-7),
        },
        "Newton": {
            "residual_tolerance": f(1e-5),
            "use_psd_projection": b(True),
            "force_psd_projection": b(False),
            "use_regularization": b(True),
            # whether the chain's RegularizedNewton stage also projects to
            # PSD (reference nonlinear-solver-spec.json /Newton/
            # use_psd_projection_in_regularized, Newton.cpp:47-52)
            "use_psd_projection_in_regularized": b(True),
        },
        "RegularizedNewton": {
            "reg_weight_min": f(1e-8),
            "reg_weight_max": f(1e8),
            "reg_weight_inc": f(10.0),
        },
        "L-BFGS": {"history_size": i(6)},
        "BFGS": {},
        "ADAM": {
            "alpha_learning_rate": f(0.001),
            "beta_1": f(0.9),
            "beta_2": f(0.999),
            "epsilon": f(1e-8),
        },
        "StochasticADAM": {
            "alpha_learning_rate": f(0.001),
            "beta_1": f(0.9),
            "beta_2": f(0.999),
            "epsilon": f(1e-8),
            "erase_component_probability": f(0.3),
        },
        "StochasticGradientDescent": {"erase_component_probability": f(0.3)},
        "GradientDescent": {},
        "MMA": {
            "asyinit": f(0.5),
            "asyincr": f(1.2),
            "asydecr": f(0.7),
        },
        "L-BFGS-B": {"history_size": i(6)},
        "box_constraints": {
            "bounds": {"type": ["list", "list_of_float"], "default": []},
            "max_change": {"type": ["float", "list", "list_of_float"],
                           "default": -1.0},
        },
        # string | list of names | list of {"type": ..., ...} objects
        # (reference nonlinear-solver-spec.json:310-515)
        "solver": {"type": ["string", "list_of_str", "list"],
                   "default": "Newton"},
        # gradient-norm flavor for convergence + line search (reference
        # /norm_type, Solver.cpp:223; Euclidean == L2 here — no mesh mass
        # matrix exists at this library layer, as in the reference default)
        "norm_type": {"type": "string", "default": "L2",
                      "options": ["Euclidean", "L2", "Linf"]},
    }
    return spec_mod.rules_for_subtree("/", tree)


class Solver:
    """The minimize driver. Use :meth:`create` (JSON factory) or construct
    directly with a strategy list."""

    # ------------------------------------------------------------------ #
    # factory                                                            #
    # ------------------------------------------------------------------ #

    @classmethod
    def create(
        cls,
        solver_params: Optional[Dict[str, Any]] = None,
        linear_solver_params: Optional[Dict[str, Any]] = None,
        characteristic_length: float = 1.0,
        logger: Optional[logging.Logger] = None,
        strict: bool = True,
        norm_type=None,
    ) -> "Solver":
        """Factory (reference Solver.hpp:37-43: create(solver_params,
        linear_solver_params, characteristic_length, logger, strict,
        norm_type))."""
        logger = logger or default_logger
        from polysolve_tpu.nonlinear import compat

        params = spec_mod.validate_and_inject(
            compat.translate_reference_config(solver_params),
            build_nonlinear_spec_rules(), strict=strict, logger=logger,
        )
        solver = params.get("solver", "Newton")
        names = solver if isinstance(solver, list) else None
        strategies = []

        def make(name: str, overrides: Optional[Dict[str, Any]] = None):
            name = "L-BFGS" if name == "LBFGS" else name
            if name not in descent_mod.STRATEGIES:
                raise ValueError(f"Unrecognized solver type: {name}")
            cls_ = descent_mod.STRATEGIES[name]
            sub = dict(params.get(name, {}))
            if issubclass(cls_, descent_mod.Newton):
                merged = dict(params.get("Newton", {}))
                if issubclass(cls_, descent_mod.RegularizedNewton):
                    merged.update(params.get("RegularizedNewton", {}))
                merged.update(params.get(name, {}))
                merged.update(overrides or {})
                return cls_(merged, logger,
                            linear_solver_params=linear_solver_params,
                            characteristic_length=characteristic_length)
            sub.update(overrides or {})
            return cls_(sub, logger)

        if names is None:
            # single name → expanded chain (reference Newton.cpp:14-58)
            if solver in ("Newton", "DenseNewton"):
                pre = "Dense" if solver == "DenseNewton" else ""
                newton_params = params.get("Newton", {})
                force_psd = bool(newton_params.get("force_psd_projection", False))
                use_psd = bool(newton_params.get("use_psd_projection", True))
                use_reg = bool(newton_params.get("use_regularization", True))
                psd_in_reg = bool(newton_params.get(
                    "use_psd_projection_in_regularized", True))
                if not force_psd:
                    strategies.append(make(solver))
                if use_psd or force_psd:
                    strategies.append(make(pre + "ProjectedNewton"))
                if use_reg:
                    strategies.append(make(
                        pre + ("RegularizedProjectedNewton" if psd_in_reg
                               else "RegularizedNewton")))
                strategies.append(make("GradientDescent"))
            elif solver == "GradientDescent":
                strategies.append(make(solver))
            else:
                strategies.append(make(solver))
                strategies.append(make("GradientDescent"))
        else:
            # explicit list = explicit chain (nonlinear-fallbacks test).
            # Entries are names or reference-style {"type": ..., ...} objects
            # (nonlinear-solver-spec.json:310-515, Solver.cpp:146-156)
            for entry in names:
                if isinstance(entry, dict):
                    if "type" not in entry:
                        raise spec_mod.SpecError(
                            "solver chain object missing 'type': %r" % (entry,))
                    strategies.append(make(
                        str(entry["type"]),
                        {k: v for k, v in entry.items() if k != "type"}))
                else:
                    strategies.append(make(entry))

        line_search = create_line_search(params.get("line_search", {}), logger)
        solver = cls(strategies, line_search, params,
                     characteristic_length=characteristic_length, logger=logger)
        # config-driven norm_type (reference Solver.cpp:223) — an explicit
        # factory argument wins; absent both, the problem's own norm stands
        if norm_type is None and "norm_type" in (solver_params or {}):
            from polysolve_tpu.nonlinear.problem import NormType

            norm_type = {"Euclidean": NormType.EUCLIDEAN, "L2": NormType.L2,
                         "Linf": NormType.LINF}[params["norm_type"]]
        solver.norm_type = norm_type
        return solver

    # ------------------------------------------------------------------ #

    def __init__(self, strategies: Sequence, line_search, params: Dict[str, Any],
                 characteristic_length: float = 1.0,
                 logger: Optional[logging.Logger] = None):
        if not strategies:
            raise ValueError("at least one descent strategy required")
        self.strategies = list(strategies)
        self.m_line_search = line_search
        self.params = params
        self.characteristic_length = float(characteristic_length)
        self.logger = logger or default_logger
        self.stop = Criteria()
        self.current = Criteria()
        self.status = Status.NOT_STARTED
        self.allow_out_of_iterations = bool(params.get("allow_out_of_iterations",
                                                       False))
        adv = params.get("advanced", {})
        self.f_delta_step_tol = int(adv.get("f_delta_step_tol", 100))
        self.gradient_fd_strategy = adv.get("apply_gradient_fd", "None")
        self.gradient_fd_eps = float(adv.get("gradient_fd_eps", 1e-7))
        ips = params.get("iterations_per_strategy", 5)
        if isinstance(ips, list):
            self.iterations_per_strategy = [int(v) for v in ips]
        else:
            self.iterations_per_strategy = [int(ips)] * len(self.strategies)
        self.timings = PhaseTimings()
        self.solver_info: Dict[str, Any] = {}
        self._reset_stop_criteria()

    def add_strategy(self, strategy) -> None:
        """Append a fallback strategy (reference Solver.hpp:61)."""
        self.strategies.append(strategy)
        self.iterations_per_strategy.append(self.iterations_per_strategy[-1])

    # ------------------------------------------------------------------ #

    def _reset_stop_criteria(self) -> None:
        """Tolerance rescaling by characteristic length
        (reference Solver.hpp:109-121)."""
        p = self.params
        L = self.characteristic_length
        self.stop = Criteria(
            iterations=int(p.get("max_iterations", 500)),
            x_delta=float(p.get("x_delta", 0.0)) * L,
            f_delta=float(p.get("advanced", {}).get("f_delta", 0.0)) * L,
            grad_norm=float(p.get("grad_norm", 1e-10)) * L,
            first_grad_norm=float(p.get("first_grad_norm_tol", 1e-12)) * L,
            rel_x_delta=float(p.get("rel_x_delta", 0.0)),
            rel_grad_norm=float(p.get("relative_gradient", 1e-10)),
            newton_decrement=float(p.get("newton_decrement", 0.0)) * L,
            # reference Solver.cpp:211: stop.xDeltaDotGrad =
            # -advanced/derivative_along_delta_x_tol (rescaled, Solver.hpp:117)
            x_delta_dot_grad=-float(
                p.get("advanced", {}).get("derivative_along_delta_x_tol", 0.0)) * L,
        )

    def _reset(self, ndof: int) -> None:
        self.current = Criteria()
        self.status = Status.CONTINUE
        self._descent_strategy = 0
        self._strategy_success_streak = 0
        self._initial_x_delta = None
        for s in self.strategies:
            s.reset(ndof)
        self.timings = PhaseTimings()
        self.solver_info = {}

    def _grad_norm_for_convergence(self, problem: Problem, x: np.ndarray,
                                   grad: np.ndarray) -> float:
        """Convergence measure; BoxConstraintSolver overrides with the
        projected-gradient norm (BoxConstraintSolver.cpp:96-110)."""
        return problem.gradient_norm(grad)

    # ------------------------------------------------------------------ #
    # gradient verification (reference Solver.cpp:624-680)               #
    # ------------------------------------------------------------------ #

    def _verify_gradient(self, problem: Problem, x: np.ndarray,
                         grad: np.ndarray) -> None:
        if self.gradient_fd_strategy == "None":
            return
        eps = self.gradient_fd_eps
        if self.gradient_fd_strategy == "DirectionalDerivative":
            rng = np.random.default_rng(0)
            d = rng.standard_normal(len(x))
            d /= np.linalg.norm(d)
            fd = (problem.value(x + eps * d) - problem.value(x - eps * d)) / (2 * eps)
            an = float(grad @ d)
            if abs(fd - an) > 10 * eps * (1 + abs(an)):
                self.logger.warning(
                    "gradient verification failed: directional fd %.6e vs analytic %.6e",
                    fd, an)
        elif self.gradient_fd_strategy == "FullFiniteDiff":
            fd = np.empty_like(grad)
            for i in range(len(x)):
                e = np.zeros_like(x)
                e[i] = eps
                fd[i] = (problem.value(x + e) - problem.value(x - e)) / (2 * eps)
            err = np.linalg.norm(fd - grad)
            if err > 10 * eps * (1 + np.linalg.norm(grad)):
                self.logger.warning(
                    "gradient verification failed: full fd error %.6e", err)

    # ------------------------------------------------------------------ #
    # the big loop (reference Solver.cpp:254-553; SURVEY.md §3.3)        #
    # ------------------------------------------------------------------ #

    norm_type = None  # optional NormType override applied to the problem

    def minimize(self, problem: Problem, x: np.ndarray) -> np.ndarray:
        x = np.array(x, dtype=np.float64)
        if self.norm_type is not None:
            problem.norm_type = self.norm_type
        t_start = time.perf_counter()
        self._reset_stop_criteria()
        self._reset(len(x))

        with self.timings.scope("constraint_set_update"):
            problem.solution_changed(x)

        def fail(status: Status, msg: str = ""):
            self.status = status
            self._update_solver_info(time.perf_counter() - t_start)
            raise NonlinearSolverError(status, msg)

        while True:
            on_last_strategy = self._descent_strategy == len(self.strategies) - 1
            strategy = self.strategies[self._descent_strategy]

            # -- energy (reference :296-307)
            with self.timings.scope("obj_fun"):
                energy = problem.value(x)
            if not np.isfinite(energy):
                fail(Status.NAN_ENCOUNTERED, "energy is NaN/inf")
            # -- gradient (:312-320)
            with self.timings.scope("grad"):
                grad = np.asarray(problem.gradient(x), dtype=np.float64)
            if not np.all(np.isfinite(grad)):
                fail(Status.NAN_ENCOUNTERED, "gradient has NaN/inf")
            self._verify_gradient(problem, x, grad)

            grad_norm = self._grad_norm_for_convergence(problem, x, grad)
            self.current.energy = energy
            self.current.grad_norm = grad_norm
            if self.current.iterations == 0:
                self.current.first_grad_norm = grad_norm
            self.current.rel_grad_norm = grad_norm / max(
                self.current.first_grad_norm, 1e-300)

            # -- convergence check #1, before the direction (:322-346).
            # Direction-dependent fields are NaN'd so only gradient tests can
            # fire here ("avoid impossible linear solves", Solver.cpp:339-343).
            nan = float("nan")
            self.current.x_delta = nan
            self.current.x_delta_dot_grad = nan
            self.current.rel_x_delta = nan
            self.current.newton_decrement = nan
            self.status = check_convergence(self.current, self.stop,
                                            self.f_delta_step_tol)
            if self.status != Status.CONTINUE:
                break

            # -- update direction (:350-354)
            with self.timings.scope("update_direction"):
                direction = strategy.compute_update_direction(problem, x, grad)

            bad = direction is None or not np.all(np.isfinite(direction))
            if not bad:
                # xDelta = unscaled step norm, computed right after the
                # direction (reference Solver.cpp:356-365); relXDelta is
                # relative to the FIRST iteration's step norm.
                self.current.x_delta = float(np.linalg.norm(direction))
                if self._initial_x_delta is None:
                    self._initial_x_delta = self.current.x_delta
                self.current.rel_x_delta = self.current.x_delta / max(
                    self._initial_x_delta, 1e-300)
                # Guarded against fp64 overflow on extreme steps (an inf
                # here would feed the non-descent fallback decision and the
                # newton-decrement sqrt, reference Solver.cpp:405-434): the
                # dot runs on inf-norm-normalized vectors (each factor ≤ 1,
                # no numpy overflow warning) and the rescale is clamped to
                # the finite range with the sign preserved.
                d_inf = float(np.max(np.abs(direction))) or 1.0
                g_inf = float(np.max(np.abs(grad))) or 1.0
                unit_dot = float((direction / d_inf) @ (grad / g_inf))
                fmax = float(np.finfo(np.float64).max)
                self.current.x_delta_dot_grad = float(
                    np.clip(unit_dot * d_inf * g_inf, -fmax, fmax))
                # non-descent rejection only for strategies that promise
                # descent (Solver.cpp:405: also requires gradNorm != 0)
                if strategy.is_direction_descent() and grad_norm != 0 and \
                        self.current.x_delta_dot_grad >= 0:
                    bad = True
            if bad:
                # strategy failure path (:367-386, :405-434)
                if strategy.handle_error():
                    continue  # retry same strategy (e.g. increased reg weight)
                if on_last_strategy:
                    fail(Status.UPDATE_DIRECTION_FAILED
                         if direction is None or not np.all(np.isfinite(direction))
                         else Status.NOT_DESCENT_DIRECTION,
                         f"strategy {strategy.name()} failed on last fallback")
                self.logger.debug("strategy %s failed; falling back", strategy.name())
                self._descent_strategy += 1
                self._strategy_success_streak = 0
                continue

            # -- optional Newton decrement (:390-403)
            if self.stop.newton_decrement > 0:
                self.current.newton_decrement = float(
                    np.sqrt(max(-self.current.x_delta_dot_grad, 0.0)))

            # -- convergence check #2 (:436-441)
            self.status = check_convergence(self.current, self.stop,
                                            self.f_delta_step_tol)
            if self.status != Status.CONTINUE:
                break

            # -- line search (:450-455)
            self.m_line_search.is_final_strategy = on_last_strategy
            with self.timings.scope("line_search"):
                rate = self.m_line_search.line_search(x, direction, problem)
            if not np.isfinite(rate):
                if strategy.handle_error():
                    continue
                if on_last_strategy:
                    fail(Status.LINE_SEARCH_FAILED,
                         f"line search failed for {strategy.name()}")
                self.logger.debug("line search failed for %s; falling back",
                                  strategy.name())
                self._descent_strategy += 1
                self._strategy_success_streak = 0
                continue

            # -- accept step (:474-479)
            new_x = x + rate * direction
            problem.after_line_search_custom_operation(x, new_x)
            with self.timings.scope("constraint_set_update"):
                problem.solution_changed(new_x)
            new_energy = problem.value(new_x)

            # fDelta counting happens at the loop bottom (Solver.cpp:522);
            # xDelta stays the unscaled direction norm set above.
            self.current.f_delta = abs(new_energy - energy)
            self.current.f_delta_count = (
                self.current.f_delta_count + 1
                if self.stop.f_delta > 0 and self.current.f_delta < self.stop.f_delta
                else 0)
            x = new_x
            strategy.update_solution(x, grad)

            # -- strategy bookkeeping: revert to the strongest strategy after
            #    a success streak (:485-503)
            if self._descent_strategy != 0:
                self._strategy_success_streak += 1
                if self._strategy_success_streak >= \
                        self.iterations_per_strategy[self._descent_strategy]:
                    self.logger.debug("reverting to strategy 0 after %d successes",
                                      self._strategy_success_streak)
                    self._descent_strategy = 0
                    self._strategy_success_streak = 0

            self.current.iterations += 1
            self._update_solver_info(time.perf_counter() - t_start)
            problem.post_step(PostStepData(self.current.iterations,
                                           self.solver_info, x, grad))

            # -- user stop (:516-520)
            if problem.stop(x):
                self.status = Status.OBJECTIVE_CUSTOM_STOP
                break
            if not problem.callback(self.current, x):
                self.status = Status.OBJECTIVE_CUSTOM_STOP
                break
            # -- iteration budget, set at the loop bottom with >= after the
            #    increment (reference Solver.cpp:528-529)
            if self.stop.iterations > 0 and \
                    self.current.iterations >= self.stop.iterations:
                self.status = Status.ITERATION_LIMIT
                break

        # -- post-loop status handling (:538-539)
        total = time.perf_counter() - t_start
        self._update_solver_info(total)
        if self.status == Status.ITERATION_LIMIT and not self.allow_out_of_iterations:
            raise NonlinearSolverError(Status.ITERATION_LIMIT,
                                       f"reached {self.stop.iterations} iterations")
        self.logger.debug("minimize finished: %s | %s", self.status.value,
                          self.current.print())
        return x

    # ------------------------------------------------------------------ #

    def _update_solver_info(self, total_time: float) -> None:
        """solver_info json (reference Solver.cpp:586-622)."""
        it = max(self.current.iterations, 1)
        info = {
            "status": self.status.value,
            "energy": self.current.energy,
            "iterations": self.current.iterations,
            "grad_norm": self.current.grad_norm,
            "x_delta": self.current.x_delta,
            "f_delta": self.current.f_delta,
            "total_time": total_time,
            "descent_strategy": self.strategies[self._descent_strategy].name(),
            "line_search_iterations": getattr(self.m_line_search, "iterations", 0),
        }
        info.update(self.timings.as_dict(per=it))
        for s in self.strategies:
            if "internal_solver" in s.info:
                info["internal_solver"] = s.info["internal_solver"]
        self.solver_info = info

    def get_info(self) -> Dict[str, Any]:
        return dict(self.solver_info)
