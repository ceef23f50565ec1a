"""Nonlinear test battery — mirrors tests/test_nonlinear_solver.cpp.

The reference's analytic fixtures (Quadratic, Rosenbrock, Sphere, Beale,
defined via a vendored forward-mode autodiff, test_nonlinear_solver.cpp:23-73)
become jax functions here; `jax.grad`/`jax.hessian` replace DScalar2.
Convergence target: ‖x−x*‖ or ‖∇f‖ < 1e-7 (test_nonlinear_solver.cpp:316-326).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from polysolve_tpu.nonlinear import Solver, BoxConstraintSolver, Status
from polysolve_tpu.nonlinear.problem import FunctionProblem
from polysolve_tpu.nonlinear.solver import NonlinearSolverError


# --------------------------------------------------------------------------- #
# fixtures (test_nonlinear_solver.cpp:78-129 + Rosenbrock/Sphere/Beale)       #
# --------------------------------------------------------------------------- #


def quadratic(x):
    return jnp.sum((x - 3.0) ** 2) + jnp.sum(x[:-1] * x[1:]) * 0.1


def rosenbrock(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2)


def sphere(x):
    return jnp.sum(x**2)


def beale(x):
    a, b = x[0], x[1]
    return ((1.5 - a + a * b) ** 2 + (2.25 - a + a * b**2) ** 2
            + (2.625 - a + a * b**3) ** 2)


PROBLEMS = {
    "Sphere": (sphere, 4, np.zeros(4)),
    "Quadratic": (quadratic, 4, None),
    "Rosenbrock": (rosenbrock, 2, np.ones(2)),
    "Beale": (beale, 2, np.array([3.0, 0.5])),
}

SOLVERS = ["Newton", "DenseNewton", "L-BFGS", "BFGS", "GradientDescent", "ADAM"]
LINE_SEARCHES = ["Backtracking", "Armijo", "RobustArmijo", "None"]

LINEAR_PARAMS = {"solver": "Dense::LDLT"}


def _minimize(solver_name, ls, fn, x0, max_iter=2000, strict=True):
    params = {
        "solver": solver_name,
        "max_iterations": max_iter,
        "grad_norm": 1e-9,
        "relative_gradient": 0.0,
        "line_search": {"method": ls},
        "allow_out_of_iterations": True,
    }
    s = Solver.create(params, LINEAR_PARAMS, strict=strict)
    prob = FunctionProblem(fn)
    x = s.minimize(prob, x0)
    return x, s, prob


# --------------------------------------------------------------------------- #
# `nonlinear`: all solvers × line searches × problems × restarts
# (test_nonlinear_solver.cpp:422-426; exceptions tolerated = solver gave up)
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("pname", list(PROBLEMS))
@pytest.mark.parametrize("sname", SOLVERS)
def test_nonlinear_all(sname, pname):
    """Reference semantics (test_nonlinear_solver.cpp:316-326): each random
    restart must either give up (exception / iteration limit — tolerated) or
    actually be at a critical point: no silent wrong convergence. On the
    convex problems the strong solvers must additionally succeed."""
    fn, dim, x_star = PROBLEMS[pname]
    rng = np.random.default_rng(hash((sname, pname)) % 2**31)
    ls = "RobustArmijo" if sname not in ("ADAM",) else "None"
    successes = 0
    for trial in range(3):
        x0 = rng.uniform(-1.5, 1.5, dim)
        try:
            x, s, prob = _minimize(sname, ls, fn, x0)
        except NonlinearSolverError:
            continue  # reference tolerates exceptions in the hard battery
        if not s.status.is_success:
            continue  # iteration limit = gave up (tolerated like a throw)
        g = prob.gradient(x)
        ok = np.linalg.norm(g) < 1e-6 or (
            x_star is not None and np.linalg.norm(x - x_star) < 1e-6
        )
        assert ok, (f"{sname} on {pname}: claimed {s.status} but "
                    f"‖∇f‖={np.linalg.norm(g):.2e}")
        successes += 1
    if pname in ("Sphere", "Quadratic") and sname not in ("ADAM", "GradientDescent"):
        assert successes >= 2, f"{sname} on {pname}: {successes}/3 converged"


# --------------------------------------------------------------------------- #
# `nonlinear-easier`: near-solution starts, exceptions ARE failures
# (test_nonlinear_solver.cpp:491-494)
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("ls", LINE_SEARCHES)
@pytest.mark.parametrize("pname", ["Sphere", "Rosenbrock", "Beale"])
def test_nonlinear_easier(pname, ls):
    fn, dim, x_star = PROBLEMS[pname]
    rng = np.random.default_rng(11)
    x0 = (x_star if x_star is not None else np.zeros(dim)) + \
        0.05 * rng.standard_normal(dim)
    x, s, prob = _minimize("Newton", ls, fn, x0)
    g = prob.gradient(x)
    assert np.linalg.norm(g) < 1e-7 or (
        x_star is not None and np.linalg.norm(x - x_star) < 1e-7
    ), (pname, ls, np.linalg.norm(g))


# --------------------------------------------------------------------------- #
# `nonlinear-fallbacks`: explicit JSON chain (test_nonlinear_solver.cpp:428-483)
# --------------------------------------------------------------------------- #


def test_fallback_chain():
    params = {
        "solver": ["Newton", "RegularizedNewton", "L-BFGS",
                   "StochasticGradientDescent"],
        "max_iterations": 1000,
        "grad_norm": 1e-9,
        "relative_gradient": 0.0,
        "line_search": {"method": "Backtracking"},
        "allow_out_of_iterations": True,
    }
    s = Solver.create(params, LINEAR_PARAMS)
    assert [st.name() for st in s.strategies] == \
        ["Newton", "RegularizedNewton", "L-BFGS", "StochasticGradientDescent"]
    prob = FunctionProblem(rosenbrock)
    x = s.minimize(prob, np.array([-1.2, 1.0]))
    assert np.linalg.norm(x - 1.0) < 1e-6


def test_newton_auto_chain():
    s = Solver.create({"solver": "Newton"}, LINEAR_PARAMS)
    names = [st.name() for st in s.strategies]
    # reference expansion: Newton → ProjectedNewton → RegularizedNewton → GD
    assert names == ["Newton", "ProjectedNewton", "RegularizedNewton",
                     "GradientDescent"]


# --------------------------------------------------------------------------- #
# `nonlinear-gradient-fd` (test_nonlinear_solver.cpp:485-489)
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("mode", ["DirectionalDerivative", "FullFiniteDiff"])
def test_gradient_fd_modes(mode):
    params = {
        "solver": "Newton",
        "grad_norm": 1e-9,
        "relative_gradient": 0.0,
        "advanced": {"apply_gradient_fd": mode},
        "allow_out_of_iterations": True,
    }
    s = Solver.create(params, LINEAR_PARAMS)
    prob = FunctionProblem(sphere)
    x = s.minimize(prob, np.array([1.0, -2.0, 3.0, 0.5]))
    assert np.linalg.norm(x) < 1e-7


# --------------------------------------------------------------------------- #
# box constraints (test_nonlinear_solver.cpp:496-692)
# --------------------------------------------------------------------------- #


def test_box_constraint_scalar_bounds():
    """Minimize sphere shifted to 3 with upper bound 1 → solution pinned at 1."""
    fn = lambda x: jnp.sum((x - 3.0) ** 2)
    params = {
        "solver": "L-BFGS-B",
        "max_iterations": 500,
        "grad_norm": 1e-9,
        "relative_gradient": 0.0,
        "box_constraints": {"bounds": [-1.0, 1.0]},
        "line_search": {"method": "Backtracking"},
        "allow_out_of_iterations": True,
    }
    s = BoxConstraintSolver.create(params)
    prob = FunctionProblem(fn)
    x = s.minimize(prob, np.zeros(4))
    assert np.all(x <= 1.0 + 1e-12)
    assert np.linalg.norm(x - 1.0) < 1e-7
    # projected gradient norm < 1e-7 (reference :550)
    g = prob.gradient(x)
    assert np.linalg.norm(np.clip(x - g, -1, 1) - x) < 1e-7


def test_box_constraint_per_dof_bounds():
    fn = lambda x: jnp.sum((x - 3.0) ** 2)
    n = 4
    lows, highs = [-1.0] * n, [1.0, 2.0, 4.0, 0.5]
    params = {
        "solver": "L-BFGS-B",
        "grad_norm": 1e-9,
        "relative_gradient": 0.0,
        "box_constraints": {"bounds": [lows, highs]},
        "line_search": {"method": "Backtracking"},
        "allow_out_of_iterations": True,
    }
    s = BoxConstraintSolver.create(params)
    x = s.minimize(FunctionProblem(fn), np.zeros(n))
    assert np.allclose(x, [1.0, 2.0, 3.0, 0.5], atol=1e-6)


def test_box_constraint_max_change():
    fn = lambda x: jnp.sum((x - 3.0) ** 2)
    params = {
        "solver": "L-BFGS-B",
        "grad_norm": 1e-9,
        "relative_gradient": 0.0,
        "max_iterations": 500,
        "box_constraints": {"bounds": [-10.0, 10.0], "max_change": 0.25},
        "line_search": {"method": "Backtracking"},
        "allow_out_of_iterations": True,
    }
    s = BoxConstraintSolver.create(params)
    prob = FunctionProblem(fn)
    x = s.minimize(prob, np.zeros(2))
    assert np.linalg.norm(x - 3.0) < 1e-6


def test_mma_with_constraint():
    """MMA with one inequality constraint g(x)=x₀+x₁−1 ≤ 0
    (reference MMA test :623-692)."""
    fn = lambda x: jnp.sum((x - 3.0) ** 2)
    g = FunctionProblem(lambda x: x[0] + x[1] - 1.0)
    params = {
        "solver": "MMA",
        "max_iterations": 300,
        "grad_norm": 1e-7,
        "relative_gradient": 0.0,
        "box_constraints": {"bounds": [0.0, 5.0]},
        "line_search": {"method": "None"},
        "allow_out_of_iterations": True,
    }
    s = BoxConstraintSolver.create(params, constraints=[g])
    x = s.minimize(FunctionProblem(fn), np.array([0.1, 0.1]))
    assert x[0] + x[1] <= 1.0 + 1e-4
    # optimum of the constrained problem is x = (0.5, 0.5)
    assert np.linalg.norm(x - 0.5) < 1e-2


# --------------------------------------------------------------------------- #
# `sample`: sample_along_direction (test_nonlinear_solver.cpp:694-712)        #
# --------------------------------------------------------------------------- #


def test_sample_along_direction():
    prob = FunctionProblem(sphere)
    x = np.zeros(4)  # the optimum
    d = np.ones(4) / 2.0
    alphas, vals = prob.sample_along_direction(x, d, -1, 1, 21)
    mid = len(vals) // 2
    assert np.argmin(vals) == mid  # minimum at the optimum
    assert np.all(np.diff(vals[mid:]) >= 0)  # monotone away from it
    assert np.all(np.diff(vals[:mid + 1]) <= 0)


# --------------------------------------------------------------------------- #
# status / info behavior                                                      #
# --------------------------------------------------------------------------- #


def test_iteration_limit_raises():
    params = {"solver": "GradientDescent", "max_iterations": 2,
              "grad_norm": 1e-16, "relative_gradient": 0.0}
    s = Solver.create(params, LINEAR_PARAMS)
    with pytest.raises(NonlinearSolverError) as ei:
        s.minimize(FunctionProblem(rosenbrock), np.array([-1.2, 1.0]))
    assert ei.value.status == Status.ITERATION_LIMIT


def test_nan_energy_raises():
    fn = lambda x: jnp.where(x[0] > 0.5, jnp.nan, jnp.sum(x**2))
    s = Solver.create({"solver": "GradientDescent",
                       "allow_out_of_iterations": True}, LINEAR_PARAMS)
    with pytest.raises(NonlinearSolverError) as ei:
        s.minimize(FunctionProblem(fn), np.array([1.0, 0.0]))
    assert ei.value.status == Status.NAN_ENCOUNTERED


def test_solver_info_populated():
    x, s, prob = _minimize("Newton", "RobustArmijo", sphere, np.ones(4))
    info = s.get_info()
    assert info["status"] == Status.GRAD_NORM_TOLERANCE.value
    assert info["iterations"] >= 1
    assert "time_obj_fun" in info and "time_line_search" in info
    assert "internal_solver" in info  # Newton's nested linear info


def test_user_stop_callback():
    calls = []

    class P(FunctionProblem):
        def callback(self, criteria, x):
            calls.append(criteria.iterations)
            return criteria.iterations < 3

    s = Solver.create({"solver": "GradientDescent", "grad_norm": 1e-16,
                       "relative_gradient": 0.0,
                       "allow_out_of_iterations": True}, LINEAR_PARAMS)
    s.minimize(P(rosenbrock), np.array([-1.2, 1.0]))
    assert s.status == Status.OBJECTIVE_CUSTOM_STOP
    assert max(calls) == 3


def test_check_convergence_machine():
    """Pin the reference Criteria.cpp:52-89 semantics: strict > on the
    iteration budget, NaN fields never trigger, and the xDeltaDotGrad branch
    returns NotDescentDirection (VERDICT r1 missing #4)."""
    from polysolve_tpu.nonlinear.criteria import (Criteria, Status,
                                                  check_convergence)

    nan = float("nan")
    stop = Criteria(iterations=10, grad_norm=1e-10, first_grad_norm=1e-12,
                    x_delta_dot_grad=-1e-6)
    st = Criteria(iterations=10, grad_norm=1.0, x_delta=nan, rel_x_delta=nan,
                  x_delta_dot_grad=nan, newton_decrement=nan)
    # strict >: iterations == limit does NOT trip the criteria check
    assert check_convergence(st, stop) == Status.CONTINUE
    st.iterations = 11
    assert check_convergence(st, stop) == Status.ITERATION_LIMIT
    # xDeltaDotGrad: direction derivative above the (negative) threshold
    st.iterations = 5
    st.x_delta_dot_grad = -1e-9  # > -1e-6 → numerically not descending
    assert check_convergence(st, stop) == Status.NOT_DESCENT_DIRECTION
    assert Status.NOT_DESCENT_DIRECTION.is_failure
    st.x_delta_dot_grad = -1.0   # clearly descending → continue
    assert check_convergence(st, stop) == Status.CONTINUE
    # iteration 0 uses the tighter first_grad_norm threshold
    st0 = Criteria(iterations=0, grad_norm=1e-11, x_delta=nan,
                   rel_x_delta=nan, x_delta_dot_grad=nan, newton_decrement=nan)
    assert check_convergence(st0, stop) == Status.CONTINUE
    st0.grad_norm = 1e-13
    assert check_convergence(st0, stop).is_success


def test_derivative_along_delta_x_tol_spec_knob():
    """advanced/derivative_along_delta_x_tol wires to stop.x_delta_dot_grad
    (reference Solver.cpp:211) and stops a flat optimization."""
    params = {"solver": "GradientDescent", "grad_norm": 0.0,
              "relative_gradient": 0.0, "max_iterations": 200,
              "allow_out_of_iterations": True,
              "advanced": {"derivative_along_delta_x_tol": 1e-3}}
    s = Solver.create(params, LINEAR_PARAMS)
    s.minimize(FunctionProblem(sphere), np.array([1.0, 1.0]))
    assert s.stop.x_delta_dot_grad == -1e-3
    # gradient descent on a sphere: d·g = -|g|² → stops once |g|² < 1e-3
    assert s.status == Status.NOT_DESCENT_DIRECTION
    assert s.current.iterations < 200
