"""Linear-solver facade: abstract ``Solver`` + name-keyed registry + JSON
factory (the reference's L2 layer, src/polysolve/linear/Solver.{hpp,cpp}).

Differences from the reference, by design:

- the ``#ifdef POLYSOLVE_WITH_*`` if/else chain (Solver.cpp:310-499) becomes a
  runtime registry; availability == registry contents;
- every reference backend name is accepted as an **alias** of the TPU-native
  solver that takes over its role (e.g. ``Eigen::CholmodSupernodalLLT`` →
  ``SparseCholesky``, ``Hypre``/``AMGCL`` → ``AMG``), so existing polysolve
  JSON configs keep working;
- ``solve(b, x)`` returns the solution instead of writing through a reference,
  but still honors ``x`` as the initial guess for iterative solvers
  (contract in reference Solver.hpp:120-127).

Factory pipeline (reference Solver.cpp:145-167):
``create(params)`` → spec validation → ``apply_default_solver`` →
``select_valid_solver`` (priority lists / overwrite fallback,
Solver.cpp:101-143) → default injection → instantiation → ``set_parameters``.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence, Type, Union

import numpy as np
import scipy.sparse as sp

from polysolve_tpu import spec as spec_mod
from polysolve_tpu.utils import default_logger

# --------------------------------------------------------------------------- #
# Registry                                                                    #
# --------------------------------------------------------------------------- #

_SOLVERS: Dict[str, Type["Solver"]] = {}
_ALIASES: Dict[str, str] = {}


def register_solver(name: str, aliases: Sequence[str] = ()):
    """Class decorator registering a solver under ``name`` (+ aliases)."""

    def deco(cls: Type["Solver"]) -> Type["Solver"]:
        cls.canonical_name = name
        _SOLVERS[name] = cls
        for a in aliases:
            _ALIASES[a] = name
        return cls

    return deco


def resolve_solver_name(name: str) -> Optional[str]:
    if name in _SOLVERS:
        return name
    return _ALIASES.get(name)


def resolve_precond_name(name: str) -> Optional[str]:
    from polysolve_tpu.linear import preconditioners

    return preconditioners.resolve(name)


def available_solvers() -> List[str]:
    """All accepted solver names, canonical + aliases
    (reference Solver.cpp:504-571)."""
    return sorted(_SOLVERS.keys()) + sorted(_ALIASES.keys())


def available_preconds() -> List[str]:
    from polysolve_tpu.linear import preconditioners

    return preconditioners.names()


def default_solver() -> str:
    """Preferred default (reference priority Pardiso → AccelerateLDLT → Hypre
    → Eigen::BiCGSTAB, Solver.cpp:573-589; here the sparse direct Cholesky,
    falling back to BiCGSTAB)."""
    for cand in ("SparseCholesky", "BiCGSTAB"):
        if cand in _SOLVERS:
            return cand
    return next(iter(_SOLVERS))


def default_precond() -> str:
    """Reference default "Eigen::DiagonalPreconditioner" (Solver.cpp:608-612)
    → Jacobi."""
    return "Jacobi"


# --------------------------------------------------------------------------- #
# Abstract Solver                                                             #
# --------------------------------------------------------------------------- #


class Solver:
    """Abstract linear solver (reference Solver.hpp:31-132).

    Lifecycle: ``analyze_pattern(A)`` (symbolic — ordering / partition /
    format selection) → ``factorize(A)`` (numeric — may be called many times
    for the same pattern: the symbolic/numeric split contract pinned by the
    reference's ``pre_factor`` test, test_linear_solver.cpp:241-307) →
    ``solve(b, x)``.
    """

    canonical_name: str = "Solver"

    def __init__(self):
        self.params: Dict[str, Any] = {}
        self.logger: logging.Logger = default_logger
        self.block_size: int = 1
        self.nullspace: Optional[np.ndarray] = None
        self._created_name: Optional[str] = None

    # -- identity ---------------------------------------------------------- #

    def name(self) -> str:
        """The name used at creation (aliases round-trip —
        reference test_linear_solver.cpp name() checks)."""
        return self._created_name or self.canonical_name

    def is_dense(self) -> bool:
        return False

    # -- configuration (reference Solver.hpp:88-117) ----------------------- #

    def set_parameters(self, params: Dict[str, Any]) -> None:
        """Read this solver's subtree ``params[self.name()]`` (falling back to
        the canonical name — per-solver json subtree convention, reference
        EigenSolver.tpp:68-82)."""
        for key in (self._created_name, self.canonical_name):
            if key and key in params and isinstance(params[key], dict):
                self.params.update(params[key])
                break

    def set_block_size(self, block_size: int) -> None:
        self.block_size = int(block_size)

    def set_is_nullspace(self, nullspace: np.ndarray) -> None:
        """Near-nullspace / rigid-body-mode vectors (reference
        Solver.hpp:114, used by Hypre GM interpolation HypreSolver.cpp:191-272;
        here fed to the AMG tentative prolongator)."""
        self.nullspace = np.asarray(nullspace)

    def set_tolerance(self, tol: float) -> None:
        self.params["tolerance"] = float(tol)

    # -- info --------------------------------------------------------------- #

    def get_info(self) -> Dict[str, Any]:
        return {}

    # -- lifecycle ---------------------------------------------------------- #

    def analyze_pattern(self, A: sp.spmatrix, precond_num: int = 0) -> None:
        """Symbolic phase."""

    def factorize(self, A: sp.spmatrix) -> None:
        """Numeric phase."""
        raise NotImplementedError

    def analyze_pattern_dense(self, A: np.ndarray, precond_num: int = 0) -> None:
        self.analyze_pattern(sp.csr_matrix(np.asarray(A)), precond_num)

    def factorize_dense(self, A: np.ndarray) -> None:
        self.factorize(sp.csr_matrix(np.asarray(A)))

    def solve(self, b: np.ndarray, x: Optional[np.ndarray] = None) -> np.ndarray:
        """Solve A x = b. ``x`` is the initial guess for iterative solvers
        (reference Solver.hpp:120-127). Multi-RHS supported where the backend
        allows (b of shape (n, k))."""
        raise NotImplementedError

    # -- factories ---------------------------------------------------------- #

    @staticmethod
    def create(
        params: Union[str, Dict[str, Any], None] = None,
        logger: Optional[logging.Logger] = None,
        strict: bool = True,
        precond: Optional[str] = None,
    ) -> "Solver":
        """Create from a JSON dict (validated + defaults injected) or a plain
        solver-name string (reference Solver.cpp:145-167 and :310-499)."""
        logger = logger or default_logger
        if params is None:
            params = {}
        if isinstance(params, str):
            return _instantiate(params, precond or default_precond(), {}, logger)

        # reference-config compatibility: a genuine polyfem AMGCL/Hypre
        # nested subtree (AMGCL.cpp:32-92) is translated to canonical params
        # BEFORE validation, so unmodified reference configs pass strict mode
        from polysolve_tpu.linear import compat

        params = compat.translate_reference_params(params, strict=strict,
                                                    logger=logger)
        rules = build_linear_spec_rules()
        params = spec_mod.validate_and_inject(params, rules, strict=strict, logger=logger)
        params = _apply_default_solver(params, logger)
        params = _select_valid_solver(params, logger)
        name = params["solver"]
        pname = params.get("precond") or default_precond()
        solver = _instantiate(name, pname, params, logger)
        return solver


def _instantiate(name: str, precond: str, params: Dict[str, Any],
                 logger: logging.Logger) -> "Solver":
    canonical = resolve_solver_name(name)
    if canonical is None:
        raise ValueError(f"Unrecognized solver type: {name}")  # Solver.cpp:498
    pcanonical = resolve_precond_name(precond)
    if pcanonical is None:
        raise ValueError(f"Unrecognized preconditioner type: {precond}")
    cls = _SOLVERS[canonical]
    solver = cls()
    solver._created_name = name
    solver.logger = logger
    solver.precond_name = pcanonical
    solver.set_parameters(params)
    return solver


# --------------------------------------------------------------------------- #
# Spec assembly + solver selection                                            #
# --------------------------------------------------------------------------- #


def build_linear_spec_rules() -> List[Dict[str, Any]]:
    """Assemble the full linear spec: top-level rules + every registered
    solver's parameter subtree (replaces the embedded
    linear-solver-spec.json; the accepted config shape is identical)."""
    all_names = available_solvers()
    top_children = sorted({c.canonical_name for c in _SOLVERS.values()}
                          | set(_ALIASES.keys()))
    rules: List[Dict[str, Any]] = [
        {
            "pointer": "/",
            "type": "object",
            "optional": ["solver", "precond", "enable_overwrite_solver"] + top_children,
        },
        {
            "pointer": "/solver",
            "type": ["string", "list_of_str"],
            "default": "",
        },
        {"pointer": "/precond", "type": "string", "default": ""},
        {"pointer": "/enable_overwrite_solver", "type": "bool", "default": False},
    ]
    done = set()
    for cname, cls in _SOLVERS.items():
        tree = cls.param_tree() if hasattr(cls, "param_tree") else {}
        for label in [cname] + [a for a, c in _ALIASES.items() if c == cname]:
            if label in done:
                continue
            done.add(label)
            rules.extend(spec_mod.rules_for_subtree("/" + label, tree))
    return rules


def _apply_default_solver(params: Dict[str, Any], logger) -> Dict[str, Any]:
    """Fill empty solver/precond with availability-based defaults
    (reference apply_default_solver, Solver.cpp:83-99)."""
    if not params.get("solver"):
        params["solver"] = default_solver()
    if not params.get("precond"):
        params["precond"] = default_precond()
    return params


def _select_valid_solver(params: Dict[str, Any], logger) -> Dict[str, Any]:
    """Priority-list selection + overwrite fallback
    (reference select_valid_solver, Solver.cpp:101-143)."""
    solver = params["solver"]
    candidates = solver if isinstance(solver, list) else [solver]
    chosen = None
    for cand in candidates:
        if resolve_solver_name(cand) is not None:
            chosen = cand
            break
        logger.warning("solver %s is not available; trying next", cand)
    if chosen is None:
        if params.get("enable_overwrite_solver"):
            chosen = default_solver()
            logger.warning("no requested solver available; falling back to %s", chosen)
        else:
            raise ValueError(f"no valid solver in {candidates!r}")
    params["solver"] = chosen
    return params
