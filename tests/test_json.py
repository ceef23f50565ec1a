"""JSON ⇄ array shape semantics (reference tests/test_json.cpp:12-101) and
spec-validation behavior (reference jse layer, linear Solver.cpp:145-161)."""

import numpy as np
import pytest

from polysolve_tpu.json_utils import array_to_json, json_to_array
from polysolve_tpu.spec import SpecError, validate_and_inject, rules_for_subtree
from polysolve_tpu.linear.solver import build_linear_spec_rules


def test_scalar_to_vector():
    v = json_to_array(3.5)
    assert v.shape == (1,) and v[0] == 3.5


def test_flat_list_to_vector():
    v = json_to_array([1, 2, 3])
    assert v.shape == (3,)
    assert np.allclose(v, [1, 2, 3])


def test_nested_to_matrix():
    M = json_to_array([[1, 2], [3, 4], [5, 6]])
    assert M.shape == (3, 2)
    assert M[2, 1] == 6


def test_ragged_raises():
    with pytest.raises(ValueError):
        json_to_array([[1, 2], [3]])


def test_round_trip_vector():
    v = np.array([1.0, 2.0, 3.0])
    assert json_to_array(array_to_json(v)).shape == (3,)
    assert np.allclose(json_to_array(array_to_json(v)), v)


def test_round_trip_matrix():
    M = np.arange(6.0).reshape(2, 3)
    back = json_to_array(array_to_json(M))
    assert back.shape == (2, 3)
    assert np.allclose(back, M)


# --------------------------------------------------------------------------- #
# spec engine                                                                 #
# --------------------------------------------------------------------------- #


def test_defaults_injected():
    out = validate_and_inject({}, build_linear_spec_rules())
    assert out["solver"] == ""
    assert out["enable_overwrite_solver"] is False


def test_unknown_key_strict_raises():
    with pytest.raises(SpecError):
        validate_and_inject({"bogus_key": 1}, build_linear_spec_rules(), strict=True)


def test_unknown_key_lenient_kept():
    out = validate_and_inject({"bogus_key": 1}, build_linear_spec_rules(), strict=False)
    assert out["bogus_key"] == 1


def test_type_violation():
    with pytest.raises(SpecError):
        validate_and_inject({"solver": 17}, build_linear_spec_rules())


def test_solver_subtree_defaults():
    out = validate_and_inject({"CG": {"max_iter": 7}}, build_linear_spec_rules())
    assert out["CG"]["max_iter"] == 7
    assert out["CG"]["tolerance"] == 1e-12  # spec default injected


def test_rules_for_subtree():
    rules = rules_for_subtree("/X", {"a": {"type": "int", "default": 1},
                                     "sub": {"b": {"type": "float", "default": 2.0}}})
    pointers = {r["pointer"] for r in rules}
    assert pointers == {"/X", "/X/a", "/X/sub", "/X/sub/b"}


def test_min_max_bounds():
    rules = [
        {"pointer": "/", "type": "object", "optional": ["x"]},
        {"pointer": "/x", "type": "float", "default": 0.5, "min": 0, "max": 1},
    ]
    assert validate_and_inject({"x": 0.7}, rules)["x"] == 0.7
    with pytest.raises(SpecError):
        validate_and_inject({"x": 2.0}, rules)
