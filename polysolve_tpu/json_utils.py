"""JSON ⇄ array conversions with the reference's shape semantics
(reference src/polysolve/JSONUtils.hpp:8-76, pinned by tests/test_json.cpp:12-101):

- a scalar JSON number deserializes into a 1×1 matrix / length-1 vector;
- a flat JSON list deserializes into a column vector (or row vector if the
  target is a row type — here: 1-D array);
- a list of lists deserializes into a 2-D matrix (each inner list a row);
- serialization is the inverse: 1-D arrays -> flat lists, 2-D -> nested lists.
"""

from __future__ import annotations

from typing import Any, Union

import numpy as np

ArrayLike = Union[np.ndarray, list, tuple, int, float]


def json_to_array(value: Any, dtype=np.float64) -> np.ndarray:
    """Deserialize a JSON value into a numpy array.

    Scalar -> shape (1,);  flat list -> shape (n,);  nested list -> shape (r, c).
    """
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        return np.array([value], dtype=dtype)
    if isinstance(value, (list, tuple)):
        if len(value) == 0:
            return np.zeros((0,), dtype=dtype)
        if isinstance(value[0], (list, tuple)):
            rows = [list(r) for r in value]
            ncols = len(rows[0])
            if any(len(r) != ncols for r in rows):
                raise ValueError("ragged nested JSON array")
            return np.array(rows, dtype=dtype)
        return np.array(value, dtype=dtype)
    raise TypeError(f"cannot convert JSON value of type {type(value)} to array")


def array_to_json(arr: ArrayLike) -> Any:
    """Serialize an array: 1-D -> flat list, 2-D -> nested lists
    (row-major, like the reference's adl_serializer — JSONUtils.hpp:44-71)."""
    a = np.asarray(arr)
    if a.ndim == 0:
        return a.item()
    if a.ndim == 1:
        return [x.item() for x in a]
    if a.ndim == 2:
        # a 2-D matrix that is a single column/row still serializes as nested
        return [[x.item() for x in row] for row in a]
    raise ValueError(f"cannot serialize {a.ndim}-D array to JSON")
