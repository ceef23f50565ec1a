"""JSE-style JSON parameter validation + default injection.

The reference embeds two JSON spec files at build time and validates every
config against them, injecting defaults (reference linear Solver.cpp:145-161,
nonlinear Solver.cpp:134-143; specs linear-solver-spec.json /
nonlinear-solver-spec.json). This module is the runtime equivalent: a compact
rule engine with the same semantics —

- rules are keyed by JSON pointer (``/``, ``/solver``, ``/AMG/tolerance`` ...);
- each rule declares ``type`` (or list of admissible types), optional
  ``default``, ``options``, ``min``/``max``;
- object rules declare ``required`` / ``optional`` child key lists;
- ``strict`` mode raises on unknown keys or violations, lenient mode logs a
  warning and drops/keeps them (reference Solver.cpp:149-159).

Validated output is a *new* dict with all defaults injected.
"""

from __future__ import annotations

import copy
import logging
from typing import Any, Dict, List, Optional, Sequence

_TYPES = {
    "object": dict,
    "string": str,
    "bool": bool,
    "list": list,
}


class SpecError(ValueError):
    """Config failed spec validation (reference throws from
    Solver.cpp:152-158 with the JSE log)."""


def _type_ok(value: Any, t: str) -> bool:
    if t == "float":
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if t == "int":
        return isinstance(value, int) and not isinstance(value, bool)
    if t == "list_of_str":
        return isinstance(value, list) and all(isinstance(v, str) for v in value)
    if t == "list_of_float":
        return isinstance(value, list) and all(
            isinstance(v, (int, float)) and not isinstance(v, bool) for v in value
        )
    if t == "any":
        return True
    py = _TYPES.get(t)
    return py is not None and isinstance(value, py)


def _check_rule(pointer: str, value: Any, rule: Dict[str, Any], strict: bool,
                logger: logging.Logger) -> Any:
    types = rule.get("type", "any")
    if isinstance(types, str):
        types = [types]
    if not any(_type_ok(value, t) for t in types):
        raise SpecError(
            f"spec violation at {pointer}: expected type {types}, "
            f"got {type(value).__name__} ({value!r})"
        )
    if "options" in rule and not isinstance(value, (dict, list)):
        if value not in rule["options"]:
            raise SpecError(
                f"spec violation at {pointer}: {value!r} not in {rule['options']}"
            )
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        if "min" in rule and value < rule["min"]:
            raise SpecError(f"spec violation at {pointer}: {value} < min {rule['min']}")
        if "max" in rule and value > rule["max"]:
            raise SpecError(f"spec violation at {pointer}: {value} > max {rule['max']}")
    return value


def validate_and_inject(
    params: Optional[Dict[str, Any]],
    rules: Sequence[Dict[str, Any]],
    strict: bool = True,
    logger: Optional[logging.Logger] = None,
) -> Dict[str, Any]:
    """Validate ``params`` against ``rules`` and return a new dict with
    defaults injected (reference jse.verify_json + inject_defaults,
    Solver.cpp:149-161)."""
    logger = logger or logging.getLogger("polysolve_tpu")
    params = copy.deepcopy(params) if params else {}
    by_pointer: Dict[str, Dict[str, Any]] = {r["pointer"]: r for r in rules}

    def walk(pointer: str, value: Any) -> Any:
        rule = by_pointer.get(pointer)
        if rule is None:
            if strict:
                raise SpecError(f"unknown parameter {pointer}")
            logger.warning("unknown parameter %s (lenient mode: kept)", pointer)
            return value
        _check_rule(pointer, value, rule, strict, logger)
        if not isinstance(value, dict):
            return value
        allowed = set(rule.get("required", [])) | set(rule.get("optional", []))
        out: Dict[str, Any] = {}
        for key, v in value.items():
            child_ptr = (pointer.rstrip("/") + "/" + key) if pointer != "/" else "/" + key
            if key not in allowed:
                if strict:
                    raise SpecError(f"unknown parameter {child_ptr}")
                logger.warning("unknown parameter %s (lenient mode: kept)", child_ptr)
                out[key] = v
                continue
            out[key] = walk(child_ptr, v)
        for key in rule.get("required", []):
            child_ptr = (pointer.rstrip("/") + "/" + key) if pointer != "/" else "/" + key
            if key not in out:
                raise SpecError(f"missing required parameter {child_ptr}")
        # inject defaults for absent optional children
        for key in rule.get("optional", []):
            if key in out:
                continue
            child_ptr = (pointer.rstrip("/") + "/" + key) if pointer != "/" else "/" + key
            child_rule = by_pointer.get(child_ptr)
            if child_rule is None:
                continue
            if "default" in child_rule and child_rule["default"] is not None:
                out[key] = copy.deepcopy(child_rule["default"])
            elif "object" in _as_list(child_rule.get("type", "any")):
                out[key] = walk(child_ptr, {})
        return out

    return walk("/", params)


def _as_list(x):
    return [x] if isinstance(x, str) else list(x)


def rules_for_subtree(prefix: str, tree: Dict[str, Any]) -> List[Dict[str, Any]]:
    """Helper: expand a nested ``{key: rule_dict_or_subtree}`` description
    into a flat pointer-keyed rule list. A leaf is a dict containing 'type';
    an interior node is any other dict."""
    rules: List[Dict[str, Any]] = []

    def is_leaf(d: Any) -> bool:
        return isinstance(d, dict) and "type" in d and not isinstance(d.get("type"), dict)

    def rec(pointer: str, node: Dict[str, Any]):
        children = {k: v for k, v in node.items() if isinstance(v, dict)}
        rules.append({
            "pointer": pointer,
            "type": "object",
            "optional": sorted(children.keys()),
        })
        for k, v in children.items():
            child_ptr = pointer.rstrip("/") + "/" + k
            if is_leaf(v):
                rules.append(dict(v, pointer=child_ptr))
            else:
                rec(child_ptr, v)

    rec(prefix, tree)
    return rules
