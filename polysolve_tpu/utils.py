"""Common utilities: timers, logging, small sparse helpers.

TPU-native re-imagining of the reference's L0 layer
(reference src/polysolve/Utils.{hpp,cpp}):

- ``StopWatch`` / ``scoped_stopwatch``  — reference Utils.cpp:12-63. On an
  accelerator the only honest wall clock is one taken after
  ``jax.block_until_ready``; the stopwatch does that for device values.
- ``Timing``                            — reference Utils.hpp:12-24.
- ``log_and_throw_error``               — reference Utils.cpp:65-69.
- ``extract_param``                     — reference Utils.cpp:78-84.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from contextlib import contextmanager
from typing import Any, Optional

import jax

default_logger = logging.getLogger("polysolve_tpu")


@dataclass
class Timing:
    """Accumulating timer: total seconds + invocation count
    (reference Utils.hpp:12-24)."""

    time: float = 0.0
    count: int = 0

    def __iadd__(self, t: float) -> "Timing":
        self.time += t
        self.count += 1
        return self

    @property
    def mean(self) -> float:
        return self.time / self.count if self.count else 0.0


class StopWatch:
    """Wall-clock stopwatch that synchronizes device work before reading the
    clock (reference Utils.cpp:12-63; `block_until_ready` replaces the implicit
    host synchrony of the CPU reference)."""

    def __init__(self, name: str = "", logger: Optional[logging.Logger] = None):
        self.name = name
        self.logger = logger or default_logger
        self._t0 = 0.0
        self.elapsed = 0.0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, *sync: Any) -> float:
        for v in sync:
            jax.block_until_ready(v)
        self.elapsed = time.perf_counter() - self._t0
        return self.elapsed


@contextmanager
def scoped_stopwatch(name: str, timing: Optional[Timing] = None,
                     logger: Optional[logging.Logger] = None):
    """RAII-style scoped timer (reference Utils.hpp:26-51,
    POLYSOLVE_SCOPED_STOPWATCH). Logs at DEBUG; optionally accumulates into a
    ``Timing``."""
    sw = StopWatch(name, logger)
    sw.start()
    try:
        yield sw
    finally:
        sw.stop()
        if timing is not None:
            timing += sw.elapsed
        (logger or default_logger).debug("[timing] %s: %.6fs", name, sw.elapsed)


def log_and_throw_error(logger: Optional[logging.Logger], msg: str, *args: Any) -> None:
    """Log at ERROR then raise (reference Utils.cpp:65-69)."""
    text = msg.format(*args) if args else msg
    (logger or default_logger).error(text)
    raise RuntimeError(text)


def extract_param(key: str, name: str, params: dict) -> Any:
    """Read ``params[key][name]`` falling back to ``params[name]``
    (reference Utils.cpp:78-84)."""
    if key in params and isinstance(params[key], dict) and name in params[key]:
        return params[key][name]
    return params[name]


@contextmanager
def profile_trace(log_dir: str):
    """Capture a ``jax.profiler`` trace for the enclosed region (the TPU
    replacement of the reference's SPDLOG_TRACE phase instrumentation —
    MASSolver.cu:308-373; view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class PhaseTimings:
    """Named phase-timer dictionary, the nonlinear solver's six-phase profile
    (reference nonlinear/Solver.hpp:193-198)."""

    timings: dict = field(default_factory=dict)

    def timing(self, name: str) -> Timing:
        return self.timings.setdefault(name, Timing())

    @contextmanager
    def scope(self, name: str):
        t = self.timing(name)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            t += time.perf_counter() - t0

    def as_dict(self, per: float = 1.0) -> dict:
        per = max(per, 1.0)
        return {f"time_{k}": v.time / per for k, v in self.timings.items()}
