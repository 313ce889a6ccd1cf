"""Tracing / profiling utilities.

Capability parity + extension over the reference's ad-hoc timing decorators
(``routeformer/io/dataset_dreyeve.py:80-126``: ``time_it`` / ``TimeIt``),
plus the TPU-native profiler the reference lacks (SURVEY §5): a
``jax.profiler`` trace context producing Perfetto/TensorBoard traces, and a
simple aggregate timer registry for input-pipeline stats.
"""

import contextlib
import functools
import time
from collections import defaultdict
from typing import Dict, Optional

from routeformer_tpu.utils.logging import get_logger

logger = get_logger("profiling")

_AGGREGATES: Dict[str, list] = defaultdict(list)


def time_it(fn=None, *, name: Optional[str] = None):
    """Decorator logging + aggregating wall time (reference time_it)."""

    def decorate(f):
        label = name or f.__qualname__

        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            t0 = time.perf_counter()
            try:
                return f(*args, **kwargs)
            finally:
                dt = time.perf_counter() - t0
                _AGGREGATES[label].append(dt)
                logger.info("%s took %.4fs", label, dt)

        return wrapper

    return decorate(fn) if fn is not None else decorate


class TimeIt:
    """Context-manager timer (reference TimeIt)."""

    def __init__(self, name: str):
        self.name = name
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        _AGGREGATES[self.name].append(self.elapsed)
        logger.info("%s took %.4fs", self.name, self.elapsed)
        return False


def timing_summary() -> Dict[str, Dict[str, float]]:
    """Aggregate stats of every timed label."""
    out = {}
    for name, samples in _AGGREGATES.items():
        out[name] = {
            "count": len(samples),
            "total": sum(samples),
            "mean": sum(samples) / len(samples),
            "max": max(samples),
        }
    return out


def reset_timing():
    _AGGREGATES.clear()


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/routeformer_trace"):
    """jax.profiler trace context: visualize with TensorBoard/Perfetto.

    The device-side profiling path the reference has no equivalent for
    (its only profiling is py-spy sampling from outside).
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logger.info("device trace written to %s", log_dir)


def annotate(name: str):
    """Named region inside a trace (shows up on the TPU timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
