"""Profiling helpers — jax.profiler trace annotations + wall-clock spans.

The TPU equivalent of the reference's log-based span tracer (SURVEY.md §5.1):
``trace_span`` emits BOTH a jax.profiler TraceAnnotation (visible in
TensorBoard/XProf device timelines) and the host-side structured-log span, so
build/query stages line up across host and device views.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax

from quiver_tpu.observability.logging import global_tracer


@contextlib.contextmanager
def trace_span(name: str, **fields) -> Iterator[None]:
    span = global_tracer().start_span(name).set(**fields)
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        span.end()


@contextlib.contextmanager
def profile_to(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (open in TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: Optional[str] = None):
    """Decorator form of trace_span."""

    def wrap(fn):
        label = name or fn.__qualname__

        def inner(*args, **kwargs):
            with trace_span(label):
                return fn(*args, **kwargs)

        inner.__name__ = fn.__name__
        inner.__qualname__ = fn.__qualname__
        return inner

    return wrap
