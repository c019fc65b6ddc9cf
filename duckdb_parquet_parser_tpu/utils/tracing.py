"""Profiling hooks: jax.profiler traces + named stage annotations.

The reference has no tracing at all (SURVEY.md §5); here every pipeline stage
can be wrapped so device work shows up named in perfetto/XProf dumps."""

from __future__ import annotations

from contextlib import contextmanager

import jax


@contextmanager
def trace_session(out_dir: str | None):
    """Collects a jax.profiler trace for the enclosed block (no-op if
    out_dir is None)."""
    if not out_dir:
        yield
        return
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextmanager
def stage(name: str):
    """Names the enclosed device work in profiler timelines."""
    with jax.profiler.TraceAnnotation(name):
        yield


def annotate(name: str):
    """Decorator flavor of `stage`."""
    def deco(fn):
        def wrapped(*a, **kw):
            with stage(name):
                return fn(*a, **kw)
        wrapped.__name__ = getattr(fn, "__name__", "wrapped")
        return wrapped
    return deco
