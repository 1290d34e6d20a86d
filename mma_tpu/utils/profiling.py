"""Tracing/profiling utilities (SURVEY §5.1 — the reference has only
wall-clock prints, train.py:73,96,109,113).

- ``trace(name)``: annotate a region so it shows up in the XLA/TPU trace
  viewer (xprof) under that name.
- ``profile_to(dir)``: capture a full device trace around a block
  (view with tensorboard/xprof).
- ``annotate_fn(name)``: decorator version of ``trace``.
"""

from __future__ import annotations

import contextlib
import functools

import jax


def trace(name: str):
    """Region annotation visible in device traces."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def profile_to(log_dir: str):
    """Capture a device trace for the enclosed block into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate_fn(name: str):
    def deco(f):
        @functools.wraps(f)
        def wrapper(*a, **kw):
            with trace(name):
                return f(*a, **kw)

        return wrapper

    return deco
