"""Profiling hooks (SURVEY §5.1: the reference had perf_counter prints;
§5.2: no sanitizers — here jax-native equivalents)."""
from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Raise on NaN production inside jitted solver code (the closest
    analogue of a sanitizer for this workload; SURVEY §5.2)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
