"""Backend guard for demo / validation scripts.

This environment's default JAX backend is a single shared TPU chip behind
a relay.  A script that is killed (by ``timeout``, Ctrl-C, a tool cap...)
while it has enqueued TPU work can wedge the whole runtime for hours
(CLAUDE.md #6/#17/#32).  Demo and validation scripts therefore must NOT
touch the TPU by default: they call :func:`backend_guard` before any JAX
computation, which forces the CPU backend unless the caller explicitly
opts in to the TPU via the ``HPFX_DEMO_TPU=1`` environment variable.

The one place TPU-by-default is correct is ``bench.py`` (the driver's
perf entry point), which does not use this guard.
"""
from __future__ import annotations

import os

_OPT_IN_VAR = "HPFX_DEMO_TPU"


def backend_guard(enable_x64_on_cpu: bool = True) -> str:
    """Force the CPU backend unless ``HPFX_DEMO_TPU=1`` is set.

    Must be called before JAX initializes its backend (i.e. before the
    first array/computation; importing jax is fine).  Returns the chosen
    platform string ("cpu" or "" for default/TPU).

    Note: the ``JAX_PLATFORMS`` env var is overridden by this
    environment's sitecustomize, so we use ``jax.config.update``
    (CLAUDE.md #1).
    """
    import jax

    if os.environ.get(_OPT_IN_VAR, "") == "1":
        # Explicit TPU opt-in: leave the default backend alone.
        return ""
    jax.config.update("jax_platforms", "cpu")
    if enable_x64_on_cpu:
        jax.config.update("jax_enable_x64", True)
    return "cpu"
