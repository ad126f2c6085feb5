"""Persistent XLA compilation cache wiring.

On this environment's tunneled TPU relay, first compiles of the sweep
programs cost 20-200 s — long enough that a driver watchdog can fire
inside the first-compile window and kill the process between dispatch
and sync, the known runtime-wedge cause (CLAUDE.md #6/#17 and the
wedge-#4 reassessment in BENCH_NOTES).  Enabling JAX's persistent
compilation cache makes every driver-facing entry point (bench.py,
__graft_entry__.py, the validation A/B harnesses) reuse executables
across processes, shrinking that window to seconds on warm runs, and
lets compile-only priming passes (validation/precompile.py) run safely
even while the TPU runtime is wedged — the AOT compile service stays up.

Measured on this relay: cross-process recompile of a small program
1.49 s -> 0.28 s; the net1 h<=51 sweep's ~170 s compile is the
motivating case.
"""
import os

import jax

#: default cache location: <repo>/.jax_cache (gitignored)
DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_cache(path: str | None = None,
                            min_compile_secs: float = 1.0) -> str:
    """Point JAX's persistent compilation cache at ``path``.

    Call before the first compilation of interest (any time after import
    is fine).  ``min_compile_secs`` skips caching trivial programs so the
    cache stays small; the sweep programs all compile in >1 s.  Returns
    the cache directory.  Honors ``HPFX_CACHE_DIR``; set it to the empty
    string to disable entirely.
    """
    env = os.environ.get("HPFX_CACHE_DIR")
    if env == "":
        return ""
    path = env or path or DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return path
