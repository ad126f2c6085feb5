"""Solver-state checkpointing and warm starts.

The reference has no checkpoint/resume; its closest artifact is the
per-iteration state log of the Fuchs example (V_log.json written at
hcne_based_on_fuchs.py:370-372) and the structural warm start where the
fundamental solution seeds the harmonic solve (hcne_generalized.py:525).
Here both become first-class:

- ``save_result`` / ``load_result`` serialize an HPFResult (voltages,
  residuals, convergence metadata) to a .npz archive,
- ``warm_start(result)`` turns a saved/previous solution into the ``V0``
  argument of ``solve_harmonic``/``hpf``, so parameter sweeps can resume
  from the nearest solved case instead of the 0.1-pu flat start — typically
  halving NR iteration counts for small parameter steps.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .harmonic import HPFResult


def save_result(path: str, result: HPFResult) -> None:
    np.savez(
        path,
        V_m=np.asarray(result.V_m), V_a=np.asarray(result.V_a),
        err=np.asarray(result.err), n_iter=np.asarray(result.n_iter),
        err_hist=np.asarray(result.err_hist),
        converged=np.asarray(result.converged))


def load_result(path: str) -> HPFResult:
    d = np.load(path)
    return HPFResult(
        V_m=jnp.asarray(d["V_m"]), V_a=jnp.asarray(d["V_a"]),
        err=jnp.asarray(d["err"]), n_iter=jnp.asarray(d["n_iter"]),
        err_hist=jnp.asarray(d["err_hist"]),
        converged=jnp.asarray(d["converged"]), fund=None)


def warm_start(result: HPFResult) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(V_m, V_a) warm start from a previous solution."""
    return jnp.asarray(result.V_m), jnp.asarray(result.V_a)
