"""Post-processing: distortion metrics and structured results.

Reference: get_THD (hcne_generalized.py:563-572; the Julia twin at
hcne.jl:482-489 forgets its return value — bug not reproduced).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class THD(NamedTuple):
    THD_F: jnp.ndarray  # (n,) relative to fundamental
    THD_R: jnp.ndarray  # (n,) relative to RMS


def get_thd(V_m: jnp.ndarray) -> THD:
    """Total harmonic distortion per bus from the (H, n) magnitude tensor.

    THD_F = sqrt(sum_{h>=3} V_m^2) / V_m(h=1)
    THD_R = sqrt(sum_{h>=3} V_m^2) / sqrt(sum_all V_m^2)
    (hcne_generalized.py:563-572)
    """
    harm = jnp.sqrt(jnp.sum(V_m[1:] ** 2, axis=0))
    total = jnp.sqrt(jnp.sum(V_m ** 2, axis=0))
    return THD(THD_F=harm / V_m[0], THD_R=harm / total)


def voltage_phasors(V_m: jnp.ndarray, V_a: jnp.ndarray) -> jnp.ndarray:
    """Complex phasors V_m·e^{j·V_a} (P2A, hcne_generalized.py:36-37)."""
    return V_m * jnp.exp(1j * V_a)
