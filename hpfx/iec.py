"""IEC 61000-3-6 aggregation: the general summation law and emission
apportioning.

The studies layer (:mod:`hpfx.studies`) covers the ASSESSMENT side of
IEC/TR 61000-3-6 (95th-percentile checks against planning levels); this
module covers the PLANNING side — how multiple harmonic sources combine
when their phase angles are not known, and how a planning level is
divided into per-customer emission limits:

- **general summation law**: the magnitude of the combined harmonic
  from ``K`` statistically independent sources is taken as

      U_h = ( sum_k U_{h,k}^alpha )^(1/alpha)

  with the standard exponents alpha = 1 for h < 5 (low orders add
  nearly in phase), 1.4 for 5 <= h <= 10, and 2 (RMS) for h > 10
  (phases effectively random).  :func:`summation_law` applies it along
  any axis; :func:`aggregate_contributions` applies it to the
  per-device voltage contributions of
  :func:`hpfx.impedance.distortion_contributions`, giving the planning
  estimate to compare against the exact (phase-aware) phasor sum the
  solver computes.
- **apportioning**: a planning level ``L_h`` at a point of common
  coupling is split among customers in proportion to agreed power
  under the same law, ``E_{h,i} = L_h · (S_i / S_t)^(1/alpha)``
  (:func:`apportion_planning_level`); summing the apportioned limits
  back through the law reproduces ``L_h`` exactly (gated in tests).

Capability addition beyond the reference (which solves one
deterministic case); exponents and laws per IEC/TR 61000-3-6:2008
(also the basis of the IEEE 519 application guide's summation advice).
Everything is elementwise jnp math — jittable, vmappable, and valid on
any leading batch shape.
"""
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

__all__ = ["summation_alpha", "summation_law", "aggregate_contributions",
           "apportion_planning_level"]


def summation_alpha(harmonics: Sequence[float]) -> np.ndarray:
    """(H,) standard summation exponents: 1.0 below the 5th, 1.4 for
    orders 5-10, 2.0 above the 10th (IEC/TR 61000-3-6 table 2.2)."""
    h = np.asarray(harmonics, float)
    return np.where(h < 5.0, 1.0, np.where(h <= 10.0, 1.4, 2.0))


def summation_law(mags, harmonics: Optional[Sequence[float]] = None,
                  alpha=None, axis: int = 0,
                  h_axis: int = -1) -> jnp.ndarray:
    """Combine source magnitudes along ``axis`` under the general
    summation law ``(sum m^alpha)^(1/alpha)``.

    ``alpha``: explicit exponent (scalar or per-order array) — or pass
    ``harmonics`` to use the standard order-dependent table, in which
    case ``h_axis`` names the harmonic axis of ``mags`` (default: last
    of the REMAINING axes after the source axis is removed... to keep
    broadcasting unambiguous the per-order exponents are reshaped onto
    ``h_axis`` of the INPUT, which must not equal ``axis``).
    ``alpha=1`` is the arithmetic (worst-case in-phase) sum, ``alpha=2``
    the RMS (random-phase) sum.
    """
    mags = jnp.asarray(mags)
    if (alpha is None) == (harmonics is None):
        raise ValueError("pass exactly one of alpha / harmonics")
    if alpha is None:
        a = jnp.asarray(summation_alpha(harmonics), mags.dtype)
        shape = [1] * mags.ndim
        shape[h_axis % mags.ndim] = -1
        if h_axis % mags.ndim == axis % mags.ndim:
            raise ValueError("h_axis must differ from the source axis")
        alpha = a.reshape(shape)
    else:
        alpha = jnp.asarray(alpha, mags.dtype)
    s = jnp.sum(jnp.abs(mags) ** alpha, axis=axis)
    # the exponent loses its source axis in the reduction
    if jnp.ndim(alpha) == mags.ndim:
        alpha = jnp.squeeze(alpha, axis=axis % mags.ndim)
    return s ** (1.0 / alpha)


def aggregate_contributions(contrib, harmonics,
                            alpha=None) -> jnp.ndarray:
    """Planning-level combination of per-device voltage contributions.

    ``contrib``: the (H, n, n_nl) split-complex output of
    :func:`hpfx.impedance.distortion_contributions`.  Returns the
    (H, n) combined |V_h| per bus under the summation law — the
    phase-agnostic planning estimate.  The exact phasor sum (what the
    solver computes, valid when the device phases ARE known) is
    ``contrib`` summed complex over the device axis; the alpha=1 law
    upper-bounds it by the triangle inequality, the standard exponents
    sit between that and the RMS floor.
    """
    mags = jnp.sqrt(contrib.re ** 2 + contrib.im ** 2)      # (H, n, n_nl)
    if alpha is None:
        return summation_law(mags, harmonics=harmonics, axis=-1, h_axis=0)
    return summation_law(mags, alpha=alpha, axis=-1)


def apportion_planning_level(L_h, S_agreed, S_total=None,
                             harmonics: Optional[Sequence[float]] = None,
                             alpha=None) -> jnp.ndarray:
    """Per-customer emission limits from a planning level.

    ``E_{h,i} = L_h · (S_i / S_t)^(1/alpha)`` — the IEC 61000-3-6
    global apportioning: customer ``i`` with agreed power ``S_i`` out of
    the PCC's total supply capacity ``S_t`` may contribute that fraction
    of the planning level, such that the summation law over ALL
    customers exactly exhausts ``L_h`` when ``sum S_i = S_t``.

    ``L_h``: scalar or (H,) planning level(s); ``S_agreed``: (K,)
    agreed powers; ``S_total``: defaults to ``sum(S_agreed)``.  Pass
    ``harmonics`` for the standard per-order exponents (result (K, H))
    or a scalar ``alpha`` (result (K,) × L_h's shape).
    """
    S = jnp.asarray(S_agreed, jnp.result_type(float))
    St = jnp.sum(S) if S_total is None else jnp.asarray(S_total, S.dtype)
    frac = S / St                                            # (K,)
    if (alpha is None) == (harmonics is None):
        raise ValueError("pass exactly one of alpha / harmonics")
    if alpha is None:
        a = jnp.asarray(summation_alpha(harmonics), S.dtype)  # (H,)
        return jnp.asarray(L_h) * frac[:, None] ** (1.0 / a)[None, :]
    return jnp.asarray(L_h) * frac ** (1.0 / jnp.asarray(alpha, S.dtype))
