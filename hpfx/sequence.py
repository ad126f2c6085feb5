"""Sequence-domain analysis of balanced-system harmonic spectra.

The solver (like the reference, hcne_generalized.py's single-phase
equivalent) models the balanced positive-sequence network.  Under
balanced conditions each harmonic order still maps to a definite
symmetrical-component sequence — phase b/c waveforms lag/lead by
h·120° — giving the classic classification

    h mod 3 == 1  ->  positive sequence   (1, 7, 13, ...)
    h mod 3 == 2  ->  negative sequence   (5, 11, 17, ...)
    h mod 3 == 0  ->  zero sequence       (3, 9, 15, ... — the triplens)

Three phase-domain consequences matter for equipment even in a balanced
study, and this module computes them as post-processing on solved
spectra:

- **Neutral current** (:func:`neutral_current`): zero-sequence harmonics
  add in the neutral of a 4-wire system instead of cancelling —
  ``I_N(h) = 3·I_phase(h)`` for triplens, 0 otherwise.  The neutral RMS
  of a rectifier-heavy feeder routinely exceeds the phase RMS; this is
  the number that sizes the neutral conductor.
- **Delta-winding blocking** (:func:`delta_blocked`): balanced triplen
  currents circulate inside a delta winding and never reach the far
  side; the transferred spectrum has its zero-sequence orders removed.
- **Fortescue transform** (:func:`sequence_components` /
  :func:`phase_components`): the general (a, b, c) <-> (0, 1, 2) map for
  *measured* unbalanced phasor sets, split-complex like everything else
  in hpfx (no complex dtypes on this TPU backend).

References: Fortescue decomposition and the h-mod-3 rule are textbook
(e.g. Arrillaga & Watson, "Power System Harmonics", ch. 2); the
balanced-spectrum neutral law is IEEE Std 1100 / C57.110 context.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from . import cx
from .cx import Cx

POSITIVE, NEGATIVE, ZERO = 1, 2, 0


def classify_orders(harmonics: Sequence[int]) -> np.ndarray:
    """Per-order sequence class under balanced conditions: ``h % 3``
    with the module constants ``POSITIVE`` (1), ``NEGATIVE`` (2),
    ``ZERO`` (0, the triplens)."""
    return np.asarray([int(h) % 3 for h in harmonics], np.int32)


def triplen_mask(harmonics: Sequence[int]) -> np.ndarray:
    """(H,) bool — True on zero-sequence (triplen) orders."""
    return classify_orders(harmonics) == ZERO


def neutral_current(I_m: jnp.ndarray, harmonics: Sequence[int],
                    axis: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Neutral-conductor harmonic currents of a balanced 4-wire system.

    ``I_m``: per-phase harmonic current magnitudes with the harmonic
    axis at ``axis`` (e.g. a column of :func:`hpfx.flows.line_flows`'
    ``I_f.abs()``).  Returns ``(I_neutral, rms)``: the per-order neutral
    magnitudes (``3·I_h`` on triplens, 0 elsewhere — positive/negative
    sequence sets cancel in the neutral) and their RMS aggregate along
    the harmonic axis.  Compare the RMS against the phase RMS to size
    the neutral.
    """
    mask = jnp.asarray(triplen_mask(harmonics), I_m.dtype)
    shape = [1] * I_m.ndim
    shape[axis] = -1
    i_n = 3.0 * I_m * mask.reshape(shape)
    return i_n, jnp.sqrt(jnp.sum(i_n * i_n, axis=axis))


def delta_blocked(spectrum: jnp.ndarray, harmonics: Sequence[int],
                  axis: int = 0) -> jnp.ndarray:
    """The spectrum transferred through a delta winding: balanced
    zero-sequence (triplen) orders circulate in the delta and are
    removed; positive/negative-sequence orders pass unchanged."""
    keep = jnp.asarray(~triplen_mask(harmonics), spectrum.dtype)
    shape = [1] * spectrum.ndim
    shape[axis] = -1
    return spectrum * keep.reshape(shape)


class SequenceSet(NamedTuple):
    """Symmetrical components of a three-phase phasor set (split-complex,
    same leading shape as the inputs): ``zero``/``positive``/``negative``."""
    zero: Cx
    positive: Cx
    negative: Cx


def _alpha(settings_dtype=None) -> Cx:
    """The Fortescue rotation a = e^{j 2pi/3} as a split-complex scalar."""
    return Cx(jnp.asarray(-0.5), jnp.asarray(np.sqrt(3.0) / 2.0))


def sequence_components(va: Cx, vb: Cx, vc: Cx) -> SequenceSet:
    """Fortescue transform of measured phase phasors:

        V0 = (Va + Vb + Vc) / 3
        V1 = (Va + a·Vb + a²·Vc) / 3
        V2 = (Va + a²·Vb + a·Vc) / 3

    Inputs are split-complex ``Cx`` of any (broadcastable) shape — e.g.
    per-harmonic meter phasors ``(H, n)``.
    """
    a = _alpha()
    a2 = a * a
    third = 1.0 / 3.0
    return SequenceSet(
        zero=(va + vb + vc) * third,
        positive=(va + a * vb + a2 * vc) * third,
        negative=(va + a2 * vb + a * vc) * third)


def phase_components(seq: SequenceSet) -> Tuple[Cx, Cx, Cx]:
    """Inverse Fortescue: phase phasors (Va, Vb, Vc) from a
    :class:`SequenceSet` (exact inverse of
    :func:`sequence_components`)."""
    a = _alpha()
    a2 = a * a
    v0, v1, v2 = seq.zero, seq.positive, seq.negative
    va = v0 + v1 + v2
    vb = v0 + a2 * v1 + a * v2
    vc = v0 + a * v1 + a2 * v2
    return va, vb, vc


def balanced_phases(V_m: jnp.ndarray, V_a: jnp.ndarray,
                    harmonics: Sequence[int]) -> Tuple[Cx, Cx, Cx]:
    """Expand a balanced positive-sequence harmonic solution (the
    solver's (H, ...) magnitudes/angles) into the three phase spectra:
    phase a as solved, phases b/c rotated by ``∓ h·120°`` per order —
    the waveform-level meaning of the h-mod-3 rule (a triplen lands in
    phase on all three phases; a 5th lands in reverse rotation)."""
    h = jnp.asarray(np.asarray(harmonics, float))
    shape = [1] * V_m.ndim
    shape[0] = -1
    rot = (2.0 * jnp.pi / 3.0) * h.reshape(shape)
    va = cx.polar(V_m, V_a)
    vb = cx.polar(V_m, V_a - rot)
    vc = cx.polar(V_m, V_a + rot)
    return va, vb, vc
