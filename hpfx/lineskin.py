"""Frequency-dependent series line resistance (skin / proximity effect).

The reference evaluates every line at its 50 Hz resistance for all
harmonic orders (``hcne_generalized.py:151-155``: ``1/(R + j·X·h)`` with
frequency-flat ``R``).  Real conductors' AC resistance rises with
frequency — skin and proximity effects — which matters for harmonic
studies in two opposite ways: resonance peaks are damped (R grows where
the reactances cancel) while series harmonic losses rise.  This module
builds a per-harmonic, per-line resistance table ``Rh`` (H, L) from the
standard conductor models and threads it through
:func:`hpfx.ybus.build_ybus` / the stable-mismatch line structure via the
``(Y, lineY, lineY_f)`` triple contract of :func:`hpfx.ybus.resolve_ybus`
— so skin-corrected systems ride ``hpf`` / ``hpf_sweep`` /
``hpf_sweep_adaptive`` on both batch layouts unchanged.

Models (ratios applied to each line's fundamental ``R``; the fundamental
row is ALWAYS exactly ``R`` so the h=1 solve stays the conventional
power flow, mirroring :mod:`hpfx.loadmodel`'s convention):

- ``"exponent"``:     R(h) = R · h**alpha          (alpha=0.5 default —
  the classic square-root skin-depth law for solid conductors)
- ``"cigre_oh"``:     R(h) = R · (1 + 0.646·h² / (192 + 0.518·h²))
  — the CIGRE overhead-line correction (Arrillaga & Watson, *Power
  System Harmonics*; CIGRE WG 36-05 / Electra 77 load-and-line
  guidance).  Saturates near 2.25·R at high order.
- ``"cigre_cable"``:  R(h) = R · (0.187 + 0.532·√h)
  — the companion cable correction from the same family.  The formula's
  h=1 value (0.719) is a known quirk of the published fit; as with all
  models here the fundamental row is pinned to exactly R.

These are study-practice fits, not first-principles physics — pass your
own (H, L) table to :func:`skin_structures` (or directly to
``build_ybus(Rh=...)``) for measured conductor data.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .config import Settings
from .cx import Cx
from .network import Network
from .ybus import build_ybus, fold_ydiag, line_ybus_pair

MODELS = ("exponent", "cigre_oh", "cigre_cable")


def skin_ratio(h, model: str = "cigre_oh", *, alpha: float = 0.5):
    """R(h)/R(1) ratio of ``model`` evaluated at harmonic order(s) ``h``
    (as published — NOT pinned at h=1; :func:`line_resistance` does the
    pinning when building solver tables)."""
    if model not in MODELS:
        raise ValueError(f"unknown skin model {model!r} (use one of "
                         f"{MODELS})")
    h = np.asarray(h, float)
    if model == "exponent":
        return h ** alpha
    if model == "cigre_oh":
        return 1.0 + 0.646 * h * h / (192.0 + 0.518 * h * h)
    return 0.187 + 0.532 * np.sqrt(h)


def line_resistance(net: Network, settings: Settings, *,
                    model: str = "cigre_oh",
                    alpha: float = 0.5,
                    lines: Optional[Sequence[int]] = None) -> jnp.ndarray:
    """(H, L) per-harmonic series resistance table for ``build_ybus(Rh=)``.

    ``lines`` restricts the correction to a subset of line indices (mixed
    overhead/cable feeders: call twice with different models and combine
    with ``np.where``); unlisted lines keep their frequency-flat ``R`` on
    every row.  Row 0 (the fundamental) is always exactly ``net.line_R``.
    """
    R1 = np.asarray(net.line_R, float)                            # (L,)
    L = R1.shape[0]
    ratio = skin_ratio(np.asarray(settings.harmonics, float),
                       model, alpha=alpha)[:, None]               # (H, 1)
    Rh = R1[None, :] * ratio                                      # (H, L)
    if lines is not None:
        sel = np.asarray([int(i) for i in lines])
        if sel.size and (sel.min() < 0 or sel.max() >= L):
            raise ValueError(f"line indices out of range (0..{L - 1})")
        mask = np.zeros(L, bool)
        mask[sel] = True
        Rh = np.where(mask[None, :], Rh, R1[None, :])
    Rh[0] = R1                                  # fundamental stays exact
    return jnp.asarray(Rh, settings.real_dtype)


def skin_structures(net: Network, settings: Settings, Rh=None, *,
                    model: str = "cigre_oh", alpha: float = 0.5,
                    lines: Optional[Sequence[int]] = None,
                    Y_diag: Optional[Cx] = None):
    """``(Y, lineY, lineY_f)`` triple with the skin-corrected series
    resistances (and optionally a :mod:`hpfx.loadmodel` ``Y_diag``)
    folded into BOTH the dense tensor and the stable-mismatch line
    structure — pass as the ``Y`` argument of ``hpf`` / ``hpf_sweep`` /
    ``hpf_sweep_adaptive`` (either layout).

    ``Rh`` defaults to ``line_resistance(net, settings, model=, alpha=,
    lines=)``; pass an explicit (H, L) table for measured data.
    """
    if Rh is None:
        Rh = line_resistance(net, settings, model=model, alpha=alpha,
                             lines=lines)
    Y = build_ybus(net, settings, Rh=Rh)
    lineY, lineY_f = line_ybus_pair(net, settings, Rh=Rh)
    if Y_diag is not None:
        Y = fold_ydiag(Y, Y_diag)
        if lineY is not None:
            lineY = lineY._replace(d=lineY.d + Y_diag)
            lineY_f = lineY_f._replace(d=lineY_f.d + Y_diag[:1])
    return Y, lineY, lineY_f
