"""Per-harmonic network impedance analysis (frequency / impedance scan).

Capability addition beyond the reference (which stops at HPF solves —
hcne_generalized.py builds Y per harmonic at :154-176 but never inverts
it): the standard harmonic-resonance companion to a harmonic power flow
study.  ``impedance_scan`` computes the nodal impedance matrices
``Z(h) = Y(h)^-1`` for every harmonic in ``settings.harmonics`` from the
same vectorized Ybus assembly the solver uses (:func:`hpfx.ybus.
build_ybus`), and ``resonance_peaks`` locates the parallel-resonance
candidates (local maxima of the driving-point magnitude over harmonic
order) that tell a planner which injection orders a bus amplifies.

TPU notes: split-complex throughout (no complex dtypes on this backend);
the per-harmonic inversion is one H-batched real block solve
(:func:`hpfx.cx.solve`), a single batched LU on the MXU.  Everything is
jittable with static shapes.
"""
from typing import Optional, Tuple

import jax.numpy as jnp

from . import cx
from .config import Settings
from .cx import Cx
from .network import Network
from .ybus import build_ybus

__all__ = ["impedance_scan", "driving_point_impedance", "resonance_peaks"]


def impedance_scan(net: Network, settings: Settings,
                   Y: Optional[Cx] = None,
                   ground_slack: bool = True) -> Cx:
    """Nodal impedance matrices ``Z(h)``, shape ``(H, n, n)``.

    ``Z[h, k, k]`` is the driving-point impedance a harmonic current
    source injected at bus ``k`` sees at order ``settings.harmonics[h]``;
    ``Z[h, j, k]`` the transfer impedance to bus ``j`` (the voltage
    distortion a remote injection causes).

    ``ground_slack`` (default): the slack bus is treated as an ideal
    voltage source — a short to ground for harmonic currents — so its
    row/column are removed before inversion and re-embedded as zeros.
    This is the physically meaningful scan for a feeder fed from a stiff
    grid, and it keeps ``Y`` nonsingular on networks with no shunt
    elements (whose raw nodal ``Y`` has zero row sums).  With
    ``ground_slack=False`` the raw ``Y(h)`` is inverted as-is (only
    valid when shunts tie the network to ground).

    ``Y``: optional precomputed ``build_ybus(net, settings)`` override
    (e.g. to scan a Kron-reduced or modified network).
    """
    if Y is None:
        Y = build_ybus(net, settings)
    H, n = Y.shape[0], Y.shape[1]
    rd = settings.real_dtype
    if ground_slack:
        Yr = Y[:, 1:, 1:]
        eye = jnp.broadcast_to(jnp.eye(n - 1, dtype=rd), (H, n - 1, n - 1))
        Zr = cx.solve(Yr, Cx(eye, jnp.zeros_like(eye)))
        Z = Cx(jnp.zeros((H, n, n), rd), jnp.zeros((H, n, n), rd))
        return Cx(Z.re.at[:, 1:, 1:].set(Zr.re),
                  Z.im.at[:, 1:, 1:].set(Zr.im))
    eye = jnp.broadcast_to(jnp.eye(n, dtype=rd), (H, n, n))
    return cx.solve(Y, Cx(eye, jnp.zeros_like(eye)))


def driving_point_impedance(net: Network, settings: Settings,
                            Y: Optional[Cx] = None,
                            ground_slack: bool = True) -> jnp.ndarray:
    """Driving-point impedance magnitudes ``|Z_kk(h)|``, shape (H, n)."""
    Z = impedance_scan(net, settings, Y=Y, ground_slack=ground_slack)
    d = jnp.diagonal(Z.re, axis1=-2, axis2=-1), \
        jnp.diagonal(Z.im, axis1=-2, axis2=-1)
    return jnp.sqrt(d[0] * d[0] + d[1] * d[1])


def resonance_peaks(zmag: jnp.ndarray,
                    settings: Settings) -> Tuple[jnp.ndarray, jnp.ndarray,
                                                 jnp.ndarray]:
    """Parallel-resonance candidates from a driving-point scan.

    ``zmag``: (H, n) magnitudes from :func:`driving_point_impedance`.

    Returns ``(is_peak, worst_h, worst_z)``:

    - ``is_peak`` (H, n) bool — strict local maxima over harmonic order
      (endpoints count when they dominate their single neighbor);
    - ``worst_h`` (n,) — the harmonic ORDER (from ``settings.harmonics``)
      of each bus's global maximum — the order a capacitor/line-inductance
      pair amplifies hardest at that bus;
    - ``worst_z`` (n,) — the magnitude there.

    The slack row of a grounded scan is identically zero and never
    flagged.
    """
    up = jnp.concatenate([jnp.ones_like(zmag[:1], bool),
                          zmag[1:] > zmag[:-1]], axis=0)
    down = jnp.concatenate([zmag[:-1] > zmag[1:],
                            jnp.ones_like(zmag[:1], bool)], axis=0)
    is_peak = up & down & (zmag > 0)
    hs = jnp.asarray(settings.harmonics)
    k = jnp.argmax(zmag, axis=0)
    return is_peak, hs[k], jnp.take_along_axis(zmag, k[None], axis=0)[0]
