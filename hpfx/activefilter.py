"""Active (shunt) harmonic filter sizing.

Passive mitigation is covered by :mod:`hpfx.impedance` /
:mod:`hpfx.optimize` (tuned/damped/C-type shunts, gradient-designed
banks).  The other mitigation family is the ACTIVE shunt filter: a
converter at the bus injecting the antiphase harmonic current so the bus
voltage distortion collapses.  Sizing one is an inverse problem on the
solved state: find the injection spectrum ``I_c(h)`` whose network
response cancels the harmonic voltages the nonlinear devices cause.

A one-shot linear correction against the per-order operational
impedance scan diverges here — measured on net2, the true response
``dV_h(bus)/dI_h(bus)`` is ~6x the per-order ``Z_bb(h)`` and rotated,
because the coupled (H, H) device Nortons feed an injection at one
order back into every other.  The sizer therefore runs the library's
inverse-problem engine (:func:`hpfx.estimate._lm_fit` —
Levenberg-Marquardt on the IFT residual Jacobian, one exact jacfwd per
step since the Norton term is linear in the re/im parameters) on a
COMPLEX voltage residual: targeted phasors = ``residual``·V_h at the
base phase.  The complex residual keeps the fit nearly linear — the
magnitude-only formulation of ``estimate_background`` stalls at 3-5x
worse THD on net2's deeply distorted state.

The ``residual`` floor: driving ``V_h(bus)`` to EXACTLY zero is
polar-singular (zero-magnitude state — the hosting-capacity level-0
physics), so the sizer targets ``residual``·|V_h| (default 5%), which
is also what a real active filter's finite control bandwidth leaves.
Validation is a real re-solve with the fitted ``I_bg`` — the devices
react to the cleaned bus, nothing is linearized away.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from . import cx
from .config import Settings
from .cx import Cx
from .harmonic import hpf
from .network import Network
from .results import get_thd

__all__ = ["ActiveFilterSizing", "size_active_filter"]


class ActiveFilterSizing(NamedTuple):
    """``I_c``: (H,) compensating spectrum at the bus — (n_b, H) and
    per-bus ``rating_rms``/``thd_*`` arrays when a bus LIST was sized
    (I_bg sign convention — positive injects INTO the bus; zeros at
    uncompensated orders).  ``I_bg``: the (H, n) array ready for ``hpf(...,
    I_bg=...)`` / further composition (includes any pre-existing
    background).  ``rating_rms``: the filter's current rating
    ``sqrt(Σ_h |I_c,h|²)`` [pu].  ``thd_before``/``thd_after``: THD_F
    at the compensated bus.  ``result``: the validating HPF solve WITH
    the compensator active.  ``misfit``/``n_solves``: the LM fit's
    terminal misfit and solve count."""
    I_c: Cx
    I_bg: Cx
    rating_rms: float
    thd_before: float
    thd_after: float
    result: object
    misfit: float
    n_solves: int


def size_active_filter(net: Network, devices, settings: Settings,
                       bus: int, *, orders: Optional[Sequence] = None,
                       residual: float = 0.05, steps: int = 20,
                       bound: float = 100.0, V0=None,
                       tol: float = 1e-12) -> ActiveFilterSizing:
    """Size a shunt active filter at ``bus`` (an int, or a list of
    buses for a CO-SIZED bank — one LM fit over every compensator's
    spectrum jointly, each bus targeting its own voltage): the
    injection spectrum collapsing every targeted harmonic voltage to
    ``residual``·V_h (complex target at the base phase — the COMPLEX residual keeps the
    fit nearly linear in the parameters, unlike the magnitude-only
    estimator: the network response to I_c is linear and only the
    device reaction is not).

    ``orders``: harmonic orders to compensate (default: every solved
    order above the fundamental — pass e.g. ``[5, 7]`` for a filter
    rated only for the characteristic pair).  ``steps``/``bound``/
    ``tol`` feed the LM driver (``bound`` clips each re/im component
    of the spectrum, pu).
    """
    import jax

    from .estimate import _lm_fit
    from .harmonic import (harmonic_mismatch, harmonic_state_vector,
                           update_harmonic_voltages)
    from .sensitivity import _solve_columns
    from .utils.precision import highest_precision
    from .ybus import build_ybus

    rd = settings.real_dtype
    hs = [int(h) for h in settings.harmonics]
    H, n, m, c = len(hs), net.n, net.m, net.c
    single = np.isscalar(bus) or isinstance(bus, (int, np.integer))
    buses = [int(bus)] if single else [int(b) for b in bus]
    for b in buses:
        if not 0 <= b < n:
            raise ValueError(f"bus {b} out of range (n={n})")
    if len(set(buses)) != len(buses):
        raise ValueError(f"duplicate buses in {buses}")
    if orders is None:
        orders = tuple(hs[1:])
    orders = tuple(int(o) for o in orders)
    for o in orders:
        if o == 1 or o not in hs:
            raise ValueError(f"order {o} not compensatable (fundamental "
                             f"or outside the harmonic grid)")
    k_idx = jnp.asarray([hs.index(o) for o in orders], jnp.int32)
    nb = len(buses)
    bus_j = jnp.asarray(buses, jnp.int32)

    base = hpf(net, devices, settings, V0=V0)
    if not bool(np.asarray(base.converged)):
        raise RuntimeError("base HPF does not converge — nothing to size "
                           "against")
    thd0 = np.asarray(get_thd(base.V_m).THD_F)[buses]     # (nb,)

    # complex target: the base phasors scaled at the compensated rows
    Vb = cx.polar(base.V_m[:, bus_j], base.V_a[:, bus_j])  # (H, nb)
    tgt = Cx(Vb.re[k_idx] * float(residual),
             Vb.im[k_idx] * float(residual))               # (K, nb)

    def make_ibg(th):                                      # th (nb, K, 2)
        z = jnp.zeros((H, n), rd)
        re = z.at[k_idx[None, :], bus_j[:, None]].add(th[:, :, 0])
        im = z.at[k_idx[None, :], bus_j[:, None]].add(th[:, :, 1])
        return Cx(re, im)

    def project(th):
        return jnp.clip(th, -float(bound), float(bound))

    theta = jnp.zeros((nb, len(orders), 2), rd)

    @jax.jit
    def solve(th, V0):
        return hpf(net, devices, settings, V0=V0, I_bg=make_ibg(th))

    @jax.jit
    def solve_cold(th):
        return hpf(net, devices, settings, V0=V0, I_bg=make_ibg(th))

    @highest_precision
    def _rj(th, V_m, V_a):
        Y = build_ybus(net, settings)
        S = Cx(net.bus_P, net.bus_Q)
        x_star = harmonic_state_vector(V_m, V_a, c)
        dim = x_star.shape[0]

        def f(t):
            return harmonic_mismatch(V_m, V_a, Y, S, devices, m, n, c,
                                     I_bg=make_ibg(t))[0]

        cols = jax.jacfwd(f)(th).reshape(dim, -1)
        dx_cols = -_solve_columns(V_m, V_a, Y, devices, net, settings,
                                  cols)

        def r_of_x(x):
            Vm2, Va2 = update_harmonic_voltages(V_m, V_a, x, H, n, c)
            V = cx.polar(Vm2[:, bus_j][k_idx], Va2[:, bus_j][k_idx])
            return jnp.concatenate([(V.re - tgt.re).ravel(),
                                    (V.im - tgt.im).ravel()])

        r = r_of_x(x_star)
        J = jax.jacfwd(r_of_x)(x_star) @ dx_cols
        return r, J

    rj_at = jax.jit(lambda th, res: _rj(th, res.V_m, res.V_a))
    fit = _lm_fit(theta, project, solve, solve_cold, rj_at,
                  steps=steps, lm_lambda0=1e-3, tol=tol, rd=rd)

    th = np.asarray(fit.scales)                            # (nb, K, 2)
    i_c = np.zeros((nb, H), complex)
    i_c[:, np.asarray(k_idx)] = th[:, :, 0] + 1j * th[:, :, 1]
    I_c = cx.from_numpy(i_c[0] if single else i_c, rd)
    bg = np.zeros((H, n), complex)
    for j, b in enumerate(buses):
        bg[:, b] += i_c[j]
    I_bg = cx.from_numpy(bg, rd)
    res = hpf(net, devices, settings, V0=V0, I_bg=I_bg)
    thd1 = np.asarray(get_thd(res.V_m).THD_F)[buses]
    rating = np.sqrt((np.abs(i_c) ** 2).sum(axis=1))
    return ActiveFilterSizing(
        I_c=I_c, I_bg=I_bg,
        rating_rms=float(rating[0]) if single else rating,
        thd_before=float(thd0[0]) if single else thd0,
        thd_after=float(thd1[0]) if single else thd1,
        result=res, misfit=float(fit.misfit),
        n_solves=int(fit.n_solves))
