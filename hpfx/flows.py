"""Per-line harmonic power flows, losses, and IEEE-519 compliance.

The reference reports bus voltages and THD only (hcne_generalized.py:
554, 563-572); what the distorted voltages DO to the network — which
line carries which harmonic current, where the losses land, whether the
plan meets the planning levels — is left to the reader.  This module
closes that reporting gap:

- :func:`line_flows`: per-line, per-harmonic complex currents and powers
  at both ends of the exact pi/tap/shift branch model ``build_ybus``
  stamps (same Ys/inv_tau/shift algebra, ybus.py:55-83), plus series +
  shunt-G losses.  Gated by an energy-balance oracle: per harmonic, the
  real power every bus injects equals the total line loss.
- :func:`check_ieee519`: IEEE Std 519-2014 Table 1 voltage distortion
  limits (individual harmonic % and THD % by voltage class) applied to
  a solved case; :func:`ieee519_screen` is the batched sweep version.
- :func:`check_ieee519_current`: the standard's current side (Table 2:
  per-order and TDD limits by short-circuit ratio) on a branch current
  from :func:`line_flows`; :func:`k_factor` gives the IEEE C57.110
  transformer-derating K-factor of the same currents.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import cx
from .config import Settings
from .cx import Cx
from .network import Network
from .results import get_thd

__all__ = ["LineFlows", "line_flows", "IEEE519Report", "check_ieee519",
           "IEEE519_LIMITS", "IEEE519Summary", "ieee519_screen",
           "k_factor", "IEEE519_CURRENT_LIMITS", "IEEE519CurrentReport",
           "check_ieee519_current", "EN50160_LIMITS", "EN50160_THD_LIMIT",
           "EN50160Report", "check_en50160", "en50160_screen",
           "en50160_limit_vector", "PowerIndices", "power_indices",
           "line_power_indices"]


class LineFlows(NamedTuple):
    """Per-line harmonic flow quantities, all (H, L) unless noted.

    ``I_f``/``I_t``: split-complex branch currents INTO the line at the
    from/to terminal.  ``P_f``/``Q_f``/``P_t``/``Q_t``: complex power
    entering the line at each end (pu; both ends measured INTO the
    branch, so P_f + P_t = loss >= 0 on every passive branch).
    ``loss``: per-line, per-harmonic real loss (series R + shunt G).
    ``total_loss``: scalar.
    """
    I_f: Cx
    I_t: Cx
    P_f: jnp.ndarray
    Q_f: jnp.ndarray
    P_t: jnp.ndarray
    Q_t: jnp.ndarray
    loss: jnp.ndarray
    total_loss: jnp.ndarray


def line_flows(net: Network, settings: Settings, V_m, V_a) -> LineFlows:
    """Branch currents/powers/losses from a solved voltage solution.

    Reconstructs each branch's terminal currents with the same series/
    tap/phase/pi-shunt algebra ``build_ybus`` stamps into the bus matrix
    (ybus.py:55-83) — NOT by re-multiplying the dense Y (which cannot
    attribute the diagonal to individual lines).  ``compat_shunt_bug``
    networks intentionally misplace the pi shunts in Ybus; flows here
    always use the physical placement, so the energy-balance oracle only
    holds with the flag off.
    """
    rd = settings.real_dtype
    h = jnp.asarray(settings.harmonics, dtype=rd)[:, None]       # (H, 1)
    R, X = net.line_R, net.line_X
    Xh = X * h                                                   # (H, L)
    d = R * R + Xh * Xh
    Ys = Cx(R / d, -Xh / d)
    tau = net.line_tau
    inv_t_ft = cx.expj(net.line_shift) * (1.0 / tau)
    inv_t_tf = cx.expj(-net.line_shift) * (1.0 / tau)
    Ysh = Cx(jnp.broadcast_to(net.line_G / 2.0, Xh.shape),
             h * net.line_B / 2.0)

    f, t = net.line_from, net.line_to
    V = cx.polar(jnp.asarray(V_m, rd), jnp.asarray(V_a, rd))     # (H, n)
    V_f, V_t = V[:, f], V[:, t]                                  # (H, L)

    I_f = (Ys * (1.0 / (tau * tau)) + Ysh * (1.0 / (tau * tau))) * V_f \
        - (Ys * inv_t_ft) * V_t
    I_t = (Ys + Ysh) * V_t - (Ys * inv_t_tf) * V_f

    S_f = V_f * I_f.conj()
    S_t = V_t * I_t.conj()
    loss = S_f.re + S_t.re
    return LineFlows(I_f=I_f, I_t=I_t,
                     P_f=S_f.re, Q_f=S_f.im, P_t=S_t.re, Q_t=S_t.im,
                     loss=loss, total_loss=jnp.sum(loss))


#: IEEE Std 519-2014 Table 1 — voltage distortion limits at the PCC by
#: bus voltage class: (individual harmonic %, THD %)
IEEE519_LIMITS = (
    (1.0, 5.0, 8.0),        # V <= 1 kV
    (69.0, 3.0, 5.0),       # 1 kV < V <= 69 kV
    (161.0, 1.5, 2.5),      # 69 kV < V <= 161 kV
    (float("inf"), 1.0, 1.5),
)


def _limits_for(v_kv: float, settings: Settings):
    """(individual %, THD %) for the PCC voltage class; ``v_kv=None``
    defaults to the per-unit system's base voltage."""
    if v_kv is None:
        v_kv = settings.base_voltage / 1e3
    for vmax, ind, thd_lim in IEEE519_LIMITS:
        if v_kv <= vmax:
            return ind, thd_lim
    raise AssertionError("unreachable: IEEE519_LIMITS ends with inf")


def _distortion_pct(V_m):
    """(individual ratios (H-1, n) in %, THD_F (n,) in %) for one case."""
    return 100.0 * V_m[1:] / V_m[0], 100.0 * get_thd(V_m).THD_F


class IEEE519Report(NamedTuple):
    """Per-bus IEEE-519 voltage-distortion check (all (n,) unless noted).

    ``ratio``: (H-1, n) individual harmonic magnitudes relative to the
    fundamental (%, orders ``harmonics[1:]``).  ``worst_ratio`` /
    ``worst_order``: the binding individual harmonic per bus.  ``thd``:
    THD_F in %.  ``limit_individual``/``limit_thd``: the applied class
    limits (%).  ``compliant``: both checks pass.
    """
    harmonics: tuple
    ratio: jnp.ndarray
    worst_ratio: jnp.ndarray
    worst_order: jnp.ndarray
    thd: jnp.ndarray
    limit_individual: float
    limit_thd: float
    compliant: jnp.ndarray


def check_ieee519(result, settings: Settings,
                  v_kv: float = None) -> IEEE519Report:
    """Check a solved case against IEEE Std 519-2014 Table 1.

    ``v_kv``: PCC voltage class in kV; defaults to the per-unit system's
    ``settings.base_voltage`` (V).  The check applies one class to all
    buses (the data model carries a single voltage base; per-bus classes
    can be checked by slicing ``ratio``/``thd`` against other rows of
    :data:`IEEE519_LIMITS`).
    """
    ind, thd_lim = _limits_for(v_kv, settings)
    ratio, thd = _distortion_pct(result.V_m)                  # (H-1, n)
    worst = jnp.argmax(ratio, axis=0)
    orders = jnp.asarray(settings.harmonics[1:])
    worst_ratio = jnp.max(ratio, axis=0)
    compliant = (worst_ratio <= ind) & (thd <= thd_lim)
    return IEEE519Report(
        harmonics=tuple(settings.harmonics[1:]),
        ratio=ratio, worst_ratio=worst_ratio, worst_order=orders[worst],
        thd=thd, limit_individual=ind, limit_thd=thd_lim,
        compliant=compliant)


class IEEE519Summary(NamedTuple):
    """Batched IEEE-519 screen over a sweep (leaves (B,) unless noted).

    The hosting-capacity aggregate with the STANDARD's criterion instead
    of a bare THD threshold: real studies bind on whichever of the
    individual-harmonic or THD limits trips first.  ``compliant`` is
    masked by convergence (a non-converged scenario is never claimed
    compliant); ``worst_ratio``/``thd`` are raw per-scenario values and
    are meaningless on non-converged rows — mask with
    ``result.converged`` before aggregating them.  ``frac_violating``
    counts converged scenarios that violate either limit.
    """
    worst_ratio: jnp.ndarray     # worst V_h/V_1 in % over buses+orders
    thd: jnp.ndarray             # worst-bus THD_F in %
    compliant: jnp.ndarray       # bool, converged AND both limits pass
    frac_violating: jnp.ndarray  # scalar, among converged scenarios


def ieee519_screen(result, settings: Settings,
                   v_kv: float = None) -> IEEE519Summary:
    """Apply :func:`check_ieee519`'s limits to a whole batched sweep
    result in one vmapped program — the IEEE-519 counterpart of
    ``hpfx.solve.summarize_thd``, composable with any sweep
    (``hpf_sweep``/``hpf_sweep_adaptive``/the sharded wrappers)."""
    ind, thd_lim = _limits_for(v_kv, settings)

    def one(V_m):
        ratio, thd_bus = _distortion_pct(V_m)
        worst = jnp.max(ratio)
        thd = jnp.max(thd_bus)
        return worst, thd, (worst <= ind) & (thd <= thd_lim)

    worst, thd, ok = jax.vmap(one)(result.V_m)
    conv = result.converged
    ok = ok & conv
    viol = (~ok) & conv
    denom = jnp.maximum(jnp.sum(conv.astype(worst.dtype)), 1.0)
    return IEEE519Summary(
        worst_ratio=worst, thd=thd, compliant=ok,
        frac_violating=jnp.sum(viol.astype(worst.dtype)) / denom)


class PowerIndices(NamedTuple):
    """IEEE Std 1459-2010 single-phase power decomposition at a metering
    point, from per-harmonic rms phasors.  All leaves share the trailing
    (batch) shape of the inputs; powers in pu on the system base.

    The decomposition is the exact identity
    ``S² = S1² + D_I² + D_V² + S_H²`` — fundamental apparent power plus
    current-distortion, voltage-distortion and harmonic apparent powers —
    with ``N = sqrt(S² − P²)`` the nonactive power and
    ``D_H = sqrt(S_H² − P_H²)`` the harmonic distortion power.  ``pf`` is
    the TRUE power factor P/S (what the meter bills); ``dpf`` the
    displacement factor P1/S1 (what a fundamental-only model sees) —
    under distortion ``pf < dpf``, the gap capacitor banks cannot fix.
    """
    P: jnp.ndarray       # total active power (all harmonics)
    P1: jnp.ndarray      # fundamental active power
    P_H: jnp.ndarray     # harmonic active power P − P1
    Q1: jnp.ndarray      # fundamental reactive power
    S: jnp.ndarray       # apparent power V_rms · I_rms
    S1: jnp.ndarray      # fundamental apparent power
    S_H: jnp.ndarray     # harmonic apparent power V_H · I_H
    D_I: jnp.ndarray     # current distortion power V1 · I_H
    D_V: jnp.ndarray     # voltage distortion power V_H · I1
    D_H: jnp.ndarray     # harmonic distortion power
    N: jnp.ndarray       # nonactive power sqrt(S² − P²)
    pf: jnp.ndarray      # true power factor P / S
    dpf: jnp.ndarray     # displacement power factor P1 / S1
    thd_v: jnp.ndarray   # V_H / V1
    thd_i: jnp.ndarray   # I_H / I1


def power_indices(V: Cx, I: Cx) -> PowerIndices:
    """IEEE 1459 decomposition from per-harmonic phasors ``V``/``I``,
    split-complex with the harmonic axis FIRST ((H, ...) — the library's
    standard layout; e.g. one bus column of the solved state against one
    terminal of :func:`line_flows`).  The reference stops at voltage THD
    (hcne_generalized.py:563-572); these are the standard billing/rating
    quantities a distortion study feeds.  Jit/vmap-safe.
    """
    s_h = V * I.conj()                                   # (H, ...)
    P1, Q1 = s_h.re[0], s_h.im[0]
    P = jnp.sum(s_h.re, axis=0)
    P_H = P - P1
    v2, i2 = V.abs2(), I.abs2()
    eps = jnp.finfo(v2.dtype).tiny
    V1, I1 = jnp.sqrt(v2[0]), jnp.sqrt(i2[0])
    V_H = jnp.sqrt(jnp.sum(v2[1:], axis=0))
    I_H = jnp.sqrt(jnp.sum(i2[1:], axis=0))
    S1 = V1 * I1
    S_H = V_H * I_H
    D_I = V1 * I_H
    D_V = V_H * I1
    S = jnp.sqrt(jnp.sum(v2, axis=0) * jnp.sum(i2, axis=0))
    # clamp the differences of squares against fp cancellation
    N = jnp.sqrt(jnp.maximum(S * S - P * P, 0.0))
    D_H = jnp.sqrt(jnp.maximum(S_H * S_H - P_H * P_H, 0.0))
    return PowerIndices(P=P, P1=P1, P_H=P_H, Q1=Q1, S=S, S1=S1, S_H=S_H,
                        D_I=D_I, D_V=D_V, D_H=D_H, N=N,
                        pf=P / jnp.maximum(S, eps),
                        dpf=P1 / jnp.maximum(S1, eps),
                        thd_v=V_H / jnp.maximum(V1, eps),
                        thd_i=I_H / jnp.maximum(I1, eps))


def line_power_indices(net: Network, settings: Settings, V_m, V_a,
                       side: str = "from") -> PowerIndices:
    """IEEE 1459 indices of every line terminal ((L,) leaves): the
    metering-point view of a solved state.  ``side``: which terminal
    carries the meter (``"from"``/``"to"``; current INTO the branch,
    matching :class:`LineFlows`)."""
    if side not in ("from", "to"):
        raise ValueError(f"unknown side {side!r}: use 'from' or 'to'")
    fl = line_flows(net, settings, V_m, V_a)
    rd = settings.real_dtype
    V = cx.polar(jnp.asarray(V_m, rd), jnp.asarray(V_a, rd))
    bus = net.line_from if side == "from" else net.line_to
    I = fl.I_f if side == "from" else fl.I_t
    return power_indices(Cx(V.re[:, bus], V.im[:, bus]), I)


def k_factor(I_m: jnp.ndarray, harmonics) -> jnp.ndarray:
    """IEEE C57.110 transformer K-factor from harmonic current
    magnitudes: ``K = sum_h (I_h/I_rms)^2 h^2 / sum_h (I_h/I_rms)^2``
    — the eddy-loss multiplier used to derate transformers feeding
    nonlinear load.  ``I_m``: (H, ...) per-harmonic magnitudes (e.g.
    ``line_flows(...).I_f.abs()``); returns the trailing shape.

    K = 1 for a purely fundamental current; a typical office-building
    feeder runs K 4-9; K-13/K-20 rated transformers cover the range.
    """
    h = jnp.asarray(harmonics, I_m.dtype).reshape(
        (-1,) + (1,) * (I_m.ndim - 1))
    w = I_m * I_m
    return jnp.sum(w * h * h, axis=0) / jnp.maximum(
        jnp.sum(w, axis=0), jnp.finfo(I_m.dtype).tiny)


#: IEEE Std 519-2014 Table 2 — current distortion limits at the PCC
#: (120 V..69 kV) by short-circuit ratio Isc/IL: rows are
#: (max Isc/IL, limits % for odd-harmonic ranges h<11, 11<=h<17,
#:  17<=h<23, 23<=h<35, 35<=h<=50, TDD %).  Even harmonics are limited
#: to 25% of the odd limit in the standard; the checker applies that.
IEEE519_CURRENT_LIMITS = (
    (20.0, 4.0, 2.0, 1.5, 0.6, 0.3, 5.0),
    (50.0, 7.0, 3.5, 2.5, 1.0, 0.5, 8.0),
    (100.0, 10.0, 4.5, 4.0, 1.5, 0.7, 12.0),
    (1000.0, 12.0, 5.5, 5.0, 2.0, 1.0, 15.0),
    (float("inf"), 15.0, 7.0, 6.0, 2.5, 1.4, 20.0),
)


class IEEE519CurrentReport(NamedTuple):
    """IEEE-519 Table 2 current-distortion check for ONE measured branch
    current (the PCC feeder).

    ``ratio``: (H-1,) per-harmonic I_h/I_L in % (orders
    ``harmonics``).  ``limits``: (H-1,) the applicable per-order limit
    (odd-range limits; evens at 25% of the range value).  ``tdd``: total
    demand distortion in %.  ``compliant``: every order within its limit
    AND TDD within the class limit.
    """
    harmonics: tuple
    ratio: jnp.ndarray
    limits: jnp.ndarray
    tdd: jnp.ndarray
    limit_tdd: float
    compliant: jnp.ndarray


def check_ieee519_current(I_m: jnp.ndarray, harmonics, isc_over_il: float,
                          i_load: float = None) -> IEEE519CurrentReport:
    """Check one branch current spectrum against IEEE Std 519-2014
    Table 2 (PCC current distortion, 120 V..69 kV systems).

    ``I_m``: (H,) per-harmonic current magnitudes for the monitored
    branch (e.g. one column of ``line_flows(...).I_f.abs()``).
    ``isc_over_il``: the PCC short-circuit ratio selecting the limit
    row.  ``i_load``: the maximum demand load current I_L the ratios
    are normalized by — defaults to the fundamental of ``I_m`` (i.e.
    treats the studied case as the maximum-demand case).
    """
    for row in IEEE519_CURRENT_LIMITS:
        if isc_over_il <= row[0]:
            break
    _, l11, l17, l23, l35, l50, tdd_lim = row
    hs = tuple(int(x) for x in harmonics)
    i_l = jnp.asarray(I_m)[0] if i_load is None else i_load

    def order_limit(h):
        base = (l11 if h < 11 else l17 if h < 17 else l23 if h < 23
                else l35 if h < 35 else l50)
        return base if h % 2 == 1 else 0.25 * base

    limits = jnp.asarray([order_limit(h) for h in hs[1:]], jnp.asarray(I_m).dtype)
    ratio = 100.0 * I_m[1:] / i_l
    tdd = 100.0 * jnp.sqrt(jnp.sum(I_m[1:] ** 2)) / i_l
    compliant = jnp.all(ratio <= limits) & (tdd <= tdd_lim)
    return IEEE519CurrentReport(
        harmonics=hs[1:], ratio=ratio, limits=limits, tdd=tdd,
        limit_tdd=tdd_lim, compliant=compliant)


#: EN 50160 (and the aligned IEC 61000-2-2 LV compatibility levels) —
#: individual harmonic voltage limits in % of the fundamental, by order,
#: for LV/MV supply terminals, plus THD <= 8%.  Orders above 25 carry no
#: tabulated value in the standard ("values are not given as they are
#: usually small") — they are UNCONSTRAINED here (limit inf); screen
#: them separately if your study needs a high-order bound.
EN50160_LIMITS = {
    # odd non-triplen
    5: 6.0, 7: 5.0, 11: 3.5, 13: 3.0, 17: 2.0, 19: 1.5, 23: 1.5, 25: 1.5,
    # odd triplen
    3: 5.0, 9: 1.5, 15: 0.5, 21: 0.5,
    # even
    2: 2.0, 4: 1.0, 6: 0.5, 8: 0.5, 10: 0.5, 12: 0.5, 14: 0.5, 16: 0.5,
    18: 0.5, 20: 0.5, 22: 0.5, 24: 0.5,
}

EN50160_THD_LIMIT = 8.0


def en50160_limit_vector(harmonics) -> jnp.ndarray:
    """Per-order limit vector (%) aligned with ``harmonics[1:]`` —
    orders outside the EN 50160 table (h > 25) map to +inf."""
    return jnp.asarray([EN50160_LIMITS.get(int(h), float("inf"))
                        for h in tuple(harmonics)[1:]])


class EN50160Report(NamedTuple):
    """Per-bus EN 50160 voltage-quality check.

    ``ratio``: (H-1, n) individual harmonic magnitudes in % of the
    fundamental (orders ``harmonics``).  ``limits``: (H-1,) the
    per-order table values (inf above h=25).  ``margin``: (H-1, n)
    ``limits - ratio`` (negative = violating; inf rows are untabulated).
    ``worst_order``: the per-bus order with the smallest margin among
    tabulated rows.  ``compliant``: every tabulated order within its
    limit AND THD_F <= 8%.
    """
    harmonics: tuple
    ratio: jnp.ndarray
    limits: jnp.ndarray
    margin: jnp.ndarray
    worst_order: jnp.ndarray
    thd: jnp.ndarray
    compliant: jnp.ndarray


def check_en50160(result, settings: Settings) -> EN50160Report:
    """Check a solved case against EN 50160's per-order voltage limits.

    Unlike IEEE 519's single individual-harmonic percentage
    (:func:`check_ieee519`), EN 50160 binds each order to its own table
    value — triplens and evens are held much tighter than the 5th/7th.
    Complements :mod:`hpfx.iec`'s planning-level machinery (IEC
    61000-3-6 apportions emission HEADROOM; EN 50160 is the delivered
    voltage-quality contract).
    """
    ratio, thd = _distortion_pct(result.V_m)                 # (H-1, n)
    limits = en50160_limit_vector(settings.harmonics).astype(ratio.dtype)
    margin = limits[:, None] - ratio
    tab = jnp.isfinite(limits)
    # untabulated rows never bind; give them +inf margin for the argmin
    margin_t = jnp.where(tab[:, None], margin, jnp.inf)
    orders = jnp.asarray(settings.harmonics[1:])
    worst = jnp.argmin(margin_t, axis=0)
    compliant = jnp.all(margin_t >= 0.0, axis=0) & (thd <= EN50160_THD_LIMIT)
    return EN50160Report(
        harmonics=tuple(settings.harmonics[1:]), ratio=ratio,
        limits=limits, margin=margin, worst_order=orders[worst],
        thd=thd, compliant=compliant)


def en50160_screen(result, settings: Settings):
    """Batched EN 50160 screen over a sweep result — returns an
    :class:`IEEE519Summary`-shaped tuple (worst margin utilization in
    place of ``worst_ratio``: max over tabulated orders and buses of
    ratio/limit, in % of the limit)."""
    limits = en50160_limit_vector(settings.harmonics)
    tab = jnp.isfinite(limits)
    safe = jnp.where(tab, limits, 1.0)

    def one(V_m):
        ratio, thd_bus = _distortion_pct(V_m)
        util = jnp.where(tab[:, None], 100.0 * ratio / safe[:, None], 0.0)
        worst = jnp.max(util)
        thd = jnp.max(thd_bus)
        return worst, thd, (worst <= 100.0) & (thd <= EN50160_THD_LIMIT)

    worst, thd, ok = jax.vmap(one)(result.V_m)
    conv = result.converged
    ok = ok & conv
    viol = (~ok) & conv
    denom = jnp.maximum(jnp.sum(conv.astype(worst.dtype)), 1.0)
    return IEEE519Summary(
        worst_ratio=worst, thd=thd, compliant=ok,
        frac_violating=jnp.sum(viol.astype(worst.dtype)) / denom)
