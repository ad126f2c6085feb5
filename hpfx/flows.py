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
  a solved case.
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
           "IEEE519_LIMITS", "IEEE519Summary", "ieee519_screen"]


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
