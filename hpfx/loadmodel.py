"""Frequency-dependent linear-load models (harmonic damping).

The reference (and hpfx's default) treats linear loads the standard HCNE
way: constant-PQ at the fundamental, OPEN CIRCUIT at harmonic
frequencies — only the bus shunt reactances (hcne_generalized.py:157-161)
load the network above 50 Hz.  Real aggregated loads absorb harmonic
current, and leaving them out makes parallel-resonance peaks (and the
THD they amplify) pessimistically sharp.  Harmonic-study practice folds
a per-bus load admittance Y_load(h) into the network for h > 1; this
module builds that (H, n) diagonal from the loads the network already
carries, and :func:`hpfx.harmonic.hpf`'s ``Y_diag`` threads it through
the solver WITH the stable-mismatch line structure kept consistent
(``LineYbus.d`` carries every diagonal-only term).

Models (per-unit, admittances at nominal |V| = 1; P/Q are the bus's
fundamental load):

- ``"resistive"``:  Y(h) = P — the aggregate behaves as the resistance
  matching its active power; maximal damping, no reactive part.
- ``"parallel_rl"`` (default): parallel R-L matching the fundamental
  P and Q,

      Y(h) = P / r_h  −  j · Q / h,        r_h = 1 − skin + skin·h

  The inductive branch's admittance falls as 1/h (X = h·X1); ``skin``
  (default 0.1) models the conductive branch's series-resistance rise
  with frequency (r_h grows linearly in h; 0 = frequency-flat R).
  These coefficient choices follow common practice for aggregated LV/MV
  load damping (e.g. the CIGRE/Electra aggregate-load guidance family);
  they are study parameters, not physics — expose your own via ``skin``
  or by scaling the returned diagonal.
- ``"motor"``: the reactive part as a locked-rotor branch
  Y(h) = −j·Q/(h·x_lr_ratio) with the active part resistive — for
  motor-dominated buses where the subtransient reactance, not the
  magnetizing branch, loads harmonics.  ``x_lr_ratio`` (default 0.2)
  is X_locked-rotor / X_magnetizing.

The fundamental row is always ZERO: h = 1 behavior stays the constant-PQ
mismatch (bit-identical fundamental solve), matching how the models are
defined on top of a conventional power flow.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .config import Settings
from .cx import Cx
from .network import Network

MODELS = ("resistive", "parallel_rl", "motor")


def damped_structures(net: Network, settings: Settings, Y_diag: Cx):
    """``(Y, lineY, lineY_f)`` with ``Y_diag`` folded into BOTH forms —
    the triple contract of :func:`hpfx.ybus.resolve_ybus`, so damped
    systems thread through ``hpf_sweep``/``hpf_sweep_adaptive`` (and
    both batch layouts) exactly like :func:`hpfx.hpf`'s own ``Y_diag``
    handling (harmonic.py hpf), stable mismatch intact."""
    from .ybus import build_ybus, fold_ydiag, line_ybus_pair
    Y = fold_ydiag(build_ybus(net, settings), Y_diag)
    lineY, lineY_f = line_ybus_pair(net, settings)
    if lineY is not None:
        lineY = lineY._replace(d=lineY.d + Y_diag)
        lineY_f = lineY_f._replace(d=lineY_f.d + Y_diag[:1])
    return Y, lineY, lineY_f


def linear_load_admittance(net: Network, settings: Settings, *,
                           model: str = "parallel_rl",
                           skin: float = 0.1,
                           x_lr_ratio: float = 0.2,
                           buses: Optional[Sequence[int]] = None) -> Cx:
    """(H, n) per-bus load admittances for ``hpf(..., Y_diag=...)`` /
    :func:`hpfx.ybus.fold_ydiag` / ``impedance_scan(Y=...)``.

    ``buses`` defaults to the LINEAR loaded buses (P > 0, bus index
    < ``net.m``): nonlinear buses' harmonic behavior already comes from
    their Norton equivalents, and the slack carries no load.  Pass an
    explicit list to include nonlinear buses' *linear load share* too.
    """
    if model not in MODELS:
        raise ValueError(f"unknown load model {model!r} (use one of "
                         f"{MODELS})")
    rd = settings.real_dtype
    P = np.asarray(net.bus_P)
    Q = np.asarray(net.bus_Q)
    n, H = net.n, settings.n_harmonics
    if buses is None:
        sel = np.flatnonzero((np.arange(n) < net.m) & (P > 0.0))
    else:
        sel = np.asarray([int(b) for b in buses])
        if sel.size and (sel.min() < 0 or sel.max() >= n):
            raise ValueError(f"bus indices out of range (0..{n - 1})")
    mask = np.zeros(n)
    mask[sel] = 1.0

    h = np.asarray(settings.harmonics, float)[:, None]       # (H, 1)
    Pm = (P * mask)[None, :]                                 # (1, n)
    Qm = (Q * mask)[None, :]
    if model == "resistive":
        g = np.broadcast_to(Pm, (H, n)).copy()
        b = np.zeros((H, n))
    elif model == "parallel_rl":
        r_h = 1.0 - skin + skin * h                          # (H, 1)
        g = Pm / r_h
        b = -Qm / h
    else:                                                    # "motor"
        g = np.broadcast_to(Pm, (H, n)).copy()
        b = -Qm / (h * x_lr_ratio)
    g[0] = 0.0                                               # fundamental
    b[0] = 0.0                                               # stays PQ
    return Cx(jnp.asarray(g, rd), jnp.asarray(b, rd))
