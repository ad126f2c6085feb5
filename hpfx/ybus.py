"""Per-harmonic admittance (Ybus) assembly — split-complex, TPU-native.

TPU-native replacement for the reference's nested Python loops
(``hcne_generalized.py:132-171`` build_admittance_matrices): one vectorized
scatter-add over the line arrays builds all harmonics at once into a dense
``(H, n, n)`` split-complex tensor (``hpfx.cx.Cx``: separate re/im real
arrays — this image's TPU backend has no complex element types, and split
storage is the MXU-friendly layout anyway).  For grid sizes in scope
(n up to a few hundred) dense per-harmonic blocks are the right layout on
TPU; the global block-diagonal structure across harmonics stays implicit.

Physics (identical to the reference at tau=1, shift=0):
- series element per line: Ys(h) = 1/(R + j·X·h)        (:151-155)
- off-diagonals: Y[h,f,t] = Y[h,t,f] = -Ys(h)           (:151-155, symmetric)
- diagonals: sum of incident Ys(h) plus, for h != 1 and X_sh != 0, the bus
  shunt 1/(j·X_sh·h)                                     (:157-161)
- pi-model line shunt (G + j·h·B)/2 added at each end   (:162-168)

Transformer extension (capability of ``pi_trafo_pf_test.py:117-145``): lines
may carry a tap ratio ``tau`` and a phase shift.  The reference's formulas
are marked FIXME/unresolved there; this implementation uses the standard
pi-model transformer (tap on the from/HV side, PyPSA convention), which
reduces exactly to the reference equations for tau=1, shift=0:

    Y[h,f,t] = -Ys / (tau·e^{-j·shift})
    Y[h,t,f] = -Ys / (tau·e^{+j·shift})
    Y[h,f,f] += (Ys + Ysh/2) / tau**2
    Y[h,t,t] +=  Ys + Ysh/2

``Settings.compat_shunt_bug`` reproduces the reference's line-shunt indexing
quirk (G/B shunts attributed to the bus whose *index* equals the endpoint's
1-based ID; hcne_generalized.py:166) for bug-compatible validation on nets
with nonzero G/B.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import cx
from .config import Settings
from .cx import Cx
from .network import Network


def build_ybus(net: Network, settings: Settings) -> Cx:
    """Return the dense (H, n, n) split-complex admittance tensor, one block
    per harmonic order in ``settings.harmonics``."""
    rd = settings.real_dtype
    h = jnp.asarray(settings.harmonics, dtype=rd)[:, None]        # (H, 1)
    n = net.n
    _all = slice(None)

    R, X = net.line_R, net.line_X                                  # (L,)
    Xh = X * h                                                     # (H, L)
    d = R * R + Xh * Xh
    Ys = Cx(R / d, -Xh / d)                                        # 1/(R+jXh)
    tau = net.line_tau
    inv_t_ft = cx.expj(net.line_shift) * (1.0 / tau)   # 1/(tau·e^{-j·shift})
    inv_t_tf = cx.expj(-net.line_shift) * (1.0 / tau)

    f, t = net.line_from, net.line_to
    Y = cx.zeros((len(settings.harmonics), n, n), rd)
    Y = Y.at_add((_all, f, t), -(Ys * inv_t_ft))
    Y = Y.at_add((_all, t, f), -(Ys * inv_t_tf))

    # series contribution to diagonals
    Y = Y.at_add((_all, f, f), Ys * (1.0 / (tau * tau)))
    Y = Y.at_add((_all, t, t), Ys)

    # pi-line shunt (G + j·h·B)/2 at each end
    Ysh = Cx(jnp.broadcast_to(net.line_G / 2.0, Xh.shape), h * net.line_B / 2.0)
    if settings.compat_shunt_bug:
        # reference quirk: shunt lands on bus *index* == endpoint 1-based ID;
        # endpoints whose ID exceeds the last index drop out (scatter 'drop')
        f_sh = jnp.where(f + 1 < n, f + 1, n)
        t_sh = jnp.where(t + 1 < n, t + 1, n)
        Y = Y.at_add((_all, f_sh, f_sh), Ysh, mode="drop")
        Y = Y.at_add((_all, t_sh, t_sh), Ysh, mode="drop")
    else:
        Y = Y.at_add((_all, f, f), Ysh * (1.0 / (tau * tau)))
        Y = Y.at_add((_all, t, t), Ysh)

    # bus shunt reactance, harmonics only (hcne_generalized.py:158-159):
    # 1/(j·X_sh·h) = -j/(X_sh·h)
    xsh = net.bus_Xsh[None, :]                                     # (1, n)
    apply = (h != 1.0) & (xsh != 0.0)
    safe = jnp.where(xsh != 0.0, xsh, 1.0)
    y_sh_im = jnp.where(apply, -1.0 / (safe * h), 0.0)
    idx = jnp.arange(n)
    Y = Y.at_add((_all, idx, idx), Cx(jnp.zeros_like(y_sh_im), y_sh_im))
    return Y
