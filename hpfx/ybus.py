"""Per-harmonic admittance (Ybus) assembly.

TPU-native replacement for the reference's nested Python loops
(``hcne_generalized.py:132-171`` build_admittance_matrices): one vectorized
scatter-add over the line arrays builds all harmonics at once into a dense
``(H, n, n)`` complex tensor.  For grid sizes in scope (n up to a few hundred)
dense per-harmonic blocks are the right layout on TPU — the MXU consumes them
directly in the mismatch/Jacobian matvecs, and the global block-diagonal
structure across harmonics is kept implicit (never materialized).

Physics (identical to the reference at tau=1, shift=0):
- series element per line: Ys(h) = 1/(R + j·X·h)        (:151-155)
- off-diagonals: Y[h,f,t] = Y[h,t,f] = -Ys(h)           (:151-155, symmetric)
- diagonals: sum of incident Ys(h) plus, for h != 1 and X_sh != 0, the bus
  shunt 1/(j·X_sh·h)                                     (:157-161)
- pi-model line shunt (G + j·h·B)/2 added at each end   (:162-168)

Transformer extension (capability of ``pi_trafo_pf_test.py:117-145``): lines
may carry a tap ratio ``tau`` and a phase shift.  The reference's formulas are
marked FIXME/unresolved there; this implementation uses the standard pi-model
transformer (tap on the from/HV side, PyPSA convention), which reduces exactly
to the reference equations for tau=1, shift=0:

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

from .config import Settings
from .network import Network


def build_ybus(net: Network, settings: Settings) -> jnp.ndarray:
    """Return the dense (H, n, n) complex admittance tensor, one block per
    harmonic order in ``settings.harmonics``."""
    cd = settings.complex_dtype
    rd = settings.real_dtype
    h = jnp.asarray(settings.harmonics, dtype=rd)[:, None]        # (H, 1)
    n = net.n

    R, X = net.line_R, net.line_X                                  # (L,)
    Ys = 1.0 / (R + 1j * X * h)                                    # (H, L)
    Ys = Ys.astype(cd)
    shift = net.line_shift
    tau = net.line_tau
    t_ft = (tau * jnp.exp(-1j * shift)).astype(cd)                 # (L,)
    t_tf = (tau * jnp.exp(1j * shift)).astype(cd)

    f, t = net.line_from, net.line_to
    Y = jnp.zeros((len(settings.harmonics), n, n), dtype=cd)
    Y = Y.at[:, f, t].add(-Ys / t_ft)
    Y = Y.at[:, t, f].add(-Ys / t_tf)

    # series contribution to diagonals
    Y = Y.at[:, f, f].add(Ys / (tau * tau))
    Y = Y.at[:, t, t].add(Ys)

    # pi-line shunt (G + j·h·B)/2 at each end
    Ysh = (net.line_G + 1j * h * net.line_B).astype(cd) / 2.0      # (H, L)
    if settings.compat_shunt_bug:
        # reference quirk: shunt lands on bus *index* == endpoint 1-based ID;
        # endpoints whose ID exceeds the last index drop out (scatter 'drop')
        f_sh = jnp.where(f + 1 < n, f + 1, n)
        t_sh = jnp.where(t + 1 < n, t + 1, n)
        Y = Y.at[:, f_sh, f_sh].add(Ysh, mode="drop")
        Y = Y.at[:, t_sh, t_sh].add(Ysh, mode="drop")
    else:
        Y = Y.at[:, f, f].add(Ysh / (tau * tau))
        Y = Y.at[:, t, t].add(Ysh)

    # bus shunt reactance, harmonics only (hcne_generalized.py:158-159)
    harm = jnp.asarray(settings.harmonics, dtype=rd)[:, None]      # (H, 1)
    xsh = net.bus_Xsh[None, :]                                     # (1, n)
    apply = (harm != 1.0) & (xsh != 0.0)
    safe_xsh = jnp.where(xsh != 0.0, xsh, 1.0)
    y_sh_bus = jnp.where(apply, (1.0 / (1j * safe_xsh * harm)).astype(cd), 0.0)
    idx = jnp.arange(n)
    Y = Y.at[:, idx, idx].add(y_sh_bus.astype(cd))
    return Y
