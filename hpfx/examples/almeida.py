"""Almeida 2010 single-bus harmonically-coupled Norton equivalent case.

Reproduces the reference's ``example_hcne_almeida.py``: a supply bus with a
*fixed distorted voltage spectrum* feeds one nonlinear load (modeled by a
coupled Norton equivalent) through per-harmonic line impedances.  Because
the HCNE device model is linear in V, the network solves in closed form —
no Newton-Raphson:

    node equation at the load bus (per the paper's two-port partition,
    example_hcne_almeida.py:100-128):
        Y_line∘(V_l - V_s) = I_inj = I_N - Y_N·V_l
    =>  (diag(Y_line) + Y_N)·V_l = I_N + diag(Y_line)·V_s
        I_s = Y_line∘(V_s - V_l)

    which is algebraically identical to the reference's Schur-style block
    formula [[Yss - Ysl·Yll^-1·Yls, Ysl·Yll^-1], ...] (:125-128).

THD is computed on magnitudes — the reference's THD_v at :132 operates on
raw complex components and flags itself "correct? no" in the comment; this
implementation is the corrected version.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import cx
from ..cx import Cx
from ..devices import _as_cx
from ..utils.precision import highest_precision


class TwoPortSolution(NamedTuple):
    V_load: Cx      # (H,) load-bus voltage spectrum
    I_supply: Cx    # (H,) supply current spectrum
    thd_v: jnp.ndarray  # scalar, voltage THD at the load bus


@highest_precision
def linear_hcne_twoport(Y_line, I_N, Y_N, V_supply) -> TwoPortSolution:
    """Solve the supply->line->HCNE-load two-port for all harmonics at once.

    Y_line: (H,) per-harmonic line admittance; I_N: (H,), Y_N: (H, H)
    coupled Norton parameters; V_supply: (H,) applied voltage spectrum.
    """
    Y_line, I_N, Y_N, V_supply = map(_as_cx, (Y_line, I_N, Y_N, V_supply))
    H = I_N.shape[0]
    eye = jnp.eye(H, dtype=Y_line.dtype)
    A = Y_N + Cx(eye * Y_line.re[:, None], eye * Y_line.im[:, None])
    rhs = I_N + Y_line * V_supply
    V_l = cx.solve(A, rhs)
    I_s = Y_line * (V_supply - V_l)
    mag = V_l.abs()
    thd = jnp.sqrt(jnp.sum(mag[1:] ** 2)) / mag[0]
    return TwoPortSolution(V_l, I_s, thd)
