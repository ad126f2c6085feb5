"""Fundamental-frequency Newton-Raphson power flow.

TPU-native re-design of the reference fundamental solver
(``hcne_generalized.py:187-275``: init_fund_state_vec, fund_mismatch,
build_jacobian, update_fund_state_vec, update_fund_voltages, pf), which is in
turn PyPSA-style (see the permalink cited at hcne_generalized.py:8-9).

Differences from the reference's implementation (not its math):
- the NR iteration is a ``lax.while_loop`` with a (V, x, f, err, iter) carry,
  traced once and compiled by XLA; no Python-level looping,
- the Jacobian is a dense (2n-1-c)^2 real matrix assembled from broadcasted
  complex algebra (no scipy.sparse); at these sizes dense LU on the MXU beats
  any sparse path on TPU,
- everything is shape-static: the slack/PV/PQ partition enters through the
  static constants n, c (hcne_generalized.py:113-128), so slicing is
  compile-time.

State layout (identical to the reference so states compare element-for-
element): ``x = [V_a[1:], V_m[c:]]`` — angles of all non-slack buses, then
magnitudes of all non-PV/non-slack buses (hcne_generalized.py:187-192).

Sign convention: mismatch = V*conj(Y1@V) + S with S > 0 for loads
(hcne_generalized.py:195-198).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .config import Settings
from .network import Network


class FundResult(NamedTuple):
    V_m: jnp.ndarray       # (n,)
    V_a: jnp.ndarray       # (n,)
    err: jnp.ndarray       # scalar, final max-abs mismatch
    n_iter: jnp.ndarray    # scalar int
    err_hist: jnp.ndarray  # (max_iter_f,), NaN-padded
    converged: jnp.ndarray


def fund_mismatch(V_m, V_a, Y1, S, c: int):
    """Power mismatch and its residual (hcne_generalized.py:195-202).

    f = [Re(mis)[1:], Im(mis)[c:]] where mis = V∘conj(Y1·V) + S;
    err is the max-abs entry.
    """
    V = V_m * jnp.exp(1j * V_a)
    mis = V * jnp.conj(Y1 @ V) + S
    f = jnp.concatenate([mis.real[1:], mis.imag[c:]])
    return f, jnp.max(jnp.abs(f))


def fund_jacobian(V_m, V_a, Y1, n: int, c: int):
    """Dense fundamental Jacobian (hcne_generalized.py:205-223).

    Complex derivation (PyPSA style):
        dS/dA[i,j] = j·V_i · conj(δ_ij·I_i − Y_ij·V_j)
        dS/dV[i,j] = δ_ij·Vn_i·conj(I_i) + V_i·conj(Y_ij·Vn_j)
    with I = Y1·V, Vn = V/|V|; blocks [[Re dSdA[1:,1:], Re dSdV[1:,c:]],
    [Im dSdA[c:,1:], Im dSdV[c:,c:]]].
    """
    V = V_m * jnp.exp(1j * V_a)
    I = Y1 @ V
    Vn = V / jnp.abs(V)
    eye = jnp.eye(n, dtype=V.dtype)
    dSdA = 1j * V[:, None] * jnp.conj(eye * I[:, None] - Y1 * V[None, :])
    dSdV = eye * (Vn * jnp.conj(I))[:, None] + \
        V[:, None] * jnp.conj(Y1 * Vn[None, :])
    return jnp.block([
        [dSdA[1:, 1:].real, dSdV[1:, c:].real],
        [dSdA[c:, 1:].imag, dSdV[c:, c:].imag],
    ])


def init_fund_voltages(net: Network, settings: Settings):
    rd = settings.real_dtype
    V_m = jnp.full((net.n,), settings.v_init_f, dtype=rd)
    V_a = jnp.full((net.n,), settings.a_init_f, dtype=rd)
    return V_m, V_a


def solve_fundamental(Y1, net: Network, settings: Settings) -> FundResult:
    """Fundamental NR loop (pf, hcne_generalized.py:244-275) as a jittable
    ``lax.while_loop``.  Safe under vmap: JAX's while-loop batching rule
    predicates the carry per batch element, so each scenario stops updating
    exactly when its own convergence test fires — matching serial behavior."""
    n, c = net.n, net.c
    S = (net.bus_P + 1j * net.bus_Q).astype(settings.complex_dtype)
    V_m, V_a = init_fund_voltages(net, settings)

    x0 = jnp.concatenate([V_a[1:], V_m[c:]])
    f0, err0 = fund_mismatch(V_m, V_a, Y1, S, c)
    hist0 = jnp.full((settings.max_iter_f,), jnp.nan, settings.real_dtype)

    def cond(carry):
        _, _, _, _, err, it, _ = carry
        return (err > settings.thresh_f) & (it < settings.max_iter_f)

    def body(carry):
        V_m, V_a, x, f, err, it, hist = carry
        J = fund_jacobian(V_m, V_a, Y1, n, c)
        x = x - jnp.linalg.solve(J, f)
        V_a = V_a.at[1:].set(x[: n - 1])
        V_m = V_m.at[c:].set(x[n - 1:])
        f, err = fund_mismatch(V_m, V_a, Y1, S, c)
        hist = hist.at[it].set(err)
        return V_m, V_a, x, f, err, it + 1, hist

    V_m, V_a, _, _, err, n_iter, hist = lax.while_loop(
        cond, body, (V_m, V_a, x0, f0, err0, jnp.int32(0), hist0))
    return FundResult(V_m, V_a, err, n_iter, hist,
                      err <= settings.thresh_f)


def pf(Y, net: Network, settings: Settings) -> FundResult:
    """Convenience wrapper taking the (H, n, n) Ybus tensor and using its
    fundamental block, as the reference's pf does (hcne_generalized.py:255)."""
    return solve_fundamental(Y[0], net, settings)
