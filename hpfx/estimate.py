"""Harmonic source estimation: fit device injection levels to measured
bus-voltage spectra.

The reference solves the FORWARD problem (given device Norton
equivalents at known levels, compute the distorted voltages).  Utilities
usually face the INVERSE one: power-quality meters record |V(h)| at a
few buses, and the question is which converters are running at what
level — source localization.  Because every hpfx solve is
differentiable, the inverse problem is damped Gauss-Newton
(Levenberg-Marquardt) on the exact residual Jacobian: the implicit
function theorem gives dx*/dtheta (the same column-solve machinery as
:mod:`hpfx.sensitivity`), chain-ruled onto the per-measurement residuals

    r(theta)[h, b] = |V(h, b; theta)| - |V_meas(h, b)|,  b in observed

so each LM iteration costs ONE HPF solve + one (dim, n_theta) column
solve and the fit typically lands at the measurement-noise floor in
well under ten solves.  Magnitude-only (no phase measurements needed),
partial observability supported (``buses`` selects the metered subset —
localization works from buses that host no device at all).

Passing a :class:`hpfx.devices.DeviceLibrary` instead of a DeviceSet
fits the full (n_nl, T) device-MIX weights — not just how hard each
source runs but WHICH device type sits at each bus (the Norton
parameters are linear in the mix, so the same LM machinery applies).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import Settings
from .cx import Cx
from .harmonic import (harmonic_mismatch, harmonic_state_vector, hpf,
                       update_harmonic_voltages)
from .network import Network
from .sensitivity import _solve_columns
from .utils.precision import highest_precision
from .ybus import build_ybus

__all__ = ["BackgroundEstimate", "EstimateResult", "estimate_background",
           "estimate_injections"]


def _apply(devices, theta):
    """DeviceSet at the fit parameters: per-device scales for a
    DeviceSet, (n_nl, T) mix weights for a DeviceLibrary."""
    from .devices import DeviceLibrary
    if isinstance(devices, DeviceLibrary):
        return devices.mixed(theta)
    return devices.scale(theta)


class EstimateResult(NamedTuple):
    """Outcome of :func:`estimate_injections`.

    ``scales``: (n_nl,) fitted per-device injection scales.  ``misfit``/
    ``misfit0``: sum-of-squares measurement residual at the fit / at the
    start.  ``history``: misfit after each accepted LM step (NaN =
    rejected/diverged proposal).  ``result``: the HPFResult at the
    fitted scales.
    """
    scales: jnp.ndarray
    misfit: float
    misfit0: float
    history: np.ndarray
    n_solves: int
    result: object


@highest_precision
def _residuals_and_jac(net, devices, settings, V_m, V_a, V_meas, obs,
                       theta, w):
    """(r, J): per-measurement residuals and their exact Jacobian wrt
    the per-device scales, at the converged operating point (V_m, V_a).

    J = dR/dx · dx*/dtheta with dx*/dtheta = -J_f^{-1} ∂f/∂theta (IFT);
    one jacfwd over theta + one batched column solve + one jacfwd of the
    (linear-ish) state->residual map.
    """
    H, n, c, m = settings.n_harmonics, net.n, net.c, net.m
    Y = build_ybus(net, settings)
    S = Cx(net.bus_P, net.bus_Q)
    x_star = harmonic_state_vector(V_m, V_a, c)
    dim = x_star.shape[0]

    def f(th):
        return harmonic_mismatch(V_m, V_a, Y, S, _apply(devices, th),
                                 m, n, c)[0]

    cols = jax.jacfwd(f)(theta).reshape(dim, -1)          # (dim, n_theta)
    dx_cols = -_solve_columns(V_m, V_a, Y, _apply(devices, theta), net,
                              settings, cols)

    def r_of_x(x):
        Vm2, _ = update_harmonic_voltages(V_m, V_a, x, H, n, c)
        return (w * (Vm2[:, obs] - V_meas)).ravel()

    r = r_of_x(x_star)
    J = jax.jacfwd(r_of_x)(x_star) @ dx_cols              # (R, n_nl)
    return r, J


def estimate_injections(
    net: Network, devices, settings: Settings, V_meas_m, *,
    buses: Optional[Sequence[int]] = None,
    scales0=1.0, steps: int = 25, bounds=(0.0, 3.0),
    p_scale=1.0, q_scale=1.0, weights=None,
    lm_lambda0: float = 1e-3, tol: float = 1e-9,
) -> EstimateResult:
    """Fit per-device injection scales to measured |V(h)| spectra by
    Levenberg-Marquardt on the exact IFT residual Jacobian.

    ``V_meas_m``: (H, n) measured voltage magnitudes on the settings'
    harmonic grid; only rows of ``buses`` (default: all buses) enter the
    misfit — unobserved buses may hold anything (zeros).  ``weights``:
    ``None`` (absolute residuals), ``"relative"`` (each residual scaled
    by 1/|V_meas| — the right statistic for multiplicative meter noise,
    where absolute least squares lets the large-but-noisy fundamental
    rows bias the fit), or an explicit (H, n_observed) array.
    ``scales0``:
    scalar or (n_nl,) starting guess.  ``p_scale``/``q_scale``: the
    (known) load level the measurements were taken at.  ``steps``: max
    LM iterations; the loop stops early when a step improves the misfit
    by less than ``tol`` RELATIVE to its value (stagnation at the
    residual floor).  Proposals are projected onto ``bounds`` and
    must converge (warm-started solve, cold retry) — rejected proposals
    raise the damping and retry, the classical LM schedule.
    """
    from .devices import DeviceLibrary

    rd = settings.real_dtype
    n_nl = net.n_nonlinear
    shape = ((n_nl, devices.n_types)
             if isinstance(devices, DeviceLibrary) else (n_nl,))
    # the (known) load level applies to the solves AND the mismatch the
    # Jacobian differentiates (both see the same scaled net)
    net = dataclasses.replace(
        net, bus_P=net.bus_P * jnp.asarray(p_scale, rd),
        bus_Q=net.bus_Q * jnp.asarray(q_scale, rd))
    obs = (jnp.arange(net.n) if buses is None
           else jnp.asarray(list(buses), jnp.int32))
    V_meas = jnp.asarray(V_meas_m, rd)[:, obs]
    if weights is None:
        w = jnp.ones_like(V_meas)
    elif isinstance(weights, str) and weights == "relative":
        w = 1.0 / jnp.maximum(V_meas, 1e-6)
    else:
        w = jnp.asarray(weights, rd)

    def project(th):
        return jnp.clip(th, *bounds)

    theta = project(jnp.broadcast_to(
        jnp.asarray(scales0, rd), shape).astype(rd))

    @jax.jit
    def solve(th, V0):
        return hpf(net, _apply(devices, th), settings, V0=V0)

    @jax.jit
    def solve_cold(th):
        return hpf(net, _apply(devices, th), settings)

    @jax.jit
    def rj_at(th, res):
        return _residuals_and_jac(net, devices, settings,
                                  res.V_m, res.V_a, V_meas, obs, th, w)

    return _lm_fit(theta, project, solve, solve_cold, rj_at,
                   steps=steps, lm_lambda0=lm_lambda0, tol=tol, rd=rd)


def _lm_fit(theta, project, solve, solve_cold, rj_at, *,
            steps: int, lm_lambda0: float, tol: float, rd) -> EstimateResult:
    """The damped Gauss-Newton driver shared by the estimators.

    ``solve(th, V0)``/``solve_cold(th)``: HPF at parameters ``th``;
    ``rj_at(th, res)``: (residuals, Jacobian wrt th.ravel()) at the
    converged point.  Proposals are projected, must converge (warm then
    cold retry), and must improve the misfit; rejected proposals raise
    the damping — the classical LM schedule.
    """
    res = solve_cold(theta)
    if not bool(np.asarray(res.converged)):
        raise RuntimeError("HPF does not converge at the starting "
                           "parameters")
    n_solves = 1
    r, J = rj_at(theta, res)
    misfit = misfit0 = float(np.asarray(r @ r))
    history = []
    lam = lm_lambda0

    for _ in range(steps):
        Jn, rn = np.asarray(J), np.asarray(r)
        JtJ, Jtr = Jn.T @ Jn, Jn.T @ rn
        accepted = False
        for _try in range(8):
            step = np.linalg.solve(
                JtJ + lam * np.diag(np.maximum(np.diag(JtJ), 1e-12)),
                -Jtr)
            proposal = project(
                theta + jnp.asarray(step, rd).reshape(theta.shape))
            cand = solve(proposal, (res.V_m, res.V_a))
            n_solves += 1
            if not bool(np.asarray(cand.converged)):
                cand = solve_cold(proposal)
                n_solves += 1
            if bool(np.asarray(cand.converged)):
                r_c, J_c = rj_at(proposal, cand)
                m_c = float(np.asarray(r_c @ r_c))
                if m_c < misfit:
                    theta, res, r, J = proposal, cand, r_c, J_c
                    improved = misfit - m_c
                    misfit = m_c
                    lam = max(lam / 3.0, 1e-12)
                    accepted = True
                    break
            lam *= 10.0
        history.append(misfit if accepted else float("nan"))
        if not accepted or improved < tol * misfit + 1e-300:
            break

    return EstimateResult(
        scales=theta, misfit=misfit, misfit0=misfit0,
        history=np.asarray(history, dtype=np.float64),
        n_solves=n_solves, result=res)


class BackgroundEstimate(NamedTuple):
    """Outcome of :func:`estimate_background`.

    ``v_bg``: (n_orders,) fitted complex background Thevenin voltages
    (per-unit phasors at ``orders``; injected Norton currents instead
    when the fit ran with ``as_current=True``).  ``orders``: the fitted
    harmonic orders.  Remaining fields as :class:`EstimateResult`.
    """
    v_bg: np.ndarray
    orders: tuple
    misfit: float
    misfit0: float
    history: np.ndarray
    n_solves: int
    result: object


def estimate_background(
    net: Network, devices, settings: Settings, V_meas_m, *,
    orders: Sequence[int], bus: int = 0,
    buses: Optional[Sequence[int]] = None,
    steps: int = 25, bound: float = 0.2,
    p_scale=1.0, q_scale=1.0, weights=None,
    lm_lambda0: float = 1e-3, tol: float = 1e-9,
    as_current: bool = False,
) -> BackgroundEstimate:
    """Fit the upstream background spectrum to measured |V(h)| — the
    inverse of :mod:`hpfx.background`.

    The DEVICE SET is known (today's installation); the unknown is what
    the rest of the grid superposes through the connection ``bus``:
    complex Thevenin voltages V_bg(h) at the given ``orders``, behind
    the bus's X_sh (or injected Norton currents directly with
    ``as_current=True``).  Parameters are the re/im parts — the Norton
    term is LINEAR in them, so ∂f/∂θ is exact in one jacfwd and the
    angle-wrap pathologies of a polar parametrization never arise.
    Magnitude-only meters anchor the phase through interference with
    the device emissions, so the complex spectrum is identifiable from
    |V| alone when the feeder hosts distorting devices.

    Same LM driver, observability and weighting semantics as
    :func:`estimate_injections`; ``bound`` clips each re/im component
    to [-bound, bound] pu.
    """
    from .background import shunt_admittance

    rd = settings.real_dtype
    H, n, c, m = settings.n_harmonics, net.n, net.c, net.m
    grid = [int(h) for h in settings.harmonics]
    orders = tuple(int(h) for h in orders)
    for h in orders:
        if h == 1 or h not in grid:
            raise ValueError(f"order {h} not fittable (fundamental or "
                             f"outside the harmonic grid, max {grid[-1]})")
    k_idx = jnp.asarray([grid.index(h) for h in orders], jnp.int32)

    if as_current:
        conv = Cx(jnp.ones(H, rd), jnp.zeros(H, rd))      # identity
    else:
        conv = shunt_admittance(net, settings, bus)       # (H,) Cx

    def make_ibg(th):
        v = Cx(jnp.zeros(H, rd).at[k_idx].set(th[:, 0]),
               jnp.zeros(H, rd).at[k_idx].set(th[:, 1]))
        i = v * conv                                      # (H,) Norton
        z = jnp.zeros((H, n), rd)
        return Cx(z.at[:, bus].set(i.re), z.at[:, bus].set(i.im))

    net = dataclasses.replace(
        net, bus_P=net.bus_P * jnp.asarray(p_scale, rd),
        bus_Q=net.bus_Q * jnp.asarray(q_scale, rd))
    obs = (jnp.arange(net.n) if buses is None
           else jnp.asarray(list(buses), jnp.int32))
    V_meas = jnp.asarray(V_meas_m, rd)[:, obs]
    if weights is None:
        w = jnp.ones_like(V_meas)
    elif isinstance(weights, str) and weights == "relative":
        w = 1.0 / jnp.maximum(V_meas, 1e-6)
    else:
        w = jnp.asarray(weights, rd)

    def project(th):
        return jnp.clip(th, -bound, bound)

    theta = jnp.zeros((len(orders), 2), rd)

    @jax.jit
    def solve(th, V0):
        return hpf(net, devices, settings, V0=V0, I_bg=make_ibg(th))

    @jax.jit
    def solve_cold(th):
        return hpf(net, devices, settings, I_bg=make_ibg(th))

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
            Vm2, _ = update_harmonic_voltages(V_m, V_a, x, H, n, c)
            return (w * (Vm2[:, obs] - V_meas)).ravel()

        r = r_of_x(x_star)
        J = jax.jacfwd(r_of_x)(x_star) @ dx_cols
        return r, J

    rj_at = jax.jit(lambda th, res: _rj(th, res.V_m, res.V_a))

    fit = _lm_fit(theta, project, solve, solve_cold, rj_at,
                  steps=steps, lm_lambda0=lm_lambda0, tol=tol, rd=rd)
    th = np.asarray(fit.scales)
    return BackgroundEstimate(
        v_bg=th[:, 0] + 1j * th[:, 1], orders=orders,
        misfit=fit.misfit, misfit0=fit.misfit0, history=fit.history,
        n_solves=fit.n_solves, result=fit.result)
