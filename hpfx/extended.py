"""Devices with internal control unknowns — the extended-Jacobian HPF.

Generalizes the capability sketched by the reference's Fuchs-7.4 example
(``example_hpf_fuchs.py:185-381``), where the device control angles
(alpha, beta) are appended to the Newton state and the Jacobian grows
H-blocks for them.  In the reference this is *degenerate*: the textbook
device's injection does not actually depend on (alpha, beta), the H5
coupling block is zero, and H1 is filled with **random values** "to avoid
unsolvable system" (:373-374, citing Fuchs p.604); the companion script
``hcne_based_on_fuchs.py:141-143,374-376`` eliminates the angles and gets
identical results.

Here the formulation is made well-posed and generic:

- a :class:`ControlledDeviceSet` carries, per nonlinear bus, ``n_u``
  internal unknowns ``u`` (firing/control angles, DC-link states, ...),
  an injection ``inject(params_i, V_m (H,), V_a (H,), u (n_u,)) -> Cx (H,)``
  and ``n_u`` real closure equations
  ``constraint(params_i, V_m, V_a, u) -> (n_u,)`` (e.g. a power setpoint
  that the control angle must realize);
- :func:`solve_harmonic_extended` solves network state and device unknowns
  *simultaneously* by Newton-Raphson on the extended residual
  ``[f(V, u); g(V, u)]`` with the extended Jacobian obtained by
  forward-mode autodiff — the principled replacement for the reference's
  hand-assembled 16x16 with junk regularization rows.

These systems are textbook-scale (the capability exists for device-model
research, not the scenario-sweep hot path), so the solver favors clarity:
one ``jax.jacfwd`` per iteration, dense LU, jittable ``lax.while_loop``.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from . import cx
from .config import Settings
from .cx import Cx
from .devices import AnalyticDeviceSet
from .fundamental import FundResult, solve_fundamental
from .harmonic import (cleanup_voltages, harmonic_mismatch,
                       harmonic_state_vector, init_harmonic_voltages,
                       mismatch_floor, update_harmonic_voltages)
from .network import Network
from .utils.precision import highest_precision
from .ybus import build_ybus


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ControlledDeviceSet:
    """Nonlinear devices with ``n_u`` internal Newton unknowns each.

    ``inject(params_i, V_m (H,), V_a (H,), u (n_u,)) -> Cx (H,)`` and
    ``constraint(params_i, V_m (H,), V_a (H,), u (n_u,)) -> (n_u,)`` are
    evaluated per device (leading n_nl axis on ``params``/``u0``).  The
    solved ``u`` is returned alongside the voltages.
    """

    params: object
    u0: jnp.ndarray                       # (n_nl, n_u) initial unknowns
    inject: object = dataclasses.field(metadata=dict(static=True))
    constraint: object = dataclasses.field(metadata=dict(static=True))
    n_nl: int = dataclasses.field(metadata=dict(static=True))
    n_u: int = dataclasses.field(metadata=dict(static=True))

    coupled = True

    def at_u(self, u) -> AnalyticDeviceSet:
        """View with the internal unknowns frozen: a plain analytic device
        the standard mismatch/Jacobian machinery consumes directly."""
        inject = self.inject

        def inject_u(params_u, V_m, V_a):
            p, ui = params_u
            return inject(p, V_m, V_a, ui)

        return AnalyticDeviceSet(params=(self.params, u), inject=inject_u,
                                 n_nl=self.n_nl)


class ExtendedResult(NamedTuple):
    V_m: jnp.ndarray           # (H, n)
    V_a: jnp.ndarray
    u: jnp.ndarray             # (n_nl, n_u) solved device unknowns
    err: jnp.ndarray
    n_iter: jnp.ndarray
    err_hist: jnp.ndarray
    converged: jnp.ndarray
    fund: Optional[FundResult] = None


@highest_precision
def solve_harmonic_extended(Y: Cx, fund: FundResult, net: Network,
                            devices: ControlledDeviceSet,
                            settings: Settings) -> ExtendedResult:
    """Coupled Newton over [network state; device unknowns].

    Residual = [harmonic mismatch f(V, u) (reference layout, at frozen u);
    device constraints g(V, u)], Jacobian by ``jax.jacfwd`` of the whole
    residual — exactly the extended system of example_hpf_fuchs.py:377-381,
    with real constraint rows instead of its random H1 block.
    """
    H, n, m, c = settings.n_harmonics, net.n, net.m, net.c
    S = Cx(net.bus_P, net.bus_Q)
    V_m0, V_a0 = init_harmonic_voltages(fund, net, settings)
    nx = 2 * H * n - 1 - c
    nu = devices.n_nl * devices.n_u

    def residual(x_ext):
        x, u = x_ext[:nx], x_ext[nx:].reshape(devices.n_nl, devices.n_u)
        V_m, V_a = update_harmonic_voltages(V_m0, V_a0, x, H, n, c)
        f, _ = harmonic_mismatch(V_m, V_a, Y, S, devices.at_u(u), m, n, c)
        g = jax.vmap(devices.constraint, in_axes=(0, 1, 1, 0))(
            devices.params, V_m[:, m:], V_a[:, m:], u)
        return jnp.concatenate([f, g.reshape(-1)])

    x0 = jnp.concatenate([harmonic_state_vector(V_m0, V_a0, c),
                          devices.u0.reshape(-1).astype(V_m0.dtype)])
    f0 = residual(x0)
    err0 = jnp.max(jnp.abs(f0))
    thresh_eff = jnp.maximum(
        jnp.asarray(settings.thresh_h, settings.real_dtype),
        settings.floor_kappa * mismatch_floor(
            V_m0, Y, devices.at_u(devices.u0), m, settings))
    hist0 = jnp.full((settings.max_iter_h,), jnp.nan, settings.real_dtype)

    def cond(carry):
        _, _, err, it, _ = carry
        return (err > thresh_eff) & (it < settings.max_iter_h)

    def body(carry):
        x_ext, f, err, it, hist = carry
        J = jax.jacfwd(residual)(x_ext)
        x_ext = x_ext - jnp.linalg.solve(J, f)
        f = residual(x_ext)
        err = jnp.max(jnp.abs(f))
        return x_ext, f, err, it + 1, hist.at[it].set(err)

    x_ext, f, err, n_iter, hist = lax.while_loop(
        cond, body, (x0, f0, err0, jnp.int32(0), hist0))

    x, u = x_ext[:nx], x_ext[nx:].reshape(devices.n_nl, devices.n_u)
    V_m, V_a = update_harmonic_voltages(V_m0, V_a0, x, H, n, c)
    V_m, V_a = cleanup_voltages(V_m, V_a)
    return ExtendedResult(V_m, V_a, u, err, n_iter, hist,
                          err <= thresh_eff, fund)


def hpf_extended(net: Network, devices: ControlledDeviceSet,
                 settings: Settings) -> ExtendedResult:
    """Full pipeline: Ybus -> fundamental warm start -> extended harmonic
    Newton (cf. hpf, with the device-unknown extension)."""
    Y = build_ybus(net, settings)
    fund = solve_fundamental(Y[0], net, settings)
    return solve_harmonic_extended(Y, fund, net, devices, settings)
