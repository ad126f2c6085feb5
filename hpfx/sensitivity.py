"""Differentiable sensitivities of the harmonic power flow solution.

The capability SURVEY §7.2 (M7) calls "free from JAX": derivatives of any
solution functional (THD, voltage magnitudes) with respect to scenario
parameters (load scaling, device penetration).  The reference has nothing
comparable.

The NR loop itself is a ``lax.while_loop`` (not reverse-differentiable), so
sensitivities come from the implicit function theorem at the converged
fixed point x*:

    f(x*, theta) = 0   =>   dx*/dtheta = -J(x*)^{-1} · ∂f/∂theta

with J the same harmonic Jacobian the solver already builds (which *is*
∂f/∂x — verified against jacfwd in the test suite) and ∂f/∂theta obtained
by forward-mode autodiff of the mismatch.  One extra linear solve per
parameter column; exact at the fixed point, no unrolling.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .config import Settings
from .cx import Cx
from .devices import DeviceSet
from .harmonic import (HPFResult, build_harmonic_jacobian, harmonic_mismatch,
                       harmonic_state_vector, update_harmonic_voltages)
from .network import Network
from .results import get_thd
from .utils.precision import highest_precision
from .ybus import build_ybus


class Sensitivity(NamedTuple):
    value: jnp.ndarray       # g(x*) at the solution
    grad: jnp.ndarray        # dg/dtheta via implicit differentiation
    dx: jnp.ndarray          # dx*/dtheta (state sensitivity)


def _mismatch_of(net: Network, devices: DeviceSet, settings: Settings, Y):
    m, n, c = net.m, net.n, net.c

    def f(x, theta, V_m0, V_a0):
        V_m, V_a = update_harmonic_voltages(
            V_m0, V_a0, x, settings.n_harmonics, n, c)
        dev_t = devices.scale(theta)
        S = Cx(net.bus_P, net.bus_Q)
        return harmonic_mismatch(V_m, V_a, Y, S, dev_t, m, n, c)[0]

    return f


@highest_precision
def injection_sensitivity(
    net: Network, devices: DeviceSet, settings: Settings,
    result: HPFResult, theta: float = 1.0,
    functional: Callable = None,
) -> Sensitivity:
    """d(functional)/d(injection scale) at a converged solution.

    ``functional(V_m, V_a) -> scalar`` defaults to the worst-bus THD_F.
    ``theta`` is the injection scale at which ``result`` was solved.
    """
    if functional is None:
        def functional(V_m, V_a):
            return jnp.max(get_thd(V_m).THD_F)

    H, n, c = settings.n_harmonics, net.n, net.c
    Y = build_ybus(net, settings)
    # reconstruct the solver's internal state at the solution
    V_m, V_a = result.V_m, result.V_a
    x_star = harmonic_state_vector(V_m, V_a, c)
    f = _mismatch_of(net, devices, settings, Y)

    theta = jnp.asarray(theta, settings.real_dtype)
    dev_t = devices.scale(theta)
    J = build_harmonic_jacobian(V_m, V_a, Y, dev_t, net.m, n, c)
    df_dtheta = jax.jacfwd(lambda t: f(x_star, t, V_m, V_a))(theta)
    dx = -jnp.linalg.solve(J, df_dtheta)

    def g_of_x(x):
        Vm2, Va2 = update_harmonic_voltages(V_m, V_a, x, H, n, c)
        return functional(Vm2, Va2)

    value, dg = jax.value_and_grad(g_of_x)(x_star)
    return Sensitivity(value=value, grad=dg @ dx, dx=dx)
