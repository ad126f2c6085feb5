"""Fuchs textbook 4-bus harmonic power flow (ch. 7.3/7.4).

Reproduces the behavioral oracle of the reference's
``example_hpf_fuchs.py`` / ``hcne_based_on_fuchs.py`` (the 4-bus system
with one analytic nonlinear device, harmonics {1, 5}) on the generalized
hpfx solver:

- the device is an ``AnalyticDeviceSet`` with the textbook injection
  (hcne_based_on_fuchs.py:168-173, 197-216):
      I_1 = conj(S / V_1)                   (constant-power fundamental
                                             current; the gamma/epsilon
                                             construction at :197-208
                                             reduces to exactly this)
      I_5 = 0.3·V1m^3·e^{3j·a1} + 0.3·V5m^2·e^{3j·a5}   (g(v), :170-172)
- the injection Jacobian blocks G11/G51/G55 the reference hand-derives
  (:266-324) come from autodiff here,
- the mismatch structure (power rows for linear buses, current balance
  rows) is identical to hcne_based_on_fuchs.py's dM = [dW, dI] (:227-256),
  so both converge to the same fixed point; trajectories differ because
  the reference applies a sign/pi flip every iteration (:351-352) while
  hpfx cleans up only after the loop.

The golden fixture ``V_log.json`` (written by hcne_based_on_fuchs.py:370)
records the reference's per-iteration voltages; the parity test compares
final phasors.
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import cx
from ..config import Settings
from ..devices import AnalyticDeviceSet
from ..harmonic import HPFResult, hpf
from ..network import NONLINEAR, PQ, SLACK, network_from_arrays

#: per-unit system of the example (hcne_based_on_fuchs.py:13)
PU_FACTOR = 1000.0


def fuchs_settings() -> Settings:
    """Harmonics {1, 5}; the reference iterates to err < 1e-4 fundamental
    and err_h < 0.01 harmonic (hcne_based_on_fuchs.py:14-17) — we keep the
    tighter hpfx defaults, which converge to the same fixed point."""
    return Settings(harmonics=(1, 5), coupled=True,
                    base_power=PU_FACTOR, thresh_h=1e-6)


def fuchs_network(settings: Settings):
    """The 4-bus example grid (hcne_based_on_fuchs.py:44-53): line
    impedances are given directly in per-unit; powers in W / PU_FACTOR.
    The slack carries X_shunt = 0.0001 which enters only harmonic Ybus
    blocks (:160-165)."""
    return network_from_arrays(
        bus_types=(SLACK, PQ, PQ, NONLINEAR),
        components=("swing", "lin_load_1", "bus3", "fuchs_smps"),
        P=[0.0, 0.1, 0.0, 0.25], Q=[0.0, 0.1, 0.0, 0.1],
        X_sh=[0.0001, 0.0, 0.0, 0.0],
        line_from=[0, 1, 2, 3], line_to=[1, 2, 3, 0],
        R=[0.01, 0.02, 0.01, 0.01], X=[0.01, 0.08, 0.02, 0.02],
        settings=settings)


def _fuchs_inject(params, V_m, V_a):
    """Textbook device injection; see module docstring."""
    S = params                       # Cx scalar, the device's P + jQ
    v1 = cx.polar(V_m[0], V_a[0])
    i1 = (S / v1).conj()
    i5 = (0.3 * V_m[0] ** 3) * cx.expj(3.0 * V_a[0]) + \
        (0.3 * V_m[1] ** 2) * cx.expj(3.0 * V_a[1])
    return cx.Cx(jnp.stack([i1.re, i5.re]), jnp.stack([i1.im, i5.im]))


def fuchs_device_set(settings: Settings) -> AnalyticDeviceSet:
    S = cx.Cx(jnp.asarray([0.25], settings.real_dtype),
              jnp.asarray([0.1], settings.real_dtype))
    return AnalyticDeviceSet(params=S, inject=_fuchs_inject, n_nl=1)


def solve_fuchs(settings: Settings = None) -> HPFResult:
    settings = settings or fuchs_settings()
    net = fuchs_network(settings)
    devices = fuchs_device_set(settings)
    return hpf(net, devices, settings)
