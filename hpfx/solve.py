"""Batched scenario solving: vmap over the scenario axis.

The reference is a strictly single-case solver (SURVEY §2.6: no parallelism
of any kind exists there).  This module adds the TPU-native scaling story:
``vmap`` batches whole HPF solves over a scenario axis (load scaling,
device-penetration scaling) so thousands of coupled-NR solves run as one
XLA program dominated by batched MXU matmuls and batched LU solves.

Convergence isolation: JAX's ``while_loop`` batching rule predicates the
carry per batch element, so each scenario iterates exactly as it would
serially and a diverged scenario cannot poison the batch (it just saturates
at max_iter with its own error; see HPFResult.converged).

The admittance tensor depends only on lines/shunts, not on loads or devices,
so it is built once outside the vmap and shared by every scenario.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .config import Settings
from .devices import DeviceSet
from .fundamental import solve_fundamental
from .harmonic import HPFResult, solve_harmonic
from .network import Network
from .results import get_thd
from .ybus import build_ybus


class Scenarios(NamedTuple):
    """Per-scenario multipliers, each shape (B,) or (B, n)/(B, n_nl).

    - ``p_scale``/``q_scale`` scale bus active/reactive load,
    - ``injection_scale`` scales nonlinear-device Norton parameters
      (EV/SMPS penetration sweeps).
    """
    p_scale: jnp.ndarray
    q_scale: Optional[jnp.ndarray] = None
    injection_scale: Optional[jnp.ndarray] = None

    @property
    def batch(self) -> int:
        return self.p_scale.shape[0]

    @staticmethod
    def uniform(b: int, dtype=jnp.float32) -> "Scenarios":
        one = jnp.ones((b,), dtype)
        return Scenarios(one, one, one)


def _expand(scale, like):
    """Broadcast a scalar/per-bus multiplier against a (n,)-shaped field."""
    s = jnp.asarray(scale, like.dtype)
    return s if s.ndim else s[None]


def _solve_scenario(Y, net: Network, devices: DeviceSet, settings: Settings,
                    p_scale, q_scale, inj_scale) -> HPFResult:
    net_s = dataclasses.replace(
        net,
        bus_P=net.bus_P * _expand(p_scale, net.bus_P),
        bus_Q=net.bus_Q * _expand(q_scale, net.bus_Q))
    dev_s = devices.scale(jnp.asarray(inj_scale, devices.I_N.re.dtype))
    fund = solve_fundamental(Y[0], net_s, settings)
    return solve_harmonic(Y, fund, net_s, dev_s, settings)


@partial(jax.jit, static_argnames=("settings",))
def hpf_sweep(net: Network, devices: DeviceSet, settings: Settings,
              scenarios: Scenarios) -> HPFResult:
    """Solve B independent HPF cases in one compiled program.

    Returns an HPFResult whose leaves carry a leading batch dimension.
    """
    Y = build_ybus(net, settings)
    q = scenarios.q_scale if scenarios.q_scale is not None \
        else scenarios.p_scale
    inj = scenarios.injection_scale if scenarios.injection_scale is not None \
        else jnp.ones_like(scenarios.p_scale)
    return jax.vmap(
        lambda p, qq, i: _solve_scenario(Y, net, devices, settings, p, qq, i)
    )(scenarios.p_scale, q, inj)


@partial(jax.jit, static_argnames=("settings",))
def hpf_single(net: Network, devices: DeviceSet,
               settings: Settings) -> HPFResult:
    """Jitted single-case HPF (compiled once per (settings, net-structure))."""
    Y = build_ybus(net, settings)
    fund = solve_fundamental(Y[0], net, settings)
    return solve_harmonic(Y, fund, net, devices, settings)


class SweepSummary(NamedTuple):
    max_thd_f: jnp.ndarray     # (B,) worst-bus THD_F per scenario
    converged: jnp.ndarray     # (B,) bool
    n_iter: jnp.ndarray        # (B,)
    frac_over_limit: jnp.ndarray  # scalar


@partial(jax.jit, static_argnames=("settings", "thd_limit"))
def hosting_capacity_sweep(net: Network, devices: DeviceSet,
                           settings: Settings, scenarios: Scenarios,
                           thd_limit: float = 0.08) -> SweepSummary:
    """Monte-Carlo hosting-capacity style sweep: batched HPF + THD screen.

    Reduces the batch to the fraction of scenarios whose worst-bus THD_F
    exceeds ``thd_limit`` — the aggregate that rides ICI collectives when
    the scenario axis is sharded over a mesh (see hpfx.parallel).
    """
    res = hpf_sweep(net, devices, settings, scenarios)
    thd = jax.vmap(get_thd)(res.V_m)
    max_thd = jnp.max(thd.THD_F, axis=-1)
    over = (max_thd > thd_limit) & res.converged
    return SweepSummary(max_thd, res.converged, res.n_iter,
                        jnp.mean(over.astype(max_thd.dtype)))
