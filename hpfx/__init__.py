"""hpfx — TPU-native harmonic power flow in JAX.

A from-scratch re-design of the capabilities of
``pweigmann/harmonic-power-flow`` (harmonically-coupled Norton-equivalent
power flow) as a JAX/XLA/Pallas library: dense per-harmonic tensors on the
MXU, ``lax.while_loop`` Newton-Raphson, ``vmap`` scenario batching, and
``jax.sharding`` scenario-axis parallelism over TPU meshes.
"""
from .config import Settings, default_harmonics, settings_for_hmax
from .devices import (DeviceSet, device_set_from_arrays, fit_coupled_ne,
                      fit_uncoupled_ne, load_device_set,
                      load_norton_equivalent, ne_injection, ne_selftest)
from .fundamental import FundResult, pf, solve_fundamental
from .harmonic import HPFResult, hpf, solve_harmonic
from .network import Network, load_network, network_from_arrays
from .results import THD, get_thd, voltage_phasors
from .ybus import build_ybus

__version__ = "0.1.0"

__all__ = [
    "Settings", "default_harmonics", "settings_for_hmax",
    "Network", "load_network", "network_from_arrays",
    "build_ybus",
    "DeviceSet", "load_device_set", "load_norton_equivalent",
    "device_set_from_arrays", "fit_coupled_ne", "fit_uncoupled_ne",
    "ne_injection", "ne_selftest",
    "FundResult", "pf", "solve_fundamental",
    "HPFResult", "hpf", "solve_harmonic",
    "THD", "get_thd", "voltage_phasors",
]
