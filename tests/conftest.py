"""Test harness configuration.

Parity tests run on CPU with x64 enabled (the 1e-8 gate vs the float64
reference requires f64/c128, which TPUs don't natively execute) on a
virtual 8-device CPU mesh — XLA's multi-host simulation — so the sharded
multi-chip code paths compile and execute without TPU hardware.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# Default: CPU + x64 (the 1e-8 parity gate needs f64).  Set
# HPFX_TEST_PLATFORM=tpu to run the TPU-gated tier instead (e.g.
# tests/test_compile_probe.py — AOT compile checks of the Pallas kernels
# on the real Mosaic compiler); the parity tests skip there.
_PLATFORM = os.environ.get("HPFX_TEST_PLATFORM", "cpu")
if _PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
# else: leave platform selection to the environment (the axon
# sitecustomize registers the TPU under its own platform name)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import hpfx  # noqa: E402
from hpfx.utils.cache import enable_persistent_cache  # noqa: E402

# persistent executable cache: repeat suite runs skip the multi-second
# sweep compiles (and fewer live compiles means less exposure to the
# sporadic concurrent-load XLA:CPU compiler segfaults, CLAUDE.md #21)
enable_persistent_cache()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDENS = os.path.join(REPO, "validation", "goldens")
DATA = os.path.join(REPO, "hpfx", "data")

# every captured reference configuration: (net, h_max, coupled).
# H=99 is the full depth of the shipped device table (smps_NE.csv carries
# odd harmonics 1..99); net1_h99 (dim 1998) is captured too but kept out
# of the every-test matrix — test_harmonic.py::test_net1_h99_parity
# covers it once.
ALL_CONFIGS = [
    (net, h, c)
    for net in ("net2", "net3", "net1")
    for h in (5, 25, 51)
    for c in (False, True)
] + [
    (net, 99, c)
    for net in ("net2", "net3")
    for c in (False, True)
]
# reference itself fails to converge here (50 iters, err ~ 78) — behavioral
# fixture for divergence handling, excluded from strict voltage parity
DIVERGED = {("net1", 5, True)}
# dim-1038 system with a wild NR transient (residuals ~1e3 before
# contraction): both implementations reach the identical fixed point
# (voltages agree to ~1e-12) but fp-level linear-solver differences shift
# the iteration count; voltage parity stays gated, counts get a tolerance
LOOSE_ITERS = {("net1", 51, True)}
# reference stopped at a SHALLOW residual (err 6.3e-5, just under its
# 1e-4 threshold) after a wild transient (residuals ~1e2): hpfx's extra
# contraction steps land at err 1.3e-7 — the same fixed point, but the
# 1e-8 voltage-parity gate is bounded by the reference's own truncation
# (|dV| ~ err_ref / |J| ~ 1e-6), not by hpfx; counts drift like
# LOOSE_ITERS (24 vs 20)
SHALLOW_STOP = {("net2", 99, True)}


def config_id(cfg):
    net, h, c = cfg
    return f"{net}_h{h}_{'c' if c else 'uc'}"


def load_golden(cfg):
    return np.load(os.path.join(GOLDENS, config_id(cfg) + ".npz"))


@pytest.fixture(scope="session")
def goldens():
    return {cfg: load_golden(cfg) for cfg in ALL_CONFIGS}


def make_setup(cfg):
    net_name, h_max, coupled = cfg
    s = hpfx.settings_for_hmax(h_max, coupled=coupled)
    net = hpfx.load_network(
        os.path.join(DATA, f"{net_name}_buses.csv"),
        os.path.join(DATA, f"{net_name}_lines.csv"), s)
    dev = hpfx.load_device_set(net, s)
    return s, net, dev


@pytest.fixture(params=ALL_CONFIGS, ids=config_id)
def config(request):
    return request.param


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """XLA:CPU's compiler segfaults sporadically deep into the suite
    (~90+ compiled programs; always inside backend_compile_and_load,
    landing in whatever test compiles next — observed in three different
    tests across runs; every affected test passes in isolation).
    Clearing compiled-program caches between modules bounds the
    accumulation that triggers it.  See CLAUDE.md #21."""
    yield
    import gc
    jax.clear_caches()
    gc.collect()


# ---- two-tier suite (round-5 VERDICT item 8) ----------------------------
# `pytest -m quick` = the smoke gate (target <10 min on the 3x-slower
# post-migration host); `pytest` (no -m) = the full 580+-test gate.
# Slow = the deep-harmonic parity matrix (h51/h99 configs, dim 1038/1998
# systems), the synthetic-feeder scaling checks, and the heavyweight
# end-to-end modules (time-domain simulation, randomized property
# sweeps, virtual-mesh sharding, logged-trajectory example parity).
_SLOW_TOKENS = ("h51", "h99", "n128", "_99_", "hmax99",
                "continuation_lanes", "interpret")
_SLOW_MODULES = {
    "test_simulate", "test_randomized", "test_scaling", "test_sharding",
    "test_examples", "test_trafo_e2e", "test_estimate", "test_kron",
    # measured-heavy (pytest --durations on this host): FD/grid oracles,
    # interpret-mode Pallas checks, eigen/three-phase/filter e2e —
    # all covered by the full gate
    "test_fused_trip", "test_optimize", "test_sensitivity",
    "test_f32_path", "test_threephase", "test_modes",
    "test_activefilter",
}


def pytest_collection_modifyitems(config, items):
    for it in items:
        mod = it.nodeid.split("::")[0].rsplit("/", 1)[-1].removesuffix(".py")
        if (mod in _SLOW_MODULES
                or any(t in it.nodeid for t in _SLOW_TOKENS)):
            it.add_marker(pytest.mark.slow)
        else:
            it.add_marker(pytest.mark.quick)
