"""Kron reduction tests: eliminating net2's passive bus ('nothing',
P=Q=0) must leave the solution identical on kept buses and exactly
recoverable on the eliminated one."""
import numpy as np
import pytest

import hpfx
from hpfx.kron import kron_reduce, passive_buses, recover_voltages

from conftest import make_setup


@pytest.mark.parametrize("coupled", [False, True])
def test_net2_reduction_parity(coupled):
    cfg = ("net2", 25, coupled)
    s, net, dev = make_setup(cfg)
    assert list(passive_buses(net)) == [2]

    full = hpfx.hpf(net, dev, s)
    red = kron_reduce(net, s)
    assert red.net.n == 3 and red.net.m == 2
    res = hpfx.hpf(red.net, dev, s, Y=red.Y)
    assert bool(res.converged)
    assert int(res.n_iter) <= int(full.n_iter) + 2

    V_m, V_a = recover_voltages(red, res, net.n)
    V_red = np.asarray(V_m) * np.exp(1j * np.asarray(V_a))
    V_full = np.asarray(full.V_m) * np.exp(1j * np.asarray(full.V_a))
    np.testing.assert_allclose(V_red, V_full, atol=5e-8)

    thd_full = hpfx.get_thd(full.V_m)
    thd_red = hpfx.get_thd(V_m)
    np.testing.assert_allclose(np.asarray(thd_red.THD_F),
                               np.asarray(thd_full.THD_F), atol=1e-7)


def test_reduction_requires_passive_bus():
    cfg = ("net3", 5, True)   # net3 has no passive buses
    s, net, dev = make_setup(cfg)
    assert passive_buses(net).size == 0
    with pytest.raises(ValueError, match="no passive buses"):
        kron_reduce(net, s)


def test_reduction_on_feeder():
    """Larger case: a synthetic feeder with several zero-load buses."""
    from hpfx.generators import synthetic_feeder
    s = hpfx.settings_for_hmax(9, coupled=True)
    net = synthetic_feeder(30, 6, s, seed=3)
    dev = hpfx.load_device_set(net, s)
    n_passive = passive_buses(net).size
    if n_passive == 0:
        pytest.skip("rng produced no passive buses")
    full = hpfx.hpf(net, dev, s)
    red = kron_reduce(net, s)
    assert red.net.n == net.n - n_passive
    res = hpfx.hpf(red.net, dev, s, Y=red.Y)
    V_m, V_a = recover_voltages(red, res, net.n)
    V_red = np.asarray(V_m) * np.exp(1j * np.asarray(V_a))
    V_full = np.asarray(full.V_m) * np.exp(1j * np.asarray(full.V_a))
    np.testing.assert_allclose(V_red, V_full, atol=1e-6)


def test_hpf_sweep_kron_auto():
    """hpf_sweep_kron auto-eliminates passive buses (net2: bus 2, net1:
    buses 5/10) and returns full-size results matching the unreduced sweep;
    nets without passive buses pass through hpf_sweep unchanged."""
    import jax.numpy as jnp

    from hpfx.solve import Scenarios, hpf_sweep, hpf_sweep_kron

    scen = Scenarios(p_scale=jnp.linspace(0.9, 1.1, 3),
                     q_scale=jnp.linspace(0.9, 1.1, 3),
                     injection_scale=jnp.linspace(0.8, 1.2, 3))
    for cfg, tol in [(("net2", 25, True), 1e-9), (("net1", 25, True), 1e-7),
                     (("net3", 25, True), 0.0)]:
        s, net, dev = make_setup(cfg)
        full = hpf_sweep(net, dev, settings=s, scenarios=scen)
        kron = hpf_sweep_kron(net, dev, s, scen)
        assert kron.V_m.shape == full.V_m.shape
        np.testing.assert_allclose(np.asarray(kron.V_m),
                                   np.asarray(full.V_m), atol=max(tol, 1e-30))
        np.testing.assert_array_equal(np.asarray(kron.converged),
                                      np.asarray(full.converged))


def test_hpf_sweep_kron_with_device_axes():
    """Kron reduction composes with per-device scales (the reduction only
    touches passive linear buses; nonlinear buses and their scenario axes
    are preserved)."""
    import jax.numpy as jnp

    from hpfx.solve import Scenarios, hpf_sweep, hpf_sweep_kron

    cfg = ("net1", 25, True)
    s, net, dev = make_setup(cfg)
    rng = np.random.default_rng(4)
    B = 3
    scen = Scenarios(
        p_scale=jnp.ones(B), q_scale=jnp.ones(B),
        injection_scale=jnp.asarray(
            rng.uniform(0.7, 1.3, (B, net.n_nonlinear))))
    full = hpf_sweep(net, dev, settings=s, scenarios=scen)
    kron = hpf_sweep_kron(net, dev, s, scen)
    np.testing.assert_array_equal(np.asarray(kron.converged),
                                  np.asarray(full.converged))
    # reduced and full paths stop within thresh_h of the same fixed point
    # from different arithmetic; agreement is stopping-tolerance class
    np.testing.assert_allclose(np.asarray(kron.V_m),
                               np.asarray(full.V_m), atol=1e-5)
