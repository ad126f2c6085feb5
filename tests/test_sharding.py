"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpfx.parallel import (hosting_capacity_sharded, hpf_sweep_sharded,
                           scenario_mesh, shard_scenarios)
from hpfx.solve import Scenarios, hosting_capacity_sweep, hpf_sweep

from conftest import make_setup

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")


def _scen(b):
    p = jnp.linspace(0.5, 1.5, b)
    return Scenarios(p_scale=p, q_scale=p,
                     injection_scale=jnp.linspace(0.2, 1.2, b))


def test_mesh_and_placement():
    mesh = scenario_mesh(8)
    assert mesh.devices.shape == (8,)
    scen = shard_scenarios(_scen(16), mesh)
    assert not scen.p_scale.sharding.is_fully_replicated
    assert scen.p_scale.sharding.num_devices == 8


def test_sharded_sweep_matches_unsharded():
    cfg = ("net2", 5, True)
    s, net, dev = make_setup(cfg)
    scen = _scen(16)
    mesh = scenario_mesh(8)
    ref = hpf_sweep(net, dev, settings=s, scenarios=scen)
    out = hpf_sweep_sharded(net, dev, s, scen, mesh)
    np.testing.assert_allclose(np.asarray(out.V_m), np.asarray(ref.V_m),
                               atol=1e-12)
    np.testing.assert_array_equal(np.asarray(out.n_iter),
                                  np.asarray(ref.n_iter))
    # outputs actually live sharded over the mesh
    assert out.V_m.sharding.num_devices == 8


def test_sharded_hosting_capacity_reduction():
    """The global fraction is an all-reduce across shards and matches the
    single-device computation."""
    cfg = ("net2", 5, True)
    s, net, dev = make_setup(cfg)
    scen = _scen(24)
    mesh = scenario_mesh(8)
    ref = hosting_capacity_sweep(net, dev, settings=s, scenarios=scen,
                                 thd_limit=0.3)
    out = hosting_capacity_sharded(net, dev, s, scen, mesh, thd_limit=0.3)
    np.testing.assert_allclose(np.asarray(out.max_thd_f),
                               np.asarray(ref.max_thd_f), atol=1e-12)
    np.testing.assert_allclose(float(out.frac_over_limit),
                               float(ref.frac_over_limit))
    assert out.frac_over_limit.sharding.is_fully_replicated


def test_sharded_sweep_non_divisible_batch():
    """B % mesh != 0: the batch is padded (last scenario repeated), results
    sliced back, and the hosting-capacity aggregate masks the padding."""
    cfg = ("net2", 5, True)
    s, net, dev = make_setup(cfg)
    scen = _scen(13)                       # 13 % 8 != 0
    mesh = scenario_mesh(8)
    ref = hpf_sweep(net, dev, settings=s, scenarios=scen)
    out = hpf_sweep_sharded(net, dev, s, scen, mesh)
    assert out.V_m.shape[0] == 13
    np.testing.assert_allclose(np.asarray(out.V_m), np.asarray(ref.V_m),
                               atol=1e-12)
    np.testing.assert_array_equal(np.asarray(out.n_iter),
                                  np.asarray(ref.n_iter))
    refh = hosting_capacity_sweep(net, dev, settings=s, scenarios=scen,
                                  thd_limit=0.3)
    outh = hosting_capacity_sharded(net, dev, s, scen, mesh, thd_limit=0.3)
    assert outh.max_thd_f.shape[0] == 13
    # the padded duplicate of scenario 13 must not bias the fraction
    np.testing.assert_allclose(float(outh.frac_over_limit),
                               float(refh.frac_over_limit))


def test_mesh_subset():
    mesh = scenario_mesh(4)
    cfg = ("net2", 5, False)
    s, net, dev = make_setup(cfg)
    scen = _scen(8)
    out = hpf_sweep_sharded(net, dev, s, scen, mesh)
    ref = hpf_sweep(net, dev, settings=s, scenarios=scen)
    np.testing.assert_allclose(np.asarray(out.V_m), np.asarray(ref.V_m),
                               atol=1e-12)


def test_hosting_capacity_at_scale():
    """BASELINE headline shape: thousands of random EV-penetration
    scenarios swept over the full mesh with a global aggregate."""
    import numpy as np
    cfg = ("net2", 5, True)
    s, net, dev = make_setup(cfg)
    B = 2048
    rng = np.random.default_rng(0)
    scen = Scenarios(
        p_scale=jnp.asarray(rng.uniform(0.85, 1.15, B), s.real_dtype),
        q_scale=jnp.asarray(rng.uniform(0.85, 1.15, B), s.real_dtype),
        injection_scale=jnp.asarray(rng.uniform(0.3, 1.3, B), s.real_dtype))
    mesh = scenario_mesh(8)
    out = hosting_capacity_sharded(net, dev, s, scen, mesh, thd_limit=0.3)
    conv = float(np.mean(np.asarray(out.converged)))
    assert conv > 0.9
    frac = float(out.frac_over_limit)
    # matches the host-side recomputation over the sharded outputs
    expect = float(np.mean((np.asarray(out.max_thd_f) > 0.3)
                           & np.asarray(out.converged)))
    np.testing.assert_allclose(frac, expect)
