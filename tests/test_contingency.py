"""N-1 contingency screens (hpfx/contingency.py).

The solver is parity-gated elsewhere; these gate the screening logic:
islanding detection, batched-vs-serial solve identity, ranking/report
accounting, outage-scenario construction, and validation errors.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import hpfx
from hpfx import contingency as cg
from hpfx.contingency import _LINE_FIELDS

from conftest import make_setup


@pytest.fixture(scope="module")
def net1u():
    return make_setup(("net1", 5, False))


@pytest.fixture(scope="module")
def net2c():
    return make_setup(("net2", 5, True))


def _toy_net(line_from, line_to, n):
    s = hpfx.settings_for_hmax(5)
    L = len(line_from)
    return hpfx.network_from_arrays(
        bus_types=[0] + [1] * (n - 1), components=["slack"] + ["pq"] * (n - 1),
        P=np.zeros(n), Q=np.zeros(n),
        line_from=line_from, line_to=line_to,
        R=np.full(L, 0.01), X=np.full(L, 0.05), settings=s)


def test_islanded_lines_topologies():
    # radial 4-bus chain: every line islands
    chain = _toy_net([0, 1, 2], [1, 2, 3], 4)
    assert cg.islanded_lines(chain).tolist() == [True] * 3
    # ring: no single outage islands
    ring = _toy_net([0, 1, 2, 3], [1, 2, 3, 0], 4)
    assert cg.islanded_lines(ring).tolist() == [False] * 4
    # ring + spur: only the spur line islands
    spur = _toy_net([0, 1, 2, 3, 1], [1, 2, 3, 0, 4], 5)
    assert cg.islanded_lines(spur).tolist() == [False] * 4 + [True]


def test_line_outage_screen_matches_serial(net1u):
    s, net, dev = net1u
    sel = [2, 20, 22]
    rep = cg.screen_line_outages(net, dev, s, outages=sel)
    assert rep.outages == (2, 20, 22)
    assert not rep.islanded.any() and rep.converged.all()
    # batched rows == independent single-case solves on the pruned nets
    for row, k in enumerate(sel):
        net_k = dataclasses.replace(net, **{
            f: jnp.asarray(np.delete(np.asarray(getattr(net, f)), k))
            for f in _LINE_FIELDS})
        res_k = hpfx.hpf(net_k, dev, s)
        thd_k = np.asarray(hpfx.get_thd(res_k.V_m).THD_F)
        np.testing.assert_allclose(rep.thd[row], thd_k, atol=1e-12)
        assert rep.n_iter[row] == int(res_k.n_iter)
    # report accounting
    base = hpfx.hpf(net, dev, s)
    np.testing.assert_allclose(
        rep.base_thd, np.asarray(hpfx.get_thd(base.V_m).THD_F), atol=1e-12)
    np.testing.assert_allclose(rep.worst_thd, np.nanmax(rep.thd, axis=1),
                               atol=1e-15)
    np.testing.assert_allclose(
        rep.delta_thd, rep.worst_thd - rep.base_thd.max(), atol=1e-15)
    # ranking is descending in delta
    assert list(rep.delta_thd[rep.ranking]) == \
        sorted(rep.delta_thd, reverse=True)
    with pytest.raises(ValueError, match="out of range"):
        cg.screen_line_outages(net, dev, s, outages=[99])


def test_line_outage_screen_full_net2(net2c):
    """net2 is a 4-bus ring: all four outages survive and solve."""
    s, net, dev = net2c
    rep = cg.screen_line_outages(net, dev, s)
    assert rep.outages == (0, 1, 2, 3)
    assert not rep.islanded.any() and rep.converged.all()
    assert np.isfinite(rep.worst_thd).all()
    assert (rep.v1_min > 0.5).all()


def test_islanded_outages_are_skipped(net2c, monkeypatch):
    """An islanding outage is reported, not solved: force the mask."""
    s, net, dev = net2c
    fake = np.array([False, True, False, True])
    monkeypatch.setattr(cg, "islanded_lines", lambda n: fake)
    rep = cg.screen_line_outages(net, dev, s)
    assert rep.islanded.tolist() == fake.tolist()
    assert rep.converged.tolist() == [True, False, True, False]
    assert np.isnan(rep.thd[1]).all() and np.isnan(rep.worst_thd[3])
    # islanded rows rank last
    assert set(rep.ranking[-2:]) == {1, 3}


def test_shunt_outage_screen(net2c):
    s, net, dev = net2c
    rep = cg.screen_shunt_outages(net, dev, s)
    # net2 carries exactly one shunt (the slack X_sh)
    assert rep.outages == tuple(np.flatnonzero(np.asarray(net.bus_Xsh)))
    assert rep.converged.all() and not rep.islanded.any()
    # removing the shunt must actually change the harmonic solution
    assert abs(float(rep.delta_thd[0])) > 1e-6
    # serial identity
    net_0 = dataclasses.replace(
        net, bus_Xsh=jnp.asarray(np.zeros_like(np.asarray(net.bus_Xsh))))
    res_0 = hpfx.hpf(net_0, dev, s)
    np.testing.assert_allclose(
        rep.thd[0], np.asarray(hpfx.get_thd(res_0.V_m).THD_F), atol=1e-12)
    with pytest.raises(ValueError, match="no shunt"):
        cg.screen_shunt_outages(net, dev, s, buses=[1])
    with pytest.raises(ValueError, match="out of range"):
        cg.screen_shunt_outages(net, dev, s, buses=[7])


def test_device_outage_scenarios(net1u):
    s, net, dev = net1u
    scen, sel = cg.device_outage_scenarios(net, s)
    n_nl = net.n_nonlinear
    assert sel == tuple(range(n_nl))
    inj = np.asarray(scen.injection_scale)
    assert inj.shape == (n_nl, n_nl)
    np.testing.assert_allclose(inj, 1.0 - np.eye(n_nl))
    scen2, sel2 = cg.device_outage_scenarios(net, s, devices_out=[3])
    assert sel2 == (3,) and np.asarray(scen2.injection_scale)[0, 3] == 0.0
    with pytest.raises(ValueError, match="out of range"):
        cg.device_outage_scenarios(net, s, devices_out=[n_nl])


def test_device_outage_screen(net1u):
    s, net, dev = net1u
    rep = cg.screen_device_outages(net, dev, s, devices_out=[0, 4])
    assert rep.converged.all()
    # serial identity: outage row == single solve with the device scaled out
    onehot = np.ones(net.n_nonlinear)
    onehot[4] = 0.0
    res = hpfx.hpf(net, dev.scale(jnp.asarray(onehot)), s)
    np.testing.assert_allclose(
        rep.thd[1], np.asarray(hpfx.get_thd(res.V_m).THD_F), atol=1e-12)
    # tripping an SMPS on net1 reduces total distortion
    assert (rep.delta_thd < 0).all()


def test_outage_impedance_shift(net1u):
    s, net, dev = net1u
    rep = cg.outage_impedance_shift(net, dev, s, outages=[0, 20, 22])
    assert rep.outages == (0, 20, 22)
    # serial identity against a pruned-network scan
    from hpfx.impedance import driving_point_impedance
    net_k = dataclasses.replace(net, **{
        f: jnp.asarray(np.delete(np.asarray(getattr(net, f)), 22))
        for f in _LINE_FIELDS})
    z_k = np.asarray(driving_point_impedance(net_k, s, devices=dev))
    np.testing.assert_allclose(rep.zmag[2], z_k, atol=1e-14)
    np.testing.assert_allclose(
        rep.base_zmag, np.asarray(driving_point_impedance(net, s,
                                                          devices=dev)),
        atol=1e-14)
    # amplification bookkeeping: the reported (order, bus) attains it
    orders = list(s.harmonics)
    for r in range(3):
        hi = orders.index(int(rep.shift_order[r]))
        b = int(rep.shift_bus[r])
        np.testing.assert_allclose(
            rep.amplification[r],
            rep.zmag[r, hi, b] / rep.base_zmag[hi, b], rtol=1e-12)
        assert rep.shift_order[r] != 1           # fundamental excluded
    assert list(rep.amplification[rep.ranking]) == \
        sorted(rep.amplification, reverse=True)
    # the passive scan differs from the operational one
    rp = cg.outage_impedance_shift(net, dev, s, outages=[22],
                                   operational=False)
    assert abs(float(rp.amplification[0] - rep.amplification[2])) > 1e-9
    with pytest.raises(ValueError, match="out of range"):
        cg.outage_impedance_shift(net, dev, s, outages=[99])


def test_base_divergence_raises():
    s, net, dev = make_setup(("net1", 5, True))  # the DIVERGED config
    with pytest.raises(ValueError, match="did not converge"):
        cg.screen_line_outages(net, dev, s, outages=[0])


def test_line_outage_sweep_matches_single_screen(net2c):
    """screen_line_outages_sweep at S=1 uniform draws reproduces the
    single-case screen's per-outage worst THD and deltas."""
    from hpfx.solve import Scenarios

    s, net, dev = net2c
    single = cg.screen_line_outages(net, dev, s)
    sweep = cg.screen_line_outages_sweep(
        net, dev, s, Scenarios.uniform(1, s.real_dtype), quantile=0.5)
    assert sweep.converged.shape == (net.n_lines, 1)
    assert bool(sweep.converged.all())
    np.testing.assert_allclose(sweep.worst_thd[:, 0], single.worst_thd,
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(sweep.delta_q, single.delta_thd,
                               rtol=0, atol=1e-9)
    np.testing.assert_array_equal(sweep.ranking, single.ranking)


def test_line_outage_sweep_cross(net2c):
    """The (outage x scenario) cross: per-pair convergence, monotone
    base deltas, and the quantile ranking axis."""
    from hpfx.solve import Scenarios

    s, net, dev = net2c
    S = 4
    sc = Scenarios(p_scale=jnp.linspace(0.9, 1.1, S),
                   q_scale=jnp.linspace(0.9, 1.1, S),
                   injection_scale=jnp.linspace(0.8, 1.2, S))
    rep = cg.screen_line_outages_sweep(net, dev, s, sc, quantile=0.95)
    assert rep.worst_thd.shape == (net.n_lines, S)
    assert rep.base_worst.shape == (S,)
    assert bool(rep.converged.all())
    assert np.all(rep.conv_frac == 1.0)
    # every solved pair produced a physical THD
    assert np.all(np.isfinite(rep.worst_thd))
    # ranking sorts by descending delta_q
    dq = rep.delta_q[rep.ranking]
    assert np.all(np.diff(dq[np.isfinite(dq)]) <= 1e-12)


def test_line_outage_sweep_rejects_device_mix(net2c):
    from hpfx.solve import Scenarios

    s, net, dev = net2c
    sc = Scenarios(p_scale=jnp.ones(2), q_scale=jnp.ones(2),
                   injection_scale=jnp.ones(2),
                   device_mix=jnp.ones((2, net.n_nonlinear, 1)))
    with pytest.raises(ValueError):
        cg.screen_line_outages_sweep(net, dev, s, sc)


def test_verify_infeasible_recovers_knife_edge():
    """Unconverged pairs that are merely f32 knife-edges (threshold
    below the f32 floor) are recovered by the f64 verification pass and
    merged back as converged; nothing is labeled infeasible."""
    import os

    from conftest import DATA
    from hpfx.solve import Scenarios

    s = hpfx.settings_for_hmax(5, coupled=True).with_(
        solver="arrow", stable_mismatch=True, dtype="float32",
        floor_kappa=0.0, thresh_h=3e-8)
    net = hpfx.load_network(os.path.join(DATA, "net2_buses.csv"),
                            os.path.join(DATA, "net2_lines.csv"), s)
    dev = hpfx.load_device_set(net, s)
    sc = Scenarios(p_scale=jnp.linspace(0.95, 1.05, 3).astype(jnp.float32),
                   q_scale=jnp.ones(3, jnp.float32),
                   injection_scale=jnp.ones(3, jnp.float32))
    plain = cg.screen_line_outages_sweep(net, dev, s, sc)
    assert not plain.converged.any()          # f32 cannot certify 3e-8
    assert not plain.infeasible.any()         # flag off -> all False
    ver = cg.screen_line_outages_sweep(net, dev, s, sc,
                                       verify_infeasible=True)
    assert ver.converged.all()
    assert not ver.infeasible.any()
    assert np.all(np.isfinite(ver.worst_thd))


def test_verify_infeasible_confirms_physics(net2c):
    """A draw with no power-flow solution (absurd injection level)
    fails in f64 too and is labeled infeasible; the nominal draw on the
    same outage stays converged."""
    from hpfx.solve import Scenarios

    s, net, dev = net2c
    # 500x load power is past the fundamental nose curve on every
    # net2 topology — no power-flow root at any precision (50x still
    # admits the low-voltage root on the stronger outages)
    sc = Scenarios(p_scale=jnp.array([1.0, 500.0]),
                   q_scale=jnp.array([1.0, 500.0]),
                   injection_scale=jnp.array([1.0, 1.0]))
    rep = cg.screen_line_outages_sweep(net, dev, s, sc,
                                       verify_infeasible=True)
    assert rep.converged[:, 0].all()          # nominal draws solve
    assert not rep.converged[:, 1].any()      # 500x load: no root
    assert rep.infeasible[:, 1].all()         # ... confirmed at f64
    assert not rep.infeasible[:, 0].any()
