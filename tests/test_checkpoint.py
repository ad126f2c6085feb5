"""Checkpoint / warm-start tests (SURVEY §5.4)."""
import numpy as np

import hpfx
from hpfx import harmonic
from hpfx.checkpoint import load_result, save_result, warm_start

from conftest import make_setup


def test_save_load_roundtrip(tmp_path):
    cfg = ("net2", 5, True)
    s, net, dev = make_setup(cfg)
    res = hpfx.hpf(net, dev, s)
    path = str(tmp_path / "state.npz")
    save_result(path, res)
    back = load_result(path)
    np.testing.assert_array_equal(np.asarray(back.V_m), np.asarray(res.V_m))
    np.testing.assert_array_equal(np.asarray(back.V_a), np.asarray(res.V_a))
    assert int(back.n_iter) == int(res.n_iter)
    assert bool(back.converged) == bool(res.converged)


def test_warm_start_accelerates_nearby_solve():
    """Resuming a slightly perturbed case from a converged solution takes
    fewer NR iterations than the flat start and reaches the same answer."""
    import dataclasses
    cfg = ("net2", 25, True)
    s, net, dev = make_setup(cfg)
    base = hpfx.hpf(net, dev, s)

    net2 = dataclasses.replace(net, bus_P=net.bus_P * 1.02,
                               bus_Q=net.bus_Q * 1.02)
    cold = hpfx.hpf(net2, dev, s)
    warm = hpfx.hpf(net2, dev, s, V0=warm_start(base))
    assert bool(cold.converged) and bool(warm.converged)
    assert int(warm.n_iter) < int(cold.n_iter)
    np.testing.assert_allclose(np.asarray(warm.V_m), np.asarray(cold.V_m),
                               atol=1e-7)


def test_report_summary():
    cfg = ("net3", 5, True)
    s, net, dev = make_setup(cfg)
    res = hpfx.hpf(net, dev, s)
    rep = hpfx.report(res, s)
    assert rep.harmonics == (1, 3, 5)
    assert rep.converged
    assert rep.n_iter_harm == int(res.n_iter)
    assert rep.n_iter_fund == int(res.fund.n_iter)
    hist = np.asarray(rep.residual_history)
    assert np.isfinite(hist[: rep.n_iter_harm]).all()
    assert np.isnan(hist[rep.n_iter_harm:]).all()
    assert rep.thd.THD_F.shape == (net.n,)


def test_trajectory_recording():
    """Per-iteration V traces (the reference's V_log.json capability,
    hcne_based_on_fuchs.py:370): recorded states replay the iteration and
    can serve as virtual measurements for NE fitting."""
    cfg = ("net2", 5, True)
    s, net, dev = make_setup(cfg)
    res = hpfx.hpf(net, dev, s, record_trajectory=True)
    traj = np.asarray(res.trajectory)
    k = int(res.n_iter)
    assert np.isfinite(traj[: k + 1]).all()
    assert np.isnan(traj[k + 1:]).all()
    # last recorded raw state equals the (pre-cleanup) solution phasors
    Vm_k, Va_k = traj[k, 0], traj[k, 1]
    raw = Vm_k * np.exp(1j * Va_k)
    final = np.asarray(res.V_m) * np.exp(1j * np.asarray(res.V_a))
    np.testing.assert_allclose(raw, final, atol=1e-12)
    # virtual-measurement NE fit from our own iterates (the
    # norton_parameters_fuchs.py workflow on hpfx trajectories)
    from hpfx.devices import fit_coupled_ne, ne_selftest
    H = s.n_harmonics
    iters = [0, 1, 2, 3]  # H+1 = 4 measurements
    V_fit = np.array([traj[i, 0, :, 3] * np.exp(1j * traj[i, 1, :, 3])
                      for i in iters])
    from hpfx.harmonic import current_injections
    from hpfx import cx as cxm
    I_fit = np.array([
        current_injections(
            cxm.polar(res.trajectory[i, 0], res.trajectory[i, 1]),
            dev, net.m).to_numpy()[0]
        for i in iters])
    I_N, Y_N = fit_coupled_ne(V_fit, I_fit)
    assert float(ne_selftest(I_N, Y_N, V_fit, I_fit)) < 1e-8
    # the device IS a Norton equivalent: the fit recovers it exactly
    np.testing.assert_allclose(Y_N.to_numpy(), dev.Y_N.to_numpy()[0],
                               atol=1e-8)
