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
