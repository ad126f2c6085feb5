"""Active shunt filter sizing (hpfx/activefilter.py).

Gates: the fitted spectrum must actually produce the targeted complex
voltages in a real re-solve (not a linear estimate), reproducibly from
the returned I_bg; on linear (constant-injection) devices the problem
is exactly linear and the fit must be near-machine-exact in few solves.
"""
import numpy as np
import pytest

import jax.numpy as jnp

import hpfx
from conftest import make_setup
from hpfx.activefilter import size_active_filter
from hpfx.network import NONLINEAR, PQ, SLACK


def test_full_compensation_net2():
    s, net, dev = make_setup(("net2", 25, True))
    out = size_active_filter(net, dev, s, bus=3, residual=0.05)
    assert bool(np.asarray(out.result.converged))
    # the filter collapses the bus THD to ~the residual floor
    assert out.thd_after < 0.1 * out.thd_before
    # per-order: every targeted |V_h| lands at residual * base (the
    # complex-residual fit is near-exact; allow fp + reaction slack)
    base = hpfx.hpf(net, dev, s)
    vb = np.asarray(base.V_m)[1:, 3]
    va = np.asarray(out.result.V_m)[1:, 3]
    np.testing.assert_allclose(va, 0.05 * vb, rtol=1e-3)
    assert out.misfit < 1e-10
    assert out.rating_rms > 0
    # the returned I_bg reproduces the validating solve exactly
    res2 = hpfx.hpf(net, dev, s, I_bg=out.I_bg)
    np.testing.assert_allclose(np.asarray(res2.V_m),
                               np.asarray(out.result.V_m), atol=1e-12)


def test_partial_compensation_backfires_on_coupled_devices():
    """Rating the filter for 5/7 only: the targeted orders DO collapse,
    but net2's coupled Nortons reroute emission into the untargeted
    orders and TOTAL THD rises — the same mitigation-tradeoff physics
    as the passive-filter loss increase (flows module); the sizer
    surfaces it instead of hiding it."""
    s, net, dev = make_setup(("net2", 25, True))
    out = size_active_filter(net, dev, s, bus=3, orders=[5, 7],
                             residual=0.05)
    assert bool(np.asarray(out.result.converged))
    base = hpfx.hpf(net, dev, s)
    hs = list(s.harmonics)
    k5, k7 = hs.index(5), hs.index(7)
    vb = np.asarray(base.V_m)[:, 3]
    va = np.asarray(out.result.V_m)[:, 3]
    np.testing.assert_allclose(va[[k5, k7]], 0.05 * vb[[k5, k7]],
                               rtol=1e-3)
    # untargeted orders moved UP (the coupled reaction), total got worse
    assert out.thd_after > out.thd_before
    # uncompensated orders in I_c are exactly zero
    ic = np.abs(np.asarray(out.I_c.re) + 1j * np.asarray(out.I_c.im))
    assert ic[[k5, k7]].min() > 0
    mask = np.ones(len(hs), bool)
    mask[[0, k5, k7]] = False
    assert ic[mask].max() == 0.0


def test_linear_devices_exact_in_few_solves():
    """Constant-injection (converter) devices: the sizing problem is
    exactly linear, so the Gauss-Newton fit converges to the forward
    NR tolerance floor (the recovery floor IS the solver threshold —
    the estimation-module fact) in few LM steps, and partial
    compensation HELPS (no coupled reaction to reroute)."""
    s = hpfx.settings_for_hmax(25, coupled=False)
    net = hpfx.network_from_arrays(
        bus_types=(SLACK, PQ, NONLINEAR),
        components=("generator", "lin_load", "drive"),
        P=[0, 100, 250], Q=[0, 50, 100], X_sh=[0.005, 0, 0],
        line_from=[0, 1], line_to=[1, 2],
        R=[0.5, 1.0], X=[2.0, 4.0],
        settings=s, per_unit=False)
    dev = hpfx.converter_device_set(
        net, s, [{"kind": "six_pulse", "I1": 0.3,
                  "alpha": np.deg2rad(20.0)}])
    out = size_active_filter(net, dev, s, bus=2, orders=[5, 7],
                             residual=0.05,
                             V0=hpfx.converter_warm_start(net, s, dev))
    assert out.misfit < 1e-8
    assert out.n_solves <= 14
    assert out.thd_after < out.thd_before
    # the compensating current ~ cancels the device's 5th/7th injection
    hs = list(s.harmonics)
    spec = hpfx.six_pulse_spectrum(s.harmonics, I1=0.3,
                                   alpha=np.deg2rad(20.0))
    ic = np.asarray(out.I_c.re) + 1j * np.asarray(out.I_c.im)
    for k in (hs.index(5), hs.index(7)):
        # same magnitude scale, opposite effect: |I_c + I_dev| << |I_dev|
        assert abs(ic[k] + spec[k]) < 0.15 * abs(spec[k])


def test_sizer_input_validation():
    s, net, dev = make_setup(("net2", 25, True))
    with pytest.raises(ValueError, match="out of range"):
        size_active_filter(net, dev, s, bus=99)
    with pytest.raises(ValueError, match="not compensatable"):
        size_active_filter(net, dev, s, bus=3, orders=[1])
    with pytest.raises(ValueError, match="not compensatable"):
        size_active_filter(net, dev, s, bus=3, orders=[4])


def test_cosized_bank_two_buses():
    """Bus-list sizing: one joint LM fit, each bus hitting its own
    residual target (the single-bus path is the len-1 special case)."""
    s, net, dev = make_setup(("net2", 25, True))
    out = size_active_filter(net, dev, s, bus=[2, 3], residual=0.05)
    assert bool(np.asarray(out.result.converged))
    assert out.I_c.shape == (2, len(s.harmonics))
    assert out.rating_rms.shape == (2,) and (out.rating_rms > 0).all()
    base = hpfx.hpf(net, dev, s)
    vb = np.asarray(base.V_m)[1:, [2, 3]]
    va = np.asarray(out.result.V_m)[1:, [2, 3]]
    np.testing.assert_allclose(va, 0.05 * vb, rtol=1e-3)
    assert (out.thd_after < 0.1 * out.thd_before).all()
    with pytest.raises(ValueError, match="duplicate"):
        size_active_filter(net, dev, s, bus=[3, 3])
