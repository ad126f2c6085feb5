"""Harmonic source estimation (hpfx/estimate.py).

Inverse-crime tests: synthesize measurements from known per-device
scales, start the fit elsewhere, and require recovery — including from
PARTIAL observability (metering only buses that host no device).
"""
import numpy as np
import pytest

import jax.numpy as jnp

import hpfx
from conftest import make_setup
from hpfx.network import NONLINEAR, PQ, SLACK


def two_smps_feeder(h_max=9):
    """slack — PQ — SMPS — SMPS chain: two separable harmonic sources
    plus a device-free bus to meter.  thresh_h tightened: the recovery
    floor is the NR tolerance of the forward solves (the fit cannot be
    more accurate than the simulator generating its measurements)."""
    s = hpfx.settings_for_hmax(h_max, coupled=True, thresh_h=1e-8)
    net = hpfx.network_from_arrays(
        bus_types=(SLACK, PQ, NONLINEAR, NONLINEAR),
        components=("generator", "lin_load", "SMPS", "SMPS"),
        P=[0, 100, 250, 150], Q=[0, 50, 100, 60],
        line_from=[0, 1, 2], line_to=[1, 2, 3],
        R=[0.4, 0.8, 1.2], X=[1.5, 3.0, 4.5],
        settings=s, per_unit=False)
    return s, net, hpfx.load_device_set(net, s)


def _truth(s, net, dev, scales):
    res = hpfx.hpf(net, dev.scale(jnp.asarray(scales, s.real_dtype)), s)
    assert bool(res.converged)
    return res


def test_recovers_scales_full_observation():
    s, net, dev = two_smps_feeder()
    true = [0.7, 1.3]
    res = _truth(s, net, dev, true)
    out = hpfx.estimate_injections(net, dev, s, res.V_m,
                                   scales0=1.0)
    np.testing.assert_allclose(np.asarray(out.scales), true, atol=1e-5)
    assert out.misfit < 1e-8 < out.misfit0


def test_localizes_from_remote_bus_only():
    """Meter ONLY bus 1 (hosts no device): the two sources at buses 2
    and 3 must still be separated — the network's transfer impedances
    make the inverse problem identifiable from a remote measurement."""
    s, net, dev = two_smps_feeder()
    true = [1.2, 0.6]
    res = _truth(s, net, dev, true)
    V_partial = jnp.zeros_like(res.V_m).at[:, 1].set(res.V_m[:, 1])
    out = hpfx.estimate_injections(net, dev, s, V_partial, buses=[1],
                                   scales0=1.0)
    np.testing.assert_allclose(np.asarray(out.scales), true, atol=1e-4)
    assert out.misfit < 1e-9


def test_seven_sources_net1():
    """The reference-scale case: recover all 7 device levels of net1
    from full voltage-magnitude observation."""
    s, net, dev = make_setup(("net1", 9, True))
    rng = np.random.default_rng(7)
    true = rng.uniform(0.6, 1.4, net.n_nonlinear)
    res = _truth(s, net, dev, true)
    out = hpfx.estimate_injections(net, dev, s, res.V_m,
                                   scales0=1.0)
    np.testing.assert_allclose(np.asarray(out.scales), true, atol=1e-5)
    assert out.misfit < 1e-7


def test_known_load_level_enters_both_sides():
    """Measurements taken at a 1.15x load level: passing p_scale/q_scale
    must reproduce the operating point (a silent mismatch between the
    solve and gradient sides would stall the fit away from truth)."""
    s, net, dev = two_smps_feeder()
    import dataclasses
    net_l = dataclasses.replace(net, bus_P=net.bus_P * 1.15,
                                bus_Q=net.bus_Q * 1.15)
    true = [0.9, 1.1]
    res = hpfx.hpf(net_l, dev.scale(jnp.asarray(true, s.real_dtype)), s)
    assert bool(res.converged)
    out = hpfx.estimate_injections(net, dev, s, res.V_m,
                                   p_scale=1.15, q_scale=1.15,
                                   scales0=1.0)
    np.testing.assert_allclose(np.asarray(out.scales), true, atol=1e-5)


def test_bounds_and_start_projection():
    s, net, dev = two_smps_feeder()
    res = _truth(s, net, dev, [1.0, 1.0])
    out = hpfx.estimate_injections(net, dev, s, res.V_m,
                                   scales0=5.0, bounds=(0.2, 1.5),
                                   steps=3)
    sc = np.asarray(out.scales)
    assert (sc >= 0.2 - 1e-12).all() and (sc <= 1.5 + 1e-12).all()


def test_noise_robustness():
    """1% multiplicative meter noise.  The two same-spectrum SMPS on a
    chain are nearly collinear sources (the Jacobian's condition number
    amplifies noise into the parameter estimate ~30x — physics, not a
    solver defect), so the honest gates are: the misfit lands at the
    noise floor, and the FITTED MODEL predicts the noise-free voltages
    far better than the noise level (the ill-determined parameter
    direction barely moves the observables)."""
    s, net, dev = two_smps_feeder()
    true = [0.8, 1.2]
    res = _truth(s, net, dev, true)
    rng = np.random.default_rng(11)
    V_noisy = jnp.asarray(
        np.asarray(res.V_m) * (1.0 + 0.01 * rng.standard_normal(
            res.V_m.shape)), s.real_dtype)
    out = hpfx.estimate_injections(net, dev, s, V_noisy, scales0=1.0,
                                   weights="relative")
    # noise floor: neither zero (would mean chasing noise exactly) nor
    # the starting misfit
    # (misfit0 is itself mostly noise here — the start is already close
    # in observable space — so gate the band and improvement, not a big
    # reduction factor)
    assert 1e-6 < out.misfit < 1e-1
    assert out.misfit < out.misfit0
    # prediction quality: the fitted operating point reproduces the
    # TRUE (noise-free) harmonic voltages to well under the 1% noise
    pred_err = float(np.abs(np.asarray(out.result.V_m[1:])
                            - np.asarray(res.V_m[1:])).max())
    sig = float(np.abs(np.asarray(res.V_m[1:])).max())
    assert pred_err < 0.02 * sig, (pred_err, sig)
    # the parameter error itself is bounded by cond x noise
    np.testing.assert_allclose(np.asarray(out.scales), true, atol=0.5)


def test_mix_estimation_identifies_device_types():
    """DeviceLibrary input: fit the full (n_nl, T) mix — WHICH device
    type sits at each bus.  Truth: bus 2 runs 1.0x SMPS, bus 3 runs a
    0.4 SMPS + 0.8 ev_1 blend; the differing spectra identify it."""
    s, net, dev = two_smps_feeder()
    lib = hpfx.load_device_library(("SMPS", "ev_1"), s)
    true_w = jnp.asarray([[1.0, 0.0], [0.4, 0.8]], s.real_dtype)
    res = hpfx.hpf(net, lib.mixed(true_w), s)
    assert bool(res.converged)
    out = hpfx.estimate_injections(net, lib, s, res.V_m, scales0=0.5)
    assert out.scales.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(out.scales),
                               np.asarray(true_w), atol=1e-4)
    assert out.misfit < 1e-10


# -- background-spectrum estimation (estimate_background) -----------------

def _bg_truth():
    s, net, dev = make_setup(("net2", 25, True))
    spec = {5: (0.02, 0.4), 7: (0.012, -1.1)}
    I_bg = hpfx.background_from_harmonics(net, s, spec)
    res = hpfx.hpf(net, dev, s, I_bg=I_bg)
    assert bool(res.converged)
    want = {h: m_h * np.exp(1j * a_h) for h, (m_h, a_h) in spec.items()}
    return s, net, dev, res, want


def test_background_recovery_full_observation():
    """Complex Thevenin spectrum recovered from |V| meters alone: the
    device emissions anchor the phase through interference."""
    s, net, dev, res, want = _bg_truth()
    est = hpfx.estimate_background(net, dev, s, res.V_m, orders=(5, 7))
    assert est.misfit < 1e-14
    for h, v in want.items():
        got = est.v_bg[est.orders.index(h)]
        assert abs(got - v) < 1e-8, (h, got, v)


def test_background_recovery_partial_observation():
    """Two meters (the slack + one mid-feeder bus) still identify both
    orders — 4 real parameters vs 2 buses x 13 harmonic rows."""
    s, net, dev, res, want = _bg_truth()
    est = hpfx.estimate_background(net, dev, s, res.V_m, orders=(5, 7),
                                   buses=[0, 1])
    for h, v in want.items():
        got = est.v_bg[est.orders.index(h)]
        assert abs(got - v) < 1e-6, (h, got, v)


def test_background_as_current_roundtrip():
    """as_current=True fits the injected Norton spectrum directly (the
    no-grid-impedance escape hatch, e.g. nets without slack X_sh)."""
    s, net, dev = two_smps_feeder()
    i_true = 0.3 * np.exp(0.7j)
    orders = list(s.harmonics)
    I_bg = hpfx.background_from_harmonics(
        net, s, {5: (abs(i_true), float(np.angle(i_true)))},
        bus=1, as_current=True)
    res = hpfx.hpf(net, dev, s, I_bg=I_bg)
    assert bool(res.converged)
    est = hpfx.estimate_background(net, dev, s, res.V_m, orders=(5,),
                                   bus=1, as_current=True, bound=0.5)
    assert abs(est.v_bg[0] - i_true) < 1e-7
    assert 5 in orders   # sanity: order on the grid


def test_background_order_validation():
    s, net, dev = make_setup(("net2", 25, True))
    V = np.ones((s.n_harmonics, net.n))
    with pytest.raises(ValueError):
        hpfx.estimate_background(net, dev, s, V, orders=(1,))
    with pytest.raises(ValueError):
        hpfx.estimate_background(net, dev, s, V, orders=(4,))


def test_background_noise_gates_predictions():
    """1% relative meter noise: fitted spectrum predicts the measured
    voltages to noise level even if parameters absorb some of it."""
    s, net, dev, res, want = _bg_truth()
    rng = np.random.default_rng(3)
    V_noisy = np.asarray(res.V_m) * (1 + 0.01 * rng.standard_normal(
        np.asarray(res.V_m).shape))
    est = hpfx.estimate_background(net, dev, s, V_noisy, orders=(5, 7),
                                   weights="relative")
    pred_err = float(np.abs(np.asarray(est.result.V_m) -
                            np.asarray(res.V_m)).max())
    sig = float(np.abs(np.asarray(res.V_m)).max())
    assert pred_err < 0.03 * sig, (pred_err, sig)
