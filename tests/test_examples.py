"""Example-case tests: Fuchs textbook 4-bus, Almeida two-port, and the
analytic-device (autodiff) path vs the closed-form Norton path."""
import json
import os

import jax.numpy as jnp
import numpy as np

import hpfx
from hpfx import cx, harmonic
from hpfx.devices import AnalyticDeviceSet, norton_inject
from hpfx.examples import linear_hcne_twoport, solve_fuchs
from hpfx.examples.fuchs import (fuchs_device_set, fuchs_network,
                                 fuchs_settings)

from conftest import REPO, make_setup

VLOG = os.path.join(REPO, "validation", "V_log.json")
ILOG = os.path.join(REPO, "validation", "I_log.json")


def _vlog_states(raw=False):
    """Per-iteration voltages from V_log.json.  raw=True returns the
    reference's internal (V_m, V_a) pairs verbatim — magnitudes can be
    negative and angles unwrapped, and the textbook injection g(V) is NOT
    invariant under (m, a) -> (-m, a+pi) (it uses V_m^2·e^{3ja}), so
    injection comparisons must use the raw representation."""
    d = json.load(open(VLOG))
    iters = sorted({r["iteration"] for r in d["data"]})
    out = {}
    for it in iters:
        V = np.zeros((2, 4, 2) if raw else (2, 4),
                     float if raw else complex)
        for r in d["data"]:
            if r["iteration"] == it:
                h = 0 if r["harmonic"] == 1 else 1
                b = int(r["bus"][3:]) - 1
                if raw:
                    V[h, b] = (r["V_m"], r["V_a"])
                else:
                    V[h, b] = r["V_m"] * np.exp(1j * r["V_a"])
        out[it] = V
    return out


def _ilog():
    d = json.load(open(ILOG))
    out = {}
    for r in d["data"]:
        h = 0 if r["harmonic"] == 1 else 1
        out.setdefault(r["iteration"], np.zeros(2, complex))
        out[r["iteration"]][h] = r["0"] + 1j * r["1"]
    return out


def test_fuchs_converges_to_reference_fixed_point():
    """Final phasors match the V_log.json golden trace's last state within
    the reference's own convergence tolerance (err_h < 0.01,
    hcne_based_on_fuchs.py:16)."""
    res = solve_fuchs()
    assert bool(res.converged)
    assert int(res.n_iter) < 20
    ours = np.asarray(res.V_m) * np.exp(1j * np.asarray(res.V_a))
    ref = _vlog_states()[max(_vlog_states())]
    assert np.abs(ours - ref).max() < 5e-4


def test_fuchs_injection_matches_ilog():
    """The analytic injection evaluated at each logged V state reproduces
    the reference's logged injections (I_log.json, written at
    hcne_based_on_fuchs.py:244-246) — iteration by iteration."""
    s = fuchs_settings()
    dev = fuchs_device_set(s)
    states = _vlog_states(raw=True)
    ilog = _ilog()
    for it, V in states.items():
        if it not in ilog:
            continue
        V_m = jnp.asarray(V[:, 3, 0])
        V_a = jnp.asarray(V[:, 3, 1])
        got = dev.injections(V_m[:, None], V_a[:, None]).to_numpy()[0]
        np.testing.assert_allclose(got, ilog[it], atol=2e-9, err_msg=str(it))


def test_fuchs_jacobian_matches_autodiff():
    """Autodiff Jacobian of the textbook device equals jacfwd of the full
    mismatch (the blocks the reference hand-derives at
    hcne_based_on_fuchs.py:266-324)."""
    import jax
    s = fuchs_settings()
    net = fuchs_network(s)
    dev = fuchs_device_set(s)
    Y = hpfx.build_ybus(net, s)
    fund = hpfx.pf(Y, net, s)
    S = cx.Cx(net.bus_P, net.bus_Q)
    V_m0, V_a0 = harmonic.init_harmonic_voltages(fund, net, s)
    H, n, m, c = s.n_harmonics, net.n, net.m, net.c

    def f_of_x(x):
        V_m, V_a = harmonic.update_harmonic_voltages(V_m0, V_a0, x, H, n, c)
        return harmonic.harmonic_mismatch(V_m, V_a, Y, S, dev, m, n, c)[0]

    x0 = harmonic.harmonic_state_vector(V_m0, V_a0, c)
    J_ad = np.asarray(jax.jacfwd(f_of_x)(x0))
    J_hand = np.asarray(harmonic.build_harmonic_jacobian(
        V_m0, V_a0, Y, dev, m, n, c))
    np.testing.assert_allclose(J_hand, J_ad, atol=1e-10)


def test_analytic_norton_equals_closed_form():
    """An AnalyticDeviceSet wrapping norton_inject reproduces the dedicated
    DeviceSet solver path exactly (mismatch, Jacobian, and solution)."""
    cfg = ("net2", 5, True)
    s, net, dev = make_setup(cfg)
    adev = AnalyticDeviceSet(params=(dev.I_N, dev.Y_N),
                             inject=norton_inject, n_nl=net.n_nonlinear)
    Y = hpfx.build_ybus(net, s)
    fund = hpfx.pf(Y, net, s)
    S = cx.Cx(net.bus_P, net.bus_Q)
    V_m0, V_a0 = harmonic.init_harmonic_voltages(fund, net, s)
    m, n, c = net.m, net.n, net.c
    f1, e1 = harmonic.harmonic_mismatch(V_m0, V_a0, Y, S, dev, m, n, c)
    f2, e2 = harmonic.harmonic_mismatch(V_m0, V_a0, Y, S, adev, m, n, c)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-12)
    J1 = harmonic.build_harmonic_jacobian(V_m0, V_a0, Y, dev, m, n, c)
    J2 = harmonic.build_harmonic_jacobian(V_m0, V_a0, Y, adev, m, n, c)
    np.testing.assert_allclose(np.asarray(J1), np.asarray(J2), atol=1e-12)
    r1 = hpfx.hpf(net, dev, s)
    r2 = hpfx.hpf(net, adev, s)
    assert int(r1.n_iter) == int(r2.n_iter)
    np.testing.assert_allclose(np.asarray(r1.V_m), np.asarray(r2.V_m),
                               atol=1e-10)


def test_almeida_twoport_matches_block_solve():
    """The closed-form two-port solution equals the reference's Schur-style
    block formula (example_hcne_almeida.py:100-128) evaluated in numpy."""
    from test_devices import ALMEIDA_I_N, ALMEIDA_Y_N, ALMEIDA_V

    z_f = 0.05 + 0.25j
    Y_line = np.array([1 / z_f, 1 / (1.5 * z_f), 1 / (2 * z_f)])
    V_s = ALMEIDA_V[2]  # measurement-3 spectrum as supply (reference :119)

    sol = linear_hcne_twoport(Y_line, ALMEIDA_I_N, ALMEIDA_Y_N, V_s)

    # reference block formula
    Y_ss = np.diag(Y_line)
    Y_sl = -np.diag(Y_line)
    Y_ll = ALMEIDA_Y_N + np.diag(Y_line)
    Y_ll_inv = np.linalg.inv(Y_ll)
    top = np.concatenate([Y_ss - Y_sl @ Y_ll_inv @ Y_sl, Y_sl @ Y_ll_inv], 1)
    bot = np.concatenate([-Y_ll_inv @ Y_sl, Y_ll_inv], 1)
    I_s_V_l = np.concatenate([top, bot]) @ np.concatenate([V_s, ALMEIDA_I_N])
    np.testing.assert_allclose(sol.I_supply.to_numpy(), I_s_V_l[:3],
                               atol=1e-10)
    np.testing.assert_allclose(sol.V_load.to_numpy(), I_s_V_l[3:],
                               atol=1e-10)
    # corrected THD (magnitudes; the reference flags its own version)
    mag = np.abs(I_s_V_l[3:])
    np.testing.assert_allclose(float(sol.thd_v),
                               np.sqrt(mag[1] ** 2 + mag[2] ** 2) / mag[0])
    # physics: the node equation round-trips, Y_line∘(V_l - V_s) = I_inj
    I_inj = ALMEIDA_I_N - ALMEIDA_Y_N @ sol.V_load.to_numpy()
    np.testing.assert_allclose(Y_line * (sol.V_load.to_numpy() - V_s),
                               I_inj, atol=1e-9)


def test_norton_fit_from_logged_iterations():
    """norton_parameters_fuchs.py equivalent: use logged per-iteration
    states of the Fuchs solve as virtual measurements (V_log.json:31-35),
    fit a 2x2 coupled NE (:83-107), and round-trip it against the logged
    injections (:123-139).  The device is only approximately linear, so the
    fit reproduces the fitting points exactly and nearby iterates
    approximately."""
    from hpfx.devices import fit_coupled_ne, ne_selftest

    states = _vlog_states(raw=True)
    ilog = _ilog()
    # early iterations have well-separated voltage states (late iterates
    # are nearly identical -> singular measurement matrix)
    fit_iters = [0, 2, 5]
    V_fit = np.array([states[it][:, 3, 0] * np.exp(1j * states[it][:, 3, 1])
                      for it in fit_iters])
    I_fit_mes = np.array([ilog[it] for it in fit_iters])
    I_N, Y_N = fit_coupled_ne(V_fit, I_fit_mes)
    # exact on the fitting measurements
    assert float(ne_selftest(I_N, Y_N, V_fit, I_fit_mes)) < 1e-10
    # approximate on other iterates (the device is only mildly nonlinear)
    for it in (1, 3, 4, 6):
        V = states[it][:, 3, 0] * np.exp(1j * states[it][:, 3, 1])
        pred = I_N.to_numpy() - Y_N.to_numpy() @ V
        assert np.abs(pred - ilog[it]).max() < 5e-3
