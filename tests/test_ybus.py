"""Ybus assembly parity + transformer model tests."""
import numpy as np

import hpfx
from hpfx.network import NONLINEAR, PQ, SLACK

from conftest import load_golden, make_setup


def test_ybus_matches_reference(config):
    g = load_golden(config)
    s, net, _ = make_setup(config)
    Y = hpfx.build_ybus(net, s).to_numpy()
    np.testing.assert_allclose(Y, g["Y"], atol=1e-12)


def _two_bus(s, **kw):
    return hpfx.network_from_arrays(
        bus_types=(SLACK, PQ), components=("gen", "load"),
        P=[0, 0.1], Q=[0, 0.1], line_from=[0], line_to=[1],
        R=[0.01], X=[0.05], settings=s, **kw)


def test_line_shunt_correct_attribution():
    """With G/B != 0 the correct model puts (G + j h B)/2 on both endpoints;
    the reference attributes it off-by-one (hcne_generalized.py:166)."""
    s = hpfx.settings_for_hmax(3)
    net = _two_bus(s, G=[0.02], B=[0.04])
    Y = hpfx.build_ybus(net, s).to_numpy()
    ys = 1 / (0.01 + 1j * 0.05)
    for hi, h in enumerate((1, 3)):
        ysh = (0.02 + 1j * h * 0.04) / 2
        np.testing.assert_allclose(Y[hi, 0, 0], 1 / (0.01 + 1j * 0.05 * h) + ysh)
        np.testing.assert_allclose(Y[hi, 1, 1], 1 / (0.01 + 1j * 0.05 * h) + ysh)
    # bug-compat mode shifts the shunt to bus index == 1-based ID
    s_bug = s.with_(compat_shunt_bug=True)
    Yb = hpfx.build_ybus(net, s_bug).to_numpy()
    ysh1 = (0.02 + 1j * 0.04) / 2
    # from-bus ID 1 -> lands on index 1; to-bus ID 2 -> dropped (no index 2)
    np.testing.assert_allclose(Yb[0, 0, 0], ys)
    np.testing.assert_allclose(Yb[0, 1, 1], ys + ysh1)


def test_transformer_reduces_to_line_at_unity_tap():
    s = hpfx.settings_for_hmax(5)
    plain = _two_bus(s)
    trafo = hpfx.network_from_arrays(
        bus_types=(SLACK, PQ), components=("gen", "load"),
        P=[0, 0.1], Q=[0, 0.1], line_from=[0], line_to=[1],
        R=[0.01], X=[0.05], tau=[1.0], phase_shift=[0.0], settings=s)
    np.testing.assert_allclose(hpfx.build_ybus(plain, s).to_numpy(),
                               hpfx.build_ybus(trafo, s).to_numpy())


def test_transformer_tap_and_shift():
    """Standard pi-model transformer admittance (PyPSA convention; the
    capability of pi_trafo_pf_test.py:117-145 with its FIXMEs resolved)."""
    s = hpfx.settings_for_hmax(3)
    tau, shift_deg = 1.05, 30.0
    net = hpfx.network_from_arrays(
        bus_types=(SLACK, PQ), components=("gen", "load"),
        P=[0, 0.1], Q=[0, 0.1], line_from=[0], line_to=[1],
        R=[0.01], X=[0.05], tau=[tau], phase_shift=[shift_deg], settings=s)
    Y = hpfx.build_ybus(net, s).to_numpy()
    phi = np.deg2rad(shift_deg)
    for hi, h in enumerate((1, 3)):
        ys = 1 / (0.01 + 1j * 0.05 * h)
        np.testing.assert_allclose(Y[hi, 0, 1], -ys / (tau * np.exp(-1j * phi)))
        np.testing.assert_allclose(Y[hi, 1, 0], -ys / (tau * np.exp(1j * phi)))
        np.testing.assert_allclose(Y[hi, 0, 0], ys / tau**2)
        np.testing.assert_allclose(Y[hi, 1, 1], ys)
    # current conservation: zero net injection for the no-shift transformer
    # at equal voltages scaled by tau
    ys = 1 / (0.01 + 1j * 0.05)
    net2 = hpfx.network_from_arrays(
        bus_types=(SLACK, PQ), components=("gen", "load"),
        P=[0, 0.1], Q=[0, 0.1], line_from=[0], line_to=[1],
        R=[0.01], X=[0.05], tau=[tau], settings=s)
    Y2 = hpfx.build_ybus(net2, s).to_numpy()[0]
    V = np.array([1.0, 1.0 / tau])  # ideal-transformer voltage ratio
    I = Y2 @ V
    np.testing.assert_allclose(I, 0, atol=1e-12)


def test_xsh_only_applied_above_fundamental():
    s = hpfx.settings_for_hmax(5)
    net = hpfx.network_from_arrays(
        bus_types=(SLACK, PQ, NONLINEAR), components=("g", "l", "SMPS"),
        P=[0, 0.1, 0.2], Q=[0, 0.1, 0.1], X_sh=[0.005, 0, 0],
        line_from=[0, 1], line_to=[1, 2], R=[0.01, 0.01], X=[0.05, 0.02],
        settings=s)
    Y = hpfx.build_ybus(net, s).to_numpy()
    ys1 = 1 / (0.01 + 1j * 0.05)
    np.testing.assert_allclose(Y[0, 0, 0], ys1)  # h=1: no shunt
    for hi, h in ((1, 3), (2, 5)):
        ysh = 1 / (1j * 0.005 * h)
        np.testing.assert_allclose(
            Y[hi, 0, 0], 1 / (0.01 + 1j * 0.05 * h) + ysh)
