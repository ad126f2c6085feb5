"""Distributed-parameter long-line branches (hpfx/longline.py).

Three independent oracles gate the model:
1. the correction factors against numpy-complex sinh/tanh arithmetic;
2. the corrected pi's two-port against the analytic distributed-line
   ABCD parameters [cosh θ, Z_c sinh θ; sinh θ/Z_c, cosh θ];
3. an N-section cascade of nominal pis, which converges to the
   distributed model as O(1/N²) — validating the analytic formula
   itself, independent of any textbook transcription error.
"""
import numpy as np
import pytest

import jax.numpy as jnp

import hpfx
from conftest import make_setup
from hpfx.cx import Cx
from hpfx.network import NONLINEAR, PQ, SLACK


def _factors_oracle(Z, Y):
    """Ks, Kp from numpy complex arithmetic (Z, Y complex arrays)."""
    theta = np.sqrt(Z * Y)
    with np.errstate(invalid="ignore", divide="ignore"):
        Ks = np.where(np.abs(theta) < 1e-12, 1.0, np.sinh(theta) / theta)
        Kp = np.where(np.abs(theta) < 1e-12, 1.0,
                      np.tanh(theta / 2.0) / (theta / 2.0))
    return Ks, Kp


def _charged_net(s, B=(0.08, 0.15), G=(0.0, 0.002)):
    """3-bus chain with line charging so θ is material at high h."""
    return hpfx.network_from_arrays(
        bus_types=(SLACK, PQ, NONLINEAR),
        components=("generator", "lin_load", "SMPS"),
        P=[0, 100, 250], Q=[0, 50, 100], X_sh=[0.005, 0, 0],
        line_from=[0, 1], line_to=[1, 2],
        R=[0.4, 0.9], X=[1.8, 3.5], B=list(B), G=list(G),
        settings=s, per_unit=False)


def test_factors_match_numpy_oracle():
    s = hpfx.settings_for_hmax(49, coupled=True)
    net = _charged_net(s)
    Ks, Kp = hpfx.longline_factors(net, s, include_fundamental=True)
    h = np.asarray(s.harmonics, float)[:, None]
    Z = np.asarray(net.line_R) + 1j * np.asarray(net.line_X) * h
    Y = np.asarray(net.line_G) + 1j * np.asarray(net.line_B) * h
    Ks_o, Kp_o = _factors_oracle(Z, Y)
    np.testing.assert_allclose(np.asarray(Ks.re) + 1j * np.asarray(Ks.im),
                               Ks_o, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(Kp.re) + 1j * np.asarray(Kp.im),
                               Kp_o, rtol=1e-12, atol=1e-14)
    # the correction is material at the top order on this feeder
    assert np.abs(Ks_o[-1] - 1.0).max() > 0.3
    # fundamental pinning: default drops the h=1 correction
    Ks_p, Kp_p = hpfx.longline_factors(net, s)
    assert float(Ks_p.re[0, 0]) == 1.0 and float(Ks_p.im[0, 0]) == 0.0
    np.testing.assert_allclose(np.asarray(Ks_p.re[1:]),
                               np.asarray(Ks.re[1:]), rtol=0, atol=0)


def test_two_port_matches_distributed_abcd():
    """Corrected pi Y-parameters == exact distributed-line two-port."""
    s = hpfx.settings_for_hmax(49, coupled=True)
    net = _charged_net(s)
    Ks, Kp = hpfx.longline_factors(net, s, include_fundamental=True)
    h = np.asarray(s.harmonics, float)[:, None]
    Z = np.asarray(net.line_R) + 1j * np.asarray(net.line_X) * h
    Y = np.asarray(net.line_G) + 1j * np.asarray(net.line_B) * h
    Zpi = Z * (np.asarray(Ks.re) + 1j * np.asarray(Ks.im))
    Ypi2 = (Y / 2) * (np.asarray(Kp.re) + 1j * np.asarray(Kp.im))
    # pi two-port: Y11 = 1/Zpi + Ypi/2, Y12 = -1/Zpi
    Y11 = 1 / Zpi + Ypi2
    Y12 = -1 / Zpi
    # analytic distributed: Y11 = cosh θ/(Zc sinh θ), Y12 = -1/(Zc sinh θ)
    theta = np.sqrt(Z * Y)
    Zc = np.sqrt(Z / Y)
    Y11_o = np.cosh(theta) / (Zc * np.sinh(theta))
    Y12_o = -1 / (Zc * np.sinh(theta))
    np.testing.assert_allclose(Y11, Y11_o, rtol=1e-10)
    np.testing.assert_allclose(Y12, Y12_o, rtol=1e-10)


def test_cascade_convergence():
    """N nominal-pi sections -> the distributed model as O(1/N²)."""
    Z = 0.4 + 3.5j           # the h=... totals of one stressed line
    Y = 0.002 + 0.9j

    def cascade_abcd(N):
        A = np.eye(2, dtype=complex)
        zs, ysh2 = Z / N, Y / (2 * N)
        sec = np.array([[1 + zs * ysh2, zs],
                        [ysh2 * (2 + zs * ysh2), 1 + zs * ysh2]])
        for _ in range(N):
            A = A @ sec
        return A

    theta = np.sqrt(Z * Y)
    Zc = np.sqrt(Z / Y)
    A_exact = np.array([[np.cosh(theta), Zc * np.sinh(theta)],
                        [np.sinh(theta) / Zc, np.cosh(theta)]])
    e8 = np.abs(cascade_abcd(8) - A_exact).max()
    e64 = np.abs(cascade_abcd(64) - A_exact).max()
    assert e64 < e8 / 30          # ~1/N² convergence
    assert e64 < 2e-4


def test_zero_charging_reduces_to_nominal():
    """B = G = 0 lines (all the shipped nets): structures identical."""
    s, net, dev = make_setup(("net2", 25, True))
    assert float(np.abs(np.asarray(net.line_B)).max()) == 0.0
    Y_ll, lineY, lineY_f = hpfx.longline_structures(net, s)
    Y_nom = hpfx.build_ybus(net, s)
    np.testing.assert_allclose(np.asarray(Y_ll.re), np.asarray(Y_nom.re),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(Y_ll.im), np.asarray(Y_nom.im),
                               rtol=0, atol=0)
    res_ll = hpfx.hpf(net, dev, s, Y=(Y_ll, lineY, lineY_f))
    res = hpfx.hpf(net, dev, s)
    assert bool(res_ll.converged)
    assert int(res_ll.n_iter) == int(res.n_iter)
    np.testing.assert_allclose(np.asarray(res_ll.V_m), np.asarray(res.V_m),
                               rtol=0, atol=1e-14)


def test_longline_solve_end_to_end():
    """Charged feeder: the long-line solve converges, matches a
    dense-Y-only solve (stable path consistency), and moves the high-
    order voltages away from the nominal-pi solution."""
    s = hpfx.settings_for_hmax(25, coupled=True)
    # modest charging: |θ| ~ 1 rad at the top order (a realistic long
    # EHV feeder), so the correction is material but pre-resonant
    net = _charged_net(s, B=(0.0004, 0.0008), G=(0.0, 1e-5))
    dev = hpfx.load_device_set(net, s)

    res_nom = hpfx.hpf(net, dev, s)
    triple = hpfx.longline_structures(net, s)
    res_ll = hpfx.hpf(net, dev, s, Y=triple)
    assert bool(res_nom.converged) and bool(res_ll.converged)

    # fundamental row pinned -> identical h=1 admittance block (the
    # coupled fixed point still moves V1 slightly via the NE coupling)
    Y_nom = hpfx.build_ybus(net, s)
    np.testing.assert_allclose(np.asarray(triple[0].re[0]),
                               np.asarray(Y_nom.re[0]), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(triple[0].im[0]),
                               np.asarray(Y_nom.im[0]), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(res_ll.V_m[0]),
                               np.asarray(res_nom.V_m[0]), atol=0.05)
    # high orders shift materially (the point of the model)
    top = np.abs(np.asarray(res_ll.V_m[-1]) - np.asarray(res_nom.V_m[-1]))
    assert top.max() > 1e-4

    # dense-only override (no line structure) reaches the same state:
    # the stable-mismatch path and the dense path agree on the physics
    res_dense = hpfx.hpf(net, dev, s, Y=triple[0])
    assert bool(res_dense.converged)
    np.testing.assert_allclose(np.asarray(res_ll.V_m),
                               np.asarray(res_dense.V_m),
                               rtol=0, atol=1e-9)

    # skin-effect composition: Rh shapes Z(h) before the correction
    Rh = hpfx.line_resistance(net, s, model="cigre_oh")
    Ks_skin, _ = hpfx.longline_factors(net, s, Rh=Rh,
                                       include_fundamental=True)
    Ks_flat, _ = hpfx.longline_factors(net, s,
                                       include_fundamental=True)
    assert np.abs(np.asarray(Ks_skin.re) -
                  np.asarray(Ks_flat.re)).max() > 1e-6
    res_both = hpfx.hpf(net, dev, s,
                        Y=hpfx.longline_structures(net, s, Rh=Rh))
    assert bool(res_both.converged)


def test_electrical_length_screen():
    s = hpfx.settings_for_hmax(49, coupled=True)
    net = _charged_net(s)
    th = np.asarray(hpfx.electrical_length(net, s))
    assert th.shape == (len(s.harmonics), net.n_lines)
    # grows ~linearly with order for X/B-dominated lines
    assert th[-1].min() > 10 * th[0].max()
    h = np.asarray(s.harmonics, float)[:, None]
    Z = np.asarray(net.line_R) + 1j * np.asarray(net.line_X) * h
    Y = np.asarray(net.line_G) + 1j * np.asarray(net.line_B) * h
    np.testing.assert_allclose(th, np.abs(np.sqrt(Z * Y)), rtol=1e-12)
