"""Edge cases: linear-only grids, background distortion as a Norton source,
even/arbitrary harmonic sets."""
import numpy as np
import pytest

import hpfx
from hpfx.devices import device_set_from_arrays
from hpfx.examples import linear_hcne_twoport
from hpfx.network import NONLINEAR, PQ, SLACK


def test_linear_only_network():
    """No nonlinear buses: the harmonic solve reduces to the linear network
    equations; with the slack shunt present (X_sh != 0, active for h > 1)
    the harmonic voltages collapse to ~0."""
    s = hpfx.settings_for_hmax(5, coupled=True)
    net = hpfx.network_from_arrays(
        bus_types=(SLACK, PQ, PQ), components=("g", "l1", "l2"),
        P=[0, 0.1, 0.2], Q=[0, 0.1, 0.1], X_sh=[0.005 / 160, 0, 0],
        line_from=[0, 1, 2], line_to=[1, 2, 0],
        R=[0.003, 0.006, 0.003], X=[0.003, 0.025, 0.006], settings=s)
    assert net.n_nonlinear == 0 and net.m == net.n
    dev = hpfx.load_device_set(net, s)
    assert dev.I_N.shape == (0, 3)
    res = hpfx.hpf(net, dev, s)
    assert bool(res.converged)
    assert float(np.abs(np.asarray(res.V_m)[1:]).max()) < 1e-6
    thd = hpfx.get_thd(res.V_m)
    np.testing.assert_allclose(np.asarray(thd.THD_F), 0.0, atol=1e-6)


def test_background_distortion_recipe():
    """Background (upstream) distortion modeled as a linear Norton source:
    I_N = Y_th·V_bg, Y_N = Y_th at the boundary bus.  On a 2-bus system
    this must reproduce the closed-form Almeida two-port solution
    (examples/almeida.py) through the full NR machinery."""
    s = hpfx.settings_for_hmax(5, coupled=True).with_(thresh_h=1e-10)
    # per-harmonic line admittance between slack and the boundary bus
    z_f = 0.05 + 0.25j
    Y_line = np.array([1 / (z_f * h) for h in s.harmonics])
    # upstream equivalent: Thevenin (V_bg behind Z_th) -> Norton
    z_th = 0.02 + 0.1j
    Y_th = np.array([1 / (z_th * h) for h in s.harmonics])
    V_bg = np.array([0.0, 0.05 * np.exp(0.3j), 0.02 * np.exp(-0.5j)])
    I_N = Y_th * V_bg
    dev = device_set_from_arrays(I_N, np.diag(Y_th), coupled=True,
                                 settings=s)
    net = hpfx.network_from_arrays(
        bus_types=(SLACK, NONLINEAR), components=("grid", "boundary"),
        P=[0, 0], Q=[0, 0],
        line_from=[0], line_to=[1],
        R=[z_f.real], X=[z_f.imag], settings=s)
    res = hpfx.hpf(net, dev, s)
    assert bool(res.converged)
    V = np.asarray(res.V_m) * np.exp(1j * np.asarray(res.V_a))

    # closed form: per harmonic h>1, Y_line(V1 - V0) = I_N - Y_N V1 with
    # V0 = 0 at the slack... but the slack harmonic voltage is a free
    # variable here; eliminate it via the slack current balance: at the
    # slack bus, dI = Y_line(V0 - V1) = 0 has no injection -> V0 = V1?
    # No: the slack has no harmonic shunt, so the 2-bus harmonic system is
    # Y_h [V0; V1] + [0; -I_N + Y_N V1] = 0.  Solve directly:
    for k, h in enumerate(s.harmonics):
        if h == 1:
            continue
        yl = Y_line[k]
        Yh = np.array([[yl, -yl], [-yl, yl]])
        A = Yh + np.diag([0, Y_th[k]])
        rhs = np.array([0, I_N[k]])
        V_direct = np.linalg.solve(A, rhs)
        np.testing.assert_allclose(V[k], V_direct, atol=1e-7)


def test_even_and_sparse_harmonic_sets():
    """The solver accepts arbitrary harmonic tuples (the reference's Fuchs
    case already uses the non-contiguous {1, 5})."""
    s = hpfx.Settings(harmonics=(1, 2, 7), coupled=True)
    net = hpfx.network_from_arrays(
        bus_types=(SLACK, NONLINEAR), components=("g", "d"),
        P=[0, 0.1], Q=[0, 0.05], X_sh=[0.001, 0],
        line_from=[0], line_to=[1], R=[0.01], X=[0.05], settings=s)
    rng = np.random.default_rng(0)
    Y_N = 0.3 * (rng.normal(size=(3, 3)) + 1j * rng.normal(size=(3, 3)))
    I_N = 0.05 * (rng.normal(size=3) + 1j * rng.normal(size=3))
    dev = device_set_from_arrays(I_N, Y_N, coupled=True, settings=s)
    res = hpfx.hpf(net, dev, s)
    assert bool(res.converged)
    # reactances scaled with the actual harmonic orders 2 and 7
    Y = hpfx.build_ybus(net, s).to_numpy()
    np.testing.assert_allclose(Y[1, 0, 1], -1 / (0.01 + 1j * 0.05 * 2))
    np.testing.assert_allclose(Y[2, 0, 1], -1 / (0.01 + 1j * 0.05 * 7))


def test_interharmonic_orders():
    """Non-integer (interharmonic) orders — cycloconverter/arc-furnace
    sidebands — ride the whole stack: the harmonic axis is a float grid
    everywhere (Ybus h-scaling, NE coupling, THD)."""
    s = hpfx.Settings(harmonics=(1, 2.47, 5.0, 7.13), coupled=True)
    net = hpfx.network_from_arrays(
        bus_types=(SLACK, NONLINEAR), components=("g", "d"),
        P=[0, 0.1], Q=[0, 0.05], X_sh=[0.001, 0],
        line_from=[0], line_to=[1], R=[0.01], X=[0.05], settings=s)
    rng = np.random.default_rng(0)
    H = len(s.harmonics)
    Y_N = 0.3 * (rng.normal(size=(H, H)) + 1j * rng.normal(size=(H, H)))
    I_N = 0.05 * (rng.normal(size=H) + 1j * rng.normal(size=H))
    dev = device_set_from_arrays(I_N, Y_N, coupled=True, settings=s)
    res = hpfx.hpf(net, dev, s)
    assert bool(res.converged)
    # reactances scale with the exact non-integer order
    Y = hpfx.build_ybus(net, s).to_numpy()
    np.testing.assert_allclose(Y[1, 0, 1], -1 / (0.01 + 1j * 0.05 * 2.47))
    np.testing.assert_allclose(Y[3, 0, 1], -1 / (0.01 + 1j * 0.05 * 7.13))
    # frequency map follows
    assert s.harmonics_freq[1] == pytest.approx(123.5)
    # post-processing rides the float axis
    assert float(hpfx.get_thd(res.V_m).THD_F[1]) > 0.01
    wm = hpfx.waveform_metrics(res.V_m, res.V_a, s.harmonics, 4096)
    assert np.isfinite(float(wm.crest[1]))
