"""Time-domain rectifier simulator tests: circuit physics + the full
L0 -> L1 -> L4 chain (simulate -> fit NE -> harmonic power flow)."""
import jax.numpy as jnp
import numpy as np
import pytest

import hpfx
from hpfx.ne_pipeline import device_set_from_fit, fit_norton_from_measurements
from hpfx.network import NONLINEAR, PQ, SLACK
from hpfx.simulate import (RectifierParams, SweepProtocol,
                           characterize_rectifier, ev_params,
                           simulate_rectifier, smps_params)


@pytest.fixture(scope="module")
def smps_sweep():
    proto = SweepProtocol(harm_freqs=(150.0, 250.0, 350.0, 450.0))
    return characterize_rectifier(smps_params(), proto)


def test_rectifier_physics():
    """DC link charges to ~ the source peak; source current is odd-harmonic
    rich with negligible even content (half-wave symmetry)."""
    p = smps_params()
    src = lambda t: 230 * np.sqrt(2) * jnp.sin(2 * jnp.pi * 50.0 * t)
    i_s, v_s = simulate_rectifier(p, src, 0.08)
    i = np.asarray(i_s)[60000:80000]         # one steady cycle
    ft = np.abs(np.fft.fft(i) / len(i))[:12] * 2
    odd = ft[[1, 3, 5]]
    even = ft[[2, 4, 6]]
    assert odd[0] > 10.0                      # ~kW-scale fundamental
    assert np.all(odd[1:] > 1.0)              # strong 3rd/5th
    # even harmonics far below odd (small residual from the slow DC-link
    # settling transient, tau = R_eq*C_dc = 0.6 s >> t_start)
    assert np.all(even < 0.1 * odd[0])
    # declining harmonic envelope
    assert odd[0] > odd[1] > odd[2]


def test_ev_params_conversion():
    """Collin per-unit tables -> SI (sim_FFT.m:119-139)."""
    p = ev_params("EV_1")
    r_base = 230.0 / (110.0 / 230.0)
    np.testing.assert_allclose(p.R1, 0.0049 * r_base)
    np.testing.assert_allclose(p.R_eq, (0.006 * 315 - 0.01) * r_base)
    np.testing.assert_allclose(p.L1, 3.17e-6 * r_base / (2 * np.pi * 50))
    np.testing.assert_allclose(p.C_emi, 1 / (9.198 * r_base * 2 * np.pi * 50))
    with pytest.raises(ValueError, match="unknown EV model"):
        ev_params("EV_3")


def test_sweep_measurement_set(smps_sweep):
    ms = smps_sweep
    assert ms.fund_I.shape[0] == 2
    assert ms.harm_I.shape[:2] == (4, 2)
    np.testing.assert_allclose(ms.spectrum[ms.harmonic_cols][:5],
                               [50, 150, 250, 350, 450])
    # harmonic sims actually respond at the applied frequency
    cols = ms.harmonic_cols
    resp1 = np.abs(ms.harm_I[0, 0, cols[1]])   # 150 Hz applied, 150 Hz bin
    resp2 = np.abs(ms.harm_I[0, 1, cols[1]])
    base = np.abs(ms.fund_I[0, cols[1]])
    assert abs(resp2 - base) > abs(resp1 - base) * 1.2  # larger V_h moves it


def test_full_circle_smps(smps_sweep):
    """The complete pipeline the reference spreads over MATLAB + Python:
    characterize the circuit, fit the coupled NE (self-tests below the
    reference's 1e-6 gate), and run the harmonic power flow with it."""
    fit = fit_norton_from_measurements(smps_sweep)
    assert fit.passed

    s = hpfx.settings_for_hmax(9, coupled=True).with_(
        base_power=10000.0, base_voltage=230.0)
    net = hpfx.network_from_arrays(
        bus_types=(SLACK, PQ, NONLINEAR),
        components=("gen", "load", "sim_smps"),
        P=[0, 1000, 7000], Q=[0, 500, 1000], X_sh=[0.01, 0, 0],
        line_from=[0, 1], line_to=[1, 2],
        R=[0.4, 0.2], X=[0.8, 0.4],
        settings=s, per_unit=False)
    dev = device_set_from_fit(fit, s, n_nl=net.n_nonlinear)
    res = hpfx.hpf(net, dev, s)
    assert bool(res.converged)
    thd = hpfx.get_thd(res.V_m)
    assert float(jnp.max(thd.THD_F)) > 0.001   # visible distortion
    assert float(jnp.max(thd.THD_F)) < 1.0     # but a sane solution
