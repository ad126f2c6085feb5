"""Time-domain rectifier simulator tests: circuit physics, parity with the
reference's own Simulink measurements, and the full L0 -> L1 -> L4 chain
(simulate -> fit NE -> harmonic power flow)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

import hpfx
from hpfx.devices import read_ne_csv
from hpfx.ne_pipeline import (device_set_from_fit,
                              fit_norton_from_measurements,
                              load_measurements_mat)
from hpfx.network import NONLINEAR, PQ, SLACK
from hpfx.simulate import (RectifierParams, SweepProtocol,
                           characterize_rectifier, ev_params, ev_protocol,
                           simulate_rectifier, smps_params)

from conftest import DATA


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


def test_matches_simulink_measurements():
    """Fed the exact inputs recorded in the shipped smps.mat (fundamentals
    230/200 V at 0 deg/10 deg, harmonics 2.3/23 V at 150..450 Hz — including
    the reference script's leak of the second fundamental magnitude into
    the harmonic sims, sim_FFT.m:242-249), the JAX simulator reproduces the
    reference's own Simulink output spectra at every odd-harmonic bin of
    every one of the 10 measurements.  This is the direct L0 parity gate:
    same circuit (SMPS.mdl's hardcoded branches + powerlib diode pair),
    same protocol, same FFT post-processing."""
    ref = load_measurements_mat(os.path.join(DATA, "smps.mat"))
    proto = SweepProtocol(
        fund_mags=(230.0, 200.0), fund_phases_deg=(0.0, 10.0),
        harm_freqs=(150.0, 250.0, 350.0, 450.0), harm_mags=(2.3, 23.0),
        harm_phase_deg=20.0, h_max=500.0, cycles=2, substeps=8,
        harm_fund_mag=200.0, harm_fund_phase_deg=0.0)
    ms = characterize_rectifier(smps_params(), proto)
    cols, rcols = ms.harmonic_cols, ref.harmonic_cols
    pairs = [(ms.fund_I[k, cols], ref.fund_I[k, rcols]) for k in range(2)]
    pairs += [(ms.harm_I[i, j, cols], ref.harm_I[i, j, rcols])
              for i in range(4) for j in range(2)]
    for ours, simulink in pairs:
        err = np.max(np.abs(ours - simulink)) / np.abs(simulink).max()
        assert err < 3e-3, err


def test_reproduces_shipped_ne_table():
    """The complete L0+L1 chain (simulate -> FFT -> Almeida/Thunberg fits)
    reproduces the *shipped* smps_NE.csv across harmonics.  Provenance
    established in round 2: the table was generated from SMPS.mdl's
    hardcoded circuit (L1 = 0.006e-6 — sim_FFT.m:28's value never reached
    the model) under the smps.mat-era protocol (fundamentals 230/200 V,
    harmonic magnitudes 2.3/23 V, two-cycle FFT window, and the Va leak
    into the harmonic sims), fitted with measurement-1 assumed as the
    harmonic sims' fundamental exactly as NE_from_sim.py:146-153 does.
    Residuals are pure integration error (~1e-3), not model mismatch."""
    shipped = read_ne_csv(os.path.join(DATA, "smps_NE.csv"))
    sf = shipped["freqs"]
    proto = SweepProtocol(
        fund_mags=(230.0, 200.0), harm_mags=(2.3, 23.0),
        harm_freqs=tuple(50.0 * h for h in range(3, 26, 2)),
        h_max=1300.0, substeps=8, cycles=2,
        harm_fund_mag=200.0, harm_fund_phase_deg=0.0)
    ms = characterize_rectifier(smps_params(), proto)
    fit = fit_norton_from_measurements(ms)
    assert fit.passed
    sel = [sf.index(int(f)) for f in fit.freqs]
    rsel = [shipped["y_row_freqs"].index(int(f)) for f in fit.freqs]
    Yc_s = shipped["Y_c"][np.ix_(rsel, sel)]
    # full coupled (H x H) admittance matrix, normalized infinity error
    assert np.abs(fit.Y_c - Yc_s).max() / np.abs(Yc_s).max() < 5e-3
    # per-element uncoupled parameters at every harmonic
    rel_Y = np.abs(fit.Y_uc - shipped["Y_uc"][sel]) / np.abs(
        shipped["Y_uc"][sel])
    rel_I = np.abs(fit.I_uc - shipped["I_uc"][sel]) / np.abs(
        shipped["I_uc"][sel])
    assert rel_Y.max() < 2e-2, rel_Y
    assert rel_I.max() < 1e-2, rel_I
    # coupled current source
    assert np.abs(fit.I_c - shipped["I_c"][sel]).max() / np.abs(
        shipped["I_c"][sel]).max() < 5e-3


def test_ev5_characterization():
    """The 3-phase EV_5 charger (sim_FFT.m:67-88): per-phase supply at
    230/sqrt(3), pu conversion reducing to r_base = v^2/p.  Its tiny EMI
    capacitance (X_C_emi = 601 pu) makes the bridge clamp the stiffest in
    the family (tau ~ 1.3 ns) — the case that NaN'd under explicit RK."""
    proto = ev_protocol("EV_5", harm_freqs=(150.0, 250.0), h_max=300.0,
                        substeps=8)
    np.testing.assert_allclose(proto.fund_mags[0], 230.0 * np.sqrt(2 / 3))
    ms = characterize_rectifier(ev_params("EV_5"), proto)
    fit = fit_norton_from_measurements(ms)
    assert np.all(np.isfinite(fit.Y_c))
    assert fit.passed


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
