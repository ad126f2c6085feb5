"""NE production pipeline tests (NE_from_sim.py equivalent) on the shipped
smps.mat measurement sweep."""
import os

import numpy as np
import pytest

import hpfx
from hpfx.devices import read_ne_csv
from hpfx.ne_pipeline import (MeasurementSet, device_set_from_fit,
                              export_ne_csv, export_opendss_spectrum,
                              fit_norton_from_measurements,
                              load_measurements_mat)

from conftest import DATA

SMPS_MAT = os.path.join(DATA, "smps.mat")


@pytest.fixture(scope="module")
def ms():
    return load_measurements_mat(SMPS_MAT)


@pytest.fixture(scope="module")
def fit(ms):
    return fit_norton_from_measurements(ms)


def test_measurement_layout(ms):
    assert ms.cycles == 2
    np.testing.assert_allclose(ms.harm_freqs, [150, 250, 350, 450])
    # odd-harmonic columns only: 50, 150, ..., 450 (NE_from_sim.py:82-83)
    np.testing.assert_allclose(ms.spectrum[ms.harmonic_cols],
                               [50, 150, 250, 350, 450], atol=1e-9)
    assert ms.fund_V.shape == (2,)
    assert ms.harm_I.shape == (4, 2, 21)


def test_selftests_pass(fit):
    """Both NE models reconstruct the measurements below the reference's
    1e-6 warning threshold (NE_from_sim.py:132, 190)."""
    assert fit.err_uncoupled < 1e-6
    assert fit.err_coupled < 1e-6
    assert fit.passed


def test_fundamental_matches_shipped_table(fit):
    """The uncoupled fundamental admittance of the fit equals the shipped
    smps_NE.csv's Y_N_c[50,50] — both were produced from the same circuit
    model (also: 'Y_N_ff equal to uncoupled', NE_from_sim.py:172)."""
    shipped = read_ne_csv(os.path.join(DATA, "smps_NE.csv"))
    np.testing.assert_allclose(fit.Y_uc[0], shipped["Y_c"][0, 0], rtol=1e-10)
    np.testing.assert_allclose(fit.Y_c[0, 0], fit.Y_uc[0], rtol=1e-10)


def test_csv_roundtrip(fit, tmp_path):
    path = str(tmp_path / "dev_NE.csv")
    export_ne_csv(fit, path)
    raw = read_ne_csv(path)
    np.testing.assert_array_equal(raw["Y_c"], fit.Y_c)
    np.testing.assert_array_equal(raw["I_c"], fit.I_c)
    np.testing.assert_array_equal(raw["Y_uc"], fit.Y_uc)
    np.testing.assert_array_equal(raw["I_uc"], fit.I_uc)
    assert raw["freqs"] == [50, 150, 250, 350, 450]


def test_opendss_spectrum_export(ms, tmp_path):
    path = str(tmp_path / "spec.csv")
    export_opendss_spectrum(ms, path)
    rows = [line.split(",") for line in open(path).read().splitlines()]
    assert [float(r[0]) for r in rows] == [1.0, 3.0, 5.0, 7.0, 9.0]
    assert float(rows[0][1]) == 1.0  # normalized to the fundamental


def test_device_set_from_fit(fit):
    s = hpfx.settings_for_hmax(9, coupled=True).with_(base_voltage=230.0)
    dev = device_set_from_fit(fit, s, n_nl=2)
    assert dev.I_N.shape == (2, 5)
    assert dev.Y_N.shape == (2, 5, 5)
    np.testing.assert_allclose(dev.Y_N.to_numpy()[0],
                               fit.Y_c / s.base_admittance, rtol=1e-6)
    s_uc = s.with_(coupled=False)
    dev_uc = device_set_from_fit(fit, s_uc)
    assert dev_uc.Y_N.shape == (1, 5)
    with pytest.raises(ValueError, match="lacks"):
        device_set_from_fit(fit, hpfx.settings_for_hmax(25))


def test_synthetic_roundtrip():
    """Measurements generated from a known coupled NE are fitted back
    exactly (a generative version of the reference's self-tests)."""
    rng = np.random.default_rng(3)
    net_freq, harm = 50.0, np.array([150.0, 250.0, 350.0])
    freqs = np.concatenate([[net_freq], harm])
    N = len(freqs)
    Y_true = rng.normal(size=(N, N)) + 1j * rng.normal(size=(N, N))
    I_true = rng.normal(size=N) + 1j * rng.normal(size=N)

    spectrum = np.arange(0, 500, 50.0)
    col_of = {f: int(np.argmin(np.abs(spectrum - f))) for f in freqs}

    def inj_spectrum(V_applied):
        I = I_true - Y_true @ V_applied
        full = np.zeros(len(spectrum), complex)
        for k, f in enumerate(freqs):
            full[col_of[f]] = I[k]
        return full

    fund_V = np.array([230.0, 220.0 * np.exp(1j * np.deg2rad(5))])
    fund_I = np.stack([inj_spectrum(np.array([v, 0, 0, 0]))
                       for v in fund_V])
    harm_V = np.array([[3.25, 6.5]] * 3) * np.exp(1j * np.deg2rad(20))
    harm_I = np.stack([
        [inj_spectrum(np.array([fund_V[0]] * 1 + [0] * 3)
                      + vm * np.eye(4)[1 + i]) for vm in harm_V[i]]
        for i in range(3)])
    ms = MeasurementSet(spectrum=spectrum, fund_V=fund_V, fund_I=fund_I,
                        harm_freqs=harm, harm_V=harm_V, harm_I=harm_I,
                        cycles=1)
    fit = fit_norton_from_measurements(ms)
    assert fit.passed
    np.testing.assert_allclose(fit.Y_c, Y_true, atol=1e-9)
    np.testing.assert_allclose(fit.I_c, I_true, atol=1e-8)
    # uncoupled recovers the diagonal for harmonics (Thunberg) — true here
    # because the synthetic coupling still injects off-diagonal currents,
    # but the diagonal quotient isolates Y[h,h]
    np.testing.assert_allclose(fit.Y_uc[1:], np.diag(Y_true)[1:], atol=1e-9)
