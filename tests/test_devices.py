"""Norton-equivalent loader + fitting tests
(import_Norton_Equivalents hcne_generalized.py:278-310;
NE_from_sim.py:86-193; example_hcne_almeida.py)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

import hpfx
from hpfx.devices import (fit_coupled_ne, fit_uncoupled_ne, ne_injection,
                          ne_selftest, read_ne_csv, resolve_ne_path)

from conftest import DATA, load_golden, make_setup


def test_loader_matches_reference_pu(config):
    """pu-converted I_N/Y_N equal what the reference loader produced."""
    g = load_golden(config)
    s, net, dev = make_setup(config)
    I_N = dev.I_N.to_numpy()
    Y_N = dev.Y_N.to_numpy()
    # golden stacks unique devices (all fixture nets share one component);
    # uncoupled goldens were saved as (H, 1) columns
    g_Y = g["NE_Y_N"][0] if s.coupled else g["NE_Y_N"][0].ravel()
    for k in range(net.n_nonlinear):
        np.testing.assert_allclose(I_N[k], g["NE_I_N"][0], atol=0)
        np.testing.assert_allclose(Y_N[k], g_Y, atol=0)


def test_case_insensitive_resolution():
    """smps/SMPS naming trap (SURVEY §2.5) resolves to the same file."""
    p1 = resolve_ne_path("SMPS", [DATA])
    p2 = resolve_ne_path("smps", [DATA])
    assert p1 == p2 and os.path.exists(p1)
    with pytest.raises(FileNotFoundError):
        resolve_ne_path("EV99", [DATA])


def test_missing_harmonics_rejected():
    s = hpfx.settings_for_hmax(5).with_(net_freq=60.0)  # 60/180/300 Hz absent
    with pytest.raises(ValueError, match="no Norton data"):
        hpfx.load_norton_equivalent(
            os.path.join(DATA, "smps_NE.csv"), s, coupled=True)


def test_raw_csv_shape():
    raw = read_ne_csv(os.path.join(DATA, "smps_NE.csv"))
    assert raw["Y_c"].shape == (50, 50)
    assert len(raw["freqs"]) == 50 and raw["freqs"][0] == 50
    assert raw["I_c"].shape == (50,)


def test_coupled_fit_roundtrip():
    """Almeida-2010 fit recovers a known coupled NE exactly from H+1
    synthetic measurements (NE_from_sim.py:138-173 / :182-193 self-test)."""
    rng = np.random.default_rng(0)
    H = 5
    Y_true = rng.normal(size=(H, H)) + 1j * rng.normal(size=(H, H))
    I_true = rng.normal(size=H) + 1j * rng.normal(size=H)
    V_mes = rng.normal(size=(H + 1, H)) + 1j * rng.normal(size=(H + 1, H))
    I_mes = np.stack([I_true - Y_true @ v for v in V_mes])
    I_fit, Y_fit = fit_coupled_ne(jnp.asarray(V_mes), jnp.asarray(I_mes))
    np.testing.assert_allclose(Y_fit.to_numpy(), Y_true, atol=1e-9)
    np.testing.assert_allclose(I_fit.to_numpy(), I_true, atol=1e-9)
    assert float(ne_selftest(I_fit, Y_fit, V_mes, I_mes)) < 1e-6


def test_coupled_fit_needs_h_plus_1():
    with pytest.raises(ValueError, match="measurements"):
        fit_coupled_ne(jnp.zeros((3, 3), jnp.complex128),
                       jnp.zeros((3, 3), jnp.complex128))


def test_uncoupled_fit_roundtrip():
    """Thunberg-1999 two-measurement fit (NE_from_sim.py:86-114)."""
    rng = np.random.default_rng(1)
    H = 7
    Y_true = rng.normal(size=H) + 1j * rng.normal(size=H)
    I_true = rng.normal(size=H) + 1j * rng.normal(size=H)
    V1 = rng.normal(size=H) + 1j * rng.normal(size=H)
    V2 = V1 + (0.3 + 0.1j)
    I1, I2 = I_true - Y_true * V1, I_true - Y_true * V2
    I_fit, Y_fit = fit_uncoupled_ne(jnp.asarray(V1), jnp.asarray(I1),
                                    jnp.asarray(V2), jnp.asarray(I2))
    np.testing.assert_allclose(Y_fit.to_numpy(), Y_true, atol=1e-10)
    np.testing.assert_allclose(I_fit.to_numpy(), I_true, atol=1e-10)


# --- Almeida 2010 paper case (example_hcne_almeida.py) ---------------------

_RAD = 2 * np.pi / 360
ALMEIDA_V = np.array([
    [1, 0, 0],
    [0.95, 0.03 * np.exp(10j * _RAD), 0.01 * np.exp(30j * _RAD)],
    [1.05 * np.exp(1j * _RAD), 0.03 * np.exp(10j * _RAD),
     0.005 * np.exp(90j * _RAD)],
    [1.10 * np.exp(3j * _RAD), 0.05 * np.exp(30j * _RAD),
     0.01 * np.exp(55j * _RAD)],
])
ALMEIDA_Y_N = np.array([
    [-0.79 - 0.981j, 6.065 + 8.387j, -38.4 - 25.34j],
    [-1.216 - 0.982j, -1.068 + 5.375j, -2.724 - 5.45j],
    [-0.649 + 0.276j, 1.858 + 2.038j, -9.886 + 0.956j],
])
ALMEIDA_I_N = np.array([
    1.165 * np.exp(-81.34j * _RAD),
    1.515 * np.exp(-135.72j * _RAD),
    0.682 * np.exp(158.49j * _RAD),
])


def test_almeida_paper_ne_roundtrip_and_fit():
    """The paper's published NE reproduces its own measurements
    (example_hcne_almeida.py:82-86 '--> they do, correct NEs'), and our fit
    from those 4 synthetic measurements recovers the published matrices."""
    I_mes = np.stack([ALMEIDA_I_N - ALMEIDA_Y_N @ v for v in ALMEIDA_V])
    assert float(ne_selftest(jnp.asarray(ALMEIDA_I_N), jnp.asarray(ALMEIDA_Y_N),
                             ALMEIDA_V, I_mes)) < 1e-12
    I_fit, Y_fit = fit_coupled_ne(jnp.asarray(ALMEIDA_V), jnp.asarray(I_mes))
    np.testing.assert_allclose(Y_fit.to_numpy(), ALMEIDA_Y_N, atol=1e-9)
    np.testing.assert_allclose(I_fit.to_numpy(), ALMEIDA_I_N, atol=1e-9)


def test_ne_injection_shapes():
    I = jnp.asarray(ALMEIDA_I_N)
    Y = jnp.asarray(ALMEIDA_Y_N)
    v = jnp.asarray(ALMEIDA_V[1])
    coupled = ne_injection(I, Y, v)
    uncoupled = ne_injection(I, jnp.diagonal(Y), v)
    np.testing.assert_allclose(
        uncoupled.to_numpy(),
        np.asarray(I) - np.diagonal(ALMEIDA_Y_N) * ALMEIDA_V[1])
    assert coupled.shape == uncoupled.shape == (3,)
