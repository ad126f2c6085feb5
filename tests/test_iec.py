"""IEC 61000-3-6 summation law and apportioning (hpfx.iec)."""
import numpy as np
import jax.numpy as jnp
import pytest

import hpfx
from hpfx.iec import (aggregate_contributions, apportion_planning_level,
                      summation_alpha, summation_law)

from conftest import DATA


def test_alpha_table():
    a = summation_alpha([1, 3, 5, 7, 10, 11, 25])
    np.testing.assert_array_equal(a, [1.0, 1.0, 1.4, 1.4, 1.4, 2.0, 2.0])


def test_limits_linear_and_rms():
    m = np.asarray([[3.0, 4.0], [1.0, 1.0]])      # (K=2, H=2)
    lin = summation_law(m, alpha=1.0, axis=0)
    np.testing.assert_allclose(lin, [4.0, 5.0])
    rms = summation_law(m, alpha=2.0, axis=0)
    np.testing.assert_allclose(rms, np.sqrt([10.0, 17.0]))
    # per-order exponents: h=3 -> linear, h=11 -> RMS
    mix = summation_law(m, harmonics=[3, 11], axis=0, h_axis=1)
    np.testing.assert_allclose(mix, [4.0, np.sqrt(17.0)])


def test_monotone_in_alpha():
    """The combined magnitude decreases with alpha (linear sum is the
    worst case, RMS the random-phase floor)."""
    rng = np.random.default_rng(3)
    m = rng.uniform(0.1, 1.0, size=(5, 7))
    prev = None
    for a in (1.0, 1.2, 1.4, 2.0, 3.0):
        cur = np.asarray(summation_law(m, alpha=a, axis=0))
        if prev is not None:
            assert (cur <= prev + 1e-12).all()
        prev = cur


def test_aggregate_vs_exact_phasor_sum():
    """On a solved network: alpha=1 upper-bounds the exact phasor sum
    (triangle inequality); RMS lower-bounds the linear sum; the standard
    table sits in between order by order."""
    s = hpfx.settings_for_hmax(25, coupled=False)
    net = hpfx.load_network(f"{DATA}/net1_buses.csv",
                            f"{DATA}/net1_lines.csv", s)
    dev = hpfx.load_device_set(net, s)
    contrib = hpfx.distortion_contributions(net, dev, s)
    exact = np.abs(np.asarray(contrib.re).sum(-1)
                   + 1j * np.asarray(contrib.im).sum(-1))
    lin = np.asarray(aggregate_contributions(contrib, s.harmonics,
                                             alpha=1.0))
    rms = np.asarray(aggregate_contributions(contrib, s.harmonics,
                                             alpha=2.0))
    std = np.asarray(aggregate_contributions(contrib, s.harmonics))
    assert (exact <= lin + 1e-12).all()
    assert (rms <= lin + 1e-12).all()
    assert (rms - 1e-12 <= std).all() and (std <= lin + 1e-12).all()
    # more than one device, so the laws genuinely differ
    assert dev.n_devices > 1 and (rms < lin - 1e-9).any()


def test_apportioning_exhausts_planning_level():
    """Summing the apportioned per-customer limits back through the law
    reproduces the planning level exactly when sum(S_i) = S_t."""
    hs = [5, 7, 11, 13]
    L = np.asarray([0.06, 0.05, 0.035, 0.03])
    S = np.asarray([2.0, 1.0, 0.5, 0.25, 0.25])
    E = np.asarray(apportion_planning_level(L, S, harmonics=hs))  # (K, H)
    back = np.asarray(summation_law(E, harmonics=hs, axis=0, h_axis=1))
    np.testing.assert_allclose(back, L, rtol=1e-12)
    # a bigger customer gets a bigger share, never above the level
    assert (np.diff(E, axis=0) <= 1e-15).all()
    assert (E <= L[None, :] + 1e-15).all()


def test_scalar_alpha_apportioning():
    E = np.asarray(apportion_planning_level(0.05, [1.0, 1.0], alpha=2.0))
    np.testing.assert_allclose(E, 0.05 / np.sqrt(2.0))


def test_errors():
    with pytest.raises(ValueError):
        summation_law(np.ones((2, 3)), axis=0)
    with pytest.raises(ValueError):
        summation_law(np.ones((2, 3)), alpha=1.0, harmonics=[1, 2, 3],
                      axis=0)
    with pytest.raises(ValueError):
        summation_law(np.ones((2, 3)), harmonics=[1, 2], axis=0, h_axis=0)
    with pytest.raises(ValueError):
        apportion_planning_level(0.05, [1.0], alpha=1.0, harmonics=[5])
