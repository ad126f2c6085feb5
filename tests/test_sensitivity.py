"""Implicit-differentiation sensitivity tests: the IFT gradient matches
central finite differences through full re-solves."""
import numpy as np

import hpfx
from hpfx.sensitivity import injection_sensitivity

from conftest import make_setup


def _solve_scaled(net, dev, s, theta):
    return hpfx.hpf(net, dev.scale(theta), s)


def test_thd_gradient_matches_finite_difference():
    cfg = ("net2", 5, True)
    s, net, dev = make_setup(cfg)
    res = _solve_scaled(net, dev, s, 1.0)
    sens = injection_sensitivity(net, dev, s, res, theta=1.0)

    eps = 1e-5
    hi = _solve_scaled(net, dev, s, 1.0 + eps)
    lo = _solve_scaled(net, dev, s, 1.0 - eps)
    thd_hi = float(np.max(np.asarray(hpfx.get_thd(hi.V_m).THD_F)))
    thd_lo = float(np.max(np.asarray(hpfx.get_thd(lo.V_m).THD_F)))
    fd = (thd_hi - thd_lo) / (2 * eps)
    got = float(sens.grad)
    np.testing.assert_allclose(got, fd, rtol=2e-4)
    # value is the THD at the solution
    np.testing.assert_allclose(
        float(sens.value),
        float(np.max(np.asarray(hpfx.get_thd(res.V_m).THD_F))), rtol=1e-10)


def test_custom_functional():
    cfg = ("net3", 5, True)
    s, net, dev = make_setup(cfg)
    res = _solve_scaled(net, dev, s, 1.0)

    def bus3_fifth_harmonic(V_m, V_a):
        return V_m[2, 3]  # |V| of h=5 at the nonlinear bus

    sens = injection_sensitivity(net, dev, s, res, functional=bus3_fifth_harmonic)
    eps = 1e-5
    hi = _solve_scaled(net, dev, s, 1.0 + eps)
    lo = _solve_scaled(net, dev, s, 1.0 - eps)
    fd = (float(hi.V_m[2, 3]) - float(lo.V_m[2, 3])) / (2 * eps)
    np.testing.assert_allclose(float(sens.grad), fd, rtol=2e-4)
    assert sens.dx.shape == (2 * s.n_harmonics * net.n - 1 - net.c,)
