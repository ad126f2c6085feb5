"""Fundamental NR parity against reference fixtures
(pf, hcne_generalized.py:244-275)."""
import jax
import numpy as np

import hpfx
from hpfx.cx import Cx

from conftest import load_golden, make_setup


def test_fundamental_parity(config):
    g = load_golden(config)
    s, net, _ = make_setup(config)
    Y = hpfx.build_ybus(net, s)
    res = hpfx.pf(Y, net, s)
    assert int(res.n_iter) == int(g["n_iter_f"])
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.V_m), g["V_fund_m"],
                               rtol=0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(res.V_a), g["V_fund_a"],
                               rtol=0, atol=1e-10)
    # final entries are ~1e-9 residuals where LU implementation noise shows;
    # compare with a matching absolute floor
    hist = np.asarray(res.err_hist)[: int(res.n_iter)]
    np.testing.assert_allclose(hist, g["err_f_t"], rtol=1e-4, atol=1e-12)


def test_fund_jacobian_matches_autodiff():
    """The hand-coded Jacobian equals jacfwd of the mismatch — a check the
    reference never had (SURVEY §7.1)."""
    cfg = ("net3", 5, False)  # net3 exercises the PV-bus c=2 cropping
    s, net, _ = make_setup(cfg)
    Y = hpfx.build_ybus(net, s)
    res = hpfx.pf(Y, net, s)
    n, c = net.n, net.c
    S = Cx(net.bus_P, net.bus_Q)
    V_m0, V_a0 = np.asarray(res.V_m), np.asarray(res.V_a)

    from hpfx.fundamental import fund_jacobian, fund_mismatch

    def f_of_x(x):
        V_a = res.V_a.at[1:].set(x[: n - 1])
        V_m = res.V_m.at[c:].set(x[n - 1:])
        return fund_mismatch(V_m, V_a, Y[0], S, c)[0]

    x = np.concatenate([V_a0[1:], V_m0[c:]])
    J_ad = np.asarray(jax.jacfwd(f_of_x)(x))
    J_hand = np.asarray(fund_jacobian(res.V_m, res.V_a, Y[0], n, c))
    np.testing.assert_allclose(J_hand, J_ad, atol=1e-12)


def test_jit_and_second_call_cache():
    cfg = ("net2", 5, False)
    s, net, _ = make_setup(cfg)
    Y = hpfx.build_ybus(net, s)
    jpf = jax.jit(hpfx.pf, static_argnames=("settings",))
    r1 = jpf(Y, net, settings=s)
    r2 = jpf(Y, net, settings=s)
    np.testing.assert_array_equal(np.asarray(r1.V_m), np.asarray(r2.V_m))
