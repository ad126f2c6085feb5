"""Frequency-dependent linear-load models (hpfx/loadmodel.py) and the
Y_diag threading through hpf (hpfx/harmonic.py, hpfx/ybus.fold_ydiag)."""
import jax.numpy as jnp
import numpy as np
import pytest

import hpfx
from hpfx import cx
from hpfx.loadmodel import linear_load_admittance
from hpfx.ybus import build_ybus, fold_ydiag

from conftest import make_setup


@pytest.fixture(scope="module")
def net1c():
    return make_setup(("net1", 25, True))


def test_model_formulas():
    s, net, dev = make_setup(("net2", 5, True))
    P = np.asarray(net.bus_P)
    Q = np.asarray(net.bus_Q)
    h = np.asarray(s.harmonics, float)
    lin = (np.arange(net.n) < net.m) & (P > 0)

    yd = linear_load_admittance(net, s, model="parallel_rl", skin=0.1)
    g, b = np.asarray(yd.re), np.asarray(yd.im)
    assert np.all(g[0] == 0) and np.all(b[0] == 0)
    for i in np.flatnonzero(lin):
        np.testing.assert_allclose(g[1:, i],
                                   P[i] / (0.9 + 0.1 * h[1:]), rtol=1e-12)
        np.testing.assert_allclose(b[1:, i], -Q[i] / h[1:], rtol=1e-12)
    assert np.all(g[:, ~lin] == 0) and np.all(b[:, ~lin] == 0)

    yr = linear_load_admittance(net, s, model="resistive")
    for i in np.flatnonzero(lin):
        np.testing.assert_allclose(np.asarray(yr.re)[1:, i], P[i],
                                   rtol=1e-12)
    assert np.all(np.asarray(yr.im) == 0)

    ym = linear_load_admittance(net, s, model="motor", x_lr_ratio=0.25)
    for i in np.flatnonzero(lin):
        np.testing.assert_allclose(np.asarray(ym.im)[1:, i],
                                   -Q[i] / (h[1:] * 0.25), rtol=1e-12)

    with pytest.raises(ValueError, match="unknown load model"):
        linear_load_admittance(net, s, model="cigre2")
    with pytest.raises(ValueError, match="out of range"):
        linear_load_admittance(net, s, buses=[99])
    # explicit bus list overrides the linear-bus default
    y3 = linear_load_admittance(net, s, buses=[3])
    assert np.asarray(y3.re)[1, 3] > 0 and np.all(np.asarray(y3.re)[1, :3] == 0)


def test_fold_ydiag():
    s, net, _ = make_setup(("net2", 5, True))
    Y = build_ybus(net, s)
    yd = linear_load_admittance(net, s)
    Yf = fold_ydiag(Y, yd)
    d_re = np.asarray(Yf.re - Y.re)
    idx = np.arange(net.n)
    np.testing.assert_allclose(d_re[:, idx, idx], np.asarray(yd.re),
                               atol=1e-15)
    off = d_re.copy()
    off[:, idx, idx] = 0.0
    assert np.all(off == 0)


def test_zero_ydiag_is_bit_identical(net1c):
    s, net, dev = net1c
    zero = cx.zeros((s.n_harmonics, net.n), s.real_dtype)
    r0 = hpfx.hpf(net, dev, s)
    rz = hpfx.hpf(net, dev, s, Y_diag=zero)
    assert bool(jnp.all(rz.V_m == r0.V_m)) and bool(
        jnp.all(rz.V_a == r0.V_a))
    assert int(rz.n_iter) == int(r0.n_iter)


def test_damped_solve(net1c):
    s, net, dev = net1c
    yd = linear_load_admittance(net, s)
    r0 = hpfx.hpf(net, dev, s)
    rd = hpfx.hpf(net, dev, s, Y_diag=yd)
    assert bool(rd.converged)
    # the fundamental NR (warm start) is untouched: Y_diag's h=1 row is 0
    np.testing.assert_array_equal(np.asarray(rd.fund.V_m),
                                  np.asarray(r0.fund.V_m))
    # damping actually entered: harmonic voltages move
    assert float(jnp.abs(rd.V_m[1:] - r0.V_m[1:]).max()) > 1e-9
    # consistency with the dense-fold path (stable mismatch off there):
    # same fixed point
    rf = hpfx.hpf(net, dev, s, Y=fold_ydiag(build_ybus(net, s), yd))
    assert bool(rf.converged)
    np.testing.assert_allclose(np.asarray(rf.V_m), np.asarray(rd.V_m),
                               atol=1e-8)


def test_damping_lowers_harmonic_impedance(net1c):
    s, net, dev = net1c
    yd = linear_load_admittance(net, s)
    z0 = np.asarray(hpfx.driving_point_impedance(net, s))
    zd = np.asarray(hpfx.driving_point_impedance(
        net, s, Y=fold_ydiag(build_ybus(net, s), yd)))
    damped = np.flatnonzero(np.asarray(yd.re[1]) != 0)
    # at every damped bus, every harmonic-order |Z| is reduced
    assert np.all(zd[1:, damped] <= z0[1:, damped] * (1 + 1e-12))
    assert zd[1:, damped].sum() < z0[1:, damped].sum() * 0.999


def test_arrow_solver_with_ydiag(net1c):
    s, net, dev = net1c
    sa = s.with_(solver="arrow")
    yd = linear_load_admittance(net, s)
    rd = hpfx.hpf(net, dev, s, Y_diag=yd)
    ra = hpfx.hpf(net, dev, sa, Y_diag=yd)
    assert bool(ra.converged)
    np.testing.assert_allclose(np.asarray(ra.V_m), np.asarray(rd.V_m),
                               atol=1e-8)


@pytest.mark.parametrize("layout", ["vmap", "lanes"])
def test_damped_sweep_composition(net1c, layout):
    """damped_structures threads the load-model diagonal through
    hpf_sweep on both layouts (stable mismatch intact): each scenario
    row reproduces the single-case hpf(Y_diag=...) solve."""
    import jax.numpy as jnp
    from hpfx.solve import Scenarios, hpf_sweep

    s, net, dev = net1c
    s = s.with_(layout=layout, stable_mismatch=True)
    yd = linear_load_admittance(net, s)
    structs = hpfx.damped_structures(net, s, yd)
    scen = Scenarios(p_scale=jnp.ones((2,), s.real_dtype))
    out = hpf_sweep(net, dev, s, scen, Y=structs)
    single = hpfx.hpf(net, dev, s, Y_diag=yd)
    assert bool(np.all(out.converged)) and bool(single.converged)
    assert int(out.n_iter[0]) == int(single.n_iter)
    np.testing.assert_allclose(np.asarray(out.V_m[0]),
                               np.asarray(single.V_m), rtol=0, atol=1e-10)
