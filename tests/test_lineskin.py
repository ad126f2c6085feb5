"""Frequency-dependent series line resistance (hpfx/lineskin.py) and the
Rh threading through build_ybus / the stable-mismatch line structure."""
import jax.numpy as jnp
import numpy as np
import pytest

import hpfx
from hpfx import cx
from hpfx.lineskin import line_resistance, skin_ratio, skin_structures
from hpfx.ybus import build_line_ybus, build_ybus, stable_matvec

from conftest import make_setup


@pytest.fixture(scope="module")
def net1c():
    return make_setup(("net1", 25, True))


def test_skin_ratio_formulas():
    h = np.array([1.0, 5.0, 25.0])
    np.testing.assert_allclose(skin_ratio(h, "exponent", alpha=0.5),
                               np.sqrt(h), rtol=1e-12)
    np.testing.assert_allclose(
        skin_ratio(h, "cigre_oh"),
        1.0 + 0.646 * h * h / (192.0 + 0.518 * h * h), rtol=1e-12)
    np.testing.assert_allclose(skin_ratio(h, "cigre_cable"),
                               0.187 + 0.532 * np.sqrt(h), rtol=1e-12)
    with pytest.raises(ValueError, match="unknown skin model"):
        skin_ratio(h, "litz")


def test_line_resistance_table(net1c):
    s, net, _ = net1c
    R1 = np.asarray(net.line_R)
    Rh = np.asarray(line_resistance(net, s, model="exponent", alpha=0.5))
    assert Rh.shape == (s.n_harmonics, R1.shape[0])
    # fundamental row pinned exactly
    np.testing.assert_array_equal(Rh[0], R1.astype(Rh.dtype))
    h = np.asarray(s.harmonics, float)
    np.testing.assert_allclose(Rh[1:], R1[None, :] * np.sqrt(h[1:, None]),
                               rtol=1e-6)
    # subset application: unlisted lines stay flat on every row
    Rs = np.asarray(line_resistance(net, s, model="cigre_oh", lines=[0, 2]))
    flat = np.setdiff1d(np.arange(R1.shape[0]), [0, 2])
    np.testing.assert_allclose(Rs[:, flat],
                               np.broadcast_to(R1[flat], Rs[:, flat].shape),
                               rtol=1e-7)
    assert Rs[1:, 0].min() > R1[0] * 1.0001
    with pytest.raises(ValueError, match="out of range"):
        line_resistance(net, s, lines=[999])


def test_flat_table_is_bit_identical(net1c):
    """Rh = broadcast of line_R reproduces the default build exactly, and
    the full solve through the triple is bit-identical to the plain one."""
    s, net, dev = net1c
    H, L = s.n_harmonics, len(np.asarray(net.line_R))
    flat = jnp.broadcast_to(jnp.asarray(net.line_R, s.real_dtype), (H, L))
    Y0 = build_ybus(net, s)
    Yf = build_ybus(net, s, Rh=flat)
    assert bool(jnp.all(Y0.re == Yf.re)) and bool(jnp.all(Y0.im == Yf.im))

    r0 = hpfx.hpf(net, dev, s)
    rf = hpfx.hpf(net, dev, s, Y=skin_structures(net, s, Rh=flat))
    assert bool(jnp.all(rf.V_m == r0.V_m)) and bool(
        jnp.all(rf.V_a == r0.V_a))
    assert int(rf.n_iter) == int(r0.n_iter)


def test_dense_assembly_oracle(net1c):
    """Independent complex-numpy assembly of the skin-corrected tensor."""
    s, net, _ = net1c
    s = s.with_(compat_shunt_bug=False)
    Rh = np.asarray(line_resistance(net, s, model="cigre_oh"), float)
    Y = build_ybus(net, s, Rh=Rh)

    h_arr = np.asarray(s.harmonics, float)
    f = np.asarray(net.line_from)
    t = np.asarray(net.line_to)
    X = np.asarray(net.line_X)
    G = np.asarray(net.line_G)
    B = np.asarray(net.line_B)
    tau = np.asarray(net.line_tau)
    shift = np.asarray(net.line_shift)
    Xsh = np.asarray(net.bus_Xsh)
    n = net.n
    ref = np.zeros((len(h_arr), n, n), complex)
    for k, h in enumerate(h_arr):
        for ln in range(len(f)):
            ys = 1.0 / (Rh[k, ln] + 1j * X[ln] * h)
            ysh = (G[ln] + 1j * h * B[ln]) / 2.0
            a, b = f[ln], t[ln]
            ref[k, a, b] += -ys * np.exp(1j * shift[ln]) / tau[ln]
            ref[k, b, a] += -ys * np.exp(-1j * shift[ln]) / tau[ln]
            ref[k, a, a] += (ys + ysh) / tau[ln] ** 2
            ref[k, b, b] += ys + ysh
        if h != 1.0:
            for i in range(n):
                if Xsh[i] != 0.0:
                    ref[k, i, i] += 1.0 / (1j * Xsh[i] * h)
    np.testing.assert_allclose(np.asarray(Y.re), ref.real,
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(Y.im), ref.imag,
                               rtol=1e-6, atol=1e-9)


def test_stable_matvec_consistency(net1c):
    """The skin-corrected LineYbus reproduces the dense matvec."""
    s, net, _ = net1c
    Rh = line_resistance(net, s, model="cigre_oh")
    Y = build_ybus(net, s, Rh=Rh)
    lineY = build_line_ybus(net, s, Rh=Rh)
    rng = np.random.default_rng(7)
    V_m = jnp.asarray(1.0 + 0.1 * rng.standard_normal(
        (s.n_harmonics, net.n)), s.real_dtype)
    V_a = jnp.asarray(0.3 * rng.standard_normal(
        (s.n_harmonics, net.n)), s.real_dtype)
    V = cx.polar(V_m, V_a)
    dense = cx.einsum("hij,hj->hi", Y, V)
    stab = stable_matvec(lineY, V_m, V_a)
    np.testing.assert_allclose(np.asarray(stab.re), np.asarray(dense.re),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(stab.im), np.asarray(dense.im),
                               rtol=1e-8, atol=1e-10)


def test_skin_solve(net1c):
    s, net, dev = net1c
    structs = skin_structures(net, s, model="cigre_oh")
    r0 = hpfx.hpf(net, dev, s)
    rk = hpfx.hpf(net, dev, s, Y=structs)
    assert bool(rk.converged)
    # fundamental untouched (Rh row 0 pinned)
    np.testing.assert_array_equal(np.asarray(rk.fund.V_m),
                                  np.asarray(r0.fund.V_m))
    # the correction entered: harmonic voltages move
    assert float(jnp.abs(rk.V_m[1:] - r0.V_m[1:]).max()) > 1e-9
    # arrow solver agrees with dense on the same structures
    ra = hpfx.hpf(net, dev, s.with_(solver="arrow"), Y=structs)
    assert bool(ra.converged)
    np.testing.assert_allclose(np.asarray(ra.V_m), np.asarray(rk.V_m),
                               atol=1e-8)


def test_skin_damps_resonance_peak():
    """Added series AC resistance damps a parallel resonance: an L-C
    circuit tuned near h=7 (line inductance against the pi-shunt
    capacitance) has its driving-point peak |Z| ~ (X·h)²/R cut by the
    skin model's R(h) rise, while the fundamental row is untouched."""
    from hpfx.network import PQ, SLACK
    s = hpfx.settings_for_hmax(25, coupled=False)
    X, R = 0.02, 0.001
    B = 2.0 / (X * 49.0)                      # resonance at h ~ 7
    net = hpfx.network_from_arrays(
        bus_types=(SLACK, PQ), components=("generator", "lin_load"),
        P=[0, 0.1], Q=[0, 0.05],
        line_from=[0], line_to=[1], R=[R], X=[X], B=[B], settings=s)
    z0 = np.asarray(hpfx.driving_point_impedance(net, s))[:, 1]
    Rh = line_resistance(net, s, model="exponent", alpha=0.5)
    zk = np.asarray(hpfx.driving_point_impedance(
        net, s, Y=build_ybus(net, s, Rh=Rh)))[:, 1]
    k = int(np.argmax(z0[1:])) + 1
    assert float(np.asarray(s.harmonics)[k]) == 7.0
    assert z0[k] > 10.0 * z0[0]               # a genuine resonance peak
    assert zk[k] < 0.6 * z0[k]                # R(7) = sqrt(7)·R damps it
    assert zk[0] == z0[0]                     # fundamental row pinned


@pytest.mark.parametrize("layout", ["vmap", "lanes"])
def test_skin_sweep_composition(net1c, layout):
    """skin_structures threads through hpf_sweep on both layouts: each
    scenario row reproduces the single-case solve."""
    from hpfx.solve import Scenarios, hpf_sweep

    s, net, dev = net1c
    s = s.with_(layout=layout, stable_mismatch=True)
    structs = skin_structures(net, s, model="cigre_oh")
    scen = Scenarios(p_scale=jnp.ones((2,), s.real_dtype))
    out = hpf_sweep(net, dev, s, scen, Y=structs)
    single = hpfx.hpf(net, dev, s, Y=structs)
    assert bool(np.all(out.converged)) and bool(single.converged)
    assert int(out.n_iter[0]) == int(single.n_iter)
    np.testing.assert_allclose(np.asarray(out.V_m[0]),
                               np.asarray(single.V_m), rtol=0, atol=1e-10)


def test_skin_plus_ydiag(net1c):
    """Combined conductor + load damping: the triple matches folding the
    load diagonal onto the skin-corrected dense tensor."""
    from hpfx.ybus import fold_ydiag
    s, net, dev = net1c
    s = s.with_(stable_mismatch=True)
    yd = hpfx.linear_load_admittance(net, s)
    Rh = line_resistance(net, s)
    Y3, lineY, lineY_f = skin_structures(net, s, Rh=Rh, Y_diag=yd)
    manual = fold_ydiag(build_ybus(net, s, Rh=Rh), yd)
    assert bool(jnp.all(Y3.re == manual.re))
    assert bool(jnp.all(Y3.im == manual.im))
    assert lineY is not None and lineY_f is not None
    r = hpfx.hpf(net, dev, s, Y=(Y3, lineY, lineY_f))
    assert bool(r.converged)
