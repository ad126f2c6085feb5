"""Unbalanced three-phase harmonic penetration (hpfx.threephase).

Cross-module identities: a balanced case on a balanced network must
reproduce the solved coupled-frame HPF phase by phase (the linear
fixed-point identity of hpfx.impedance, now in the abc frame); with a
distinct zero-sequence network and balanced injections it must
reproduce hpf_sequence's h-mod-3 physics exactly; unbalanced cases are
gated against an independent numpy complex solve and against the
Kirchhoff residual of the assembled balance.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import hpfx
from hpfx.sequence import zero_sequence_network
from hpfx.threephase import (abc_admittance, phase_injections,
                             sequence_voltages, solve_unbalanced,
                             unbalance_factors)
from hpfx.ybus import build_ybus

from conftest import DATA


def _c(x):
    return np.asarray(x.re) + 1j * np.asarray(x.im)


def _load(net_name, h_max=13, coupled=False):
    s = hpfx.settings_for_hmax(h_max, coupled=coupled)
    net = hpfx.load_network(f"{DATA}/{net_name}_buses.csv",
                            f"{DATA}/{net_name}_lines.csv", s)
    return s, net, hpfx.load_device_set(net, s)


def test_balanced_network_kron_identity():
    """net0 = net collapses the assembly to Y1 ⊗ I3 (decoupled phases)."""
    s, net, _ = _load("net2")
    Yabc = _c(abc_admittance(net, s, net0=net))
    Y1 = _c(build_ybus(net, s))
    ref = np.einsum("hjk,pq->hjpkq", Y1, np.eye(3)).reshape(Yabc.shape)
    np.testing.assert_allclose(Yabc, ref, atol=1e-10)


def test_zero_sequence_block_structure():
    """With y0 != y1 every 3x3 block is s/m circulant: diag (y0+2y1)/3,
    off-diag (y0-y1)/3 — checked against the two sequence assemblies."""
    s, net, _ = _load("net2")
    net0 = zero_sequence_network(net, r0_scale=2.5, x0_scale=3.0)
    Yabc = _c(abc_admittance(net, s, net0=net0))
    Y1 = _c(build_ybus(net, s))
    Y0 = _c(build_ybus(net0, s))
    H, n = Y1.shape[0], Y1.shape[1]
    blocks = Yabc.reshape(H, n, 3, n, 3)
    d = (Y0 + 2 * Y1) / 3.0
    m = (Y0 - Y1) / 3.0
    for p in range(3):
        for q in range(3):
            ref = d if p == q else m
            np.testing.assert_allclose(blocks[:, :, p, :, q], ref,
                                       atol=1e-10)


@pytest.mark.parametrize("net_name", ["net1", "net2"])
def test_balanced_case_reproduces_hpf(net_name):
    """Balanced injections + balanced network + ground_slack=False: the
    abc solve equals the coupled-frame HPF harmonic voltages phase by
    phase (phases rotated ∓h·120°), to the NR tolerance — the
    fixed-point identity of hpfx.impedance in the 3n frame."""
    s, net, dev = _load(net_name)
    res3 = jax.jit(lambda: solve_unbalanced(net, dev, s, net0=net,
                                            ground_slack=False))()
    href = hpfx.hpf(net, dev, s)
    assert bool(href.converged)
    Vh = np.asarray(href.V_m) * np.exp(1j * np.asarray(href.V_a))
    V3 = _c(res3.V)
    hs = np.asarray(s.harmonics)
    # the identity holds to the NR solve's own residual (the linear
    # fixed point is exact; the nonlinear solver stops at err < thresh)
    tol = max(1e-7, 10 * float(href.err))
    for p in range(3):
        rot = np.exp(-1j * hs * 2 * np.pi / 3 * p)[:, None]
        dev_p = np.abs(V3[1:, :, p] - (Vh * rot)[1:])
        assert dev_p.max() < tol, (p, dev_p.max(), tol)
    # and the balanced case leaks nothing out of its sequence class
    u0, u2 = unbalance_factors(res3)
    assert float(np.asarray(u0)[1:].max()) < 1e-12
    assert float(np.asarray(u2)[1:].max()) < 1e-12


def test_sequence_network_parity_with_hpf_sequence():
    """Balanced injections on a y0 != y1 network: triplen orders solve on
    the zero-sequence network, others on the positive — which is exactly
    hpf_sequence's blended physics (uncoupled model: both are the same
    linear fixed point)."""
    s, net, dev = _load("net2")
    kw = dict(r0_scale=2.5, x0_scale=3.0, bus_Xg={1: 0.15})
    res3 = solve_unbalanced(net, dev, s,
                            net0=zero_sequence_network(
                                net, r0_scale=2.5, x0_scale=3.0),
                            bus_Xg={1: 0.15}, ground_slack=False)
    hseq = hpfx.hpf_sequence(net, dev, s, **kw)
    assert bool(hseq.converged)
    Vh = np.asarray(hseq.V_m) * np.exp(1j * np.asarray(hseq.V_a))
    V3 = _c(res3.V)
    dev_a = np.abs(V3[1:, :, 0] - Vh[1:])
    tol = max(1e-7, 10 * float(hseq.err))
    assert dev_a.max() < tol, (dev_a.max(), tol)


def test_unbalanced_solve_matches_numpy():
    """Random per-phase unbalance: the split-complex batched solve must
    match an independent numpy assembly of the same balance, and the
    Kirchhoff residual (Y - Y_N)V + I = 0 must vanish at device buses."""
    s, net, dev = _load("net1")
    rng = np.random.default_rng(7)
    n_nl = dev.n_devices
    mag = 1.0 + 0.3 * rng.standard_normal((n_nl, 3))
    ang = 0.2 * rng.standard_normal((n_nl, 3))
    kw = dict(net0=zero_sequence_network(net, r0_scale=2.5, x0_scale=3.0),
              bus_Xg={0: 0.1}, mag=mag, ang=ang)
    res = solve_unbalanced(net, dev, s, **kw)
    Yabc = _c(abc_admittance(net, s,
                             net0=zero_sequence_network(
                                 net, r0_scale=2.5, x0_scale=3.0),
                             bus_Xg={0: 0.1}))
    I = _c(res.I)
    H, n = len(s.harmonics), net.n
    yn = _c(dev.Y_N)                     # (n_nl, H) uncoupled
    rhs = np.zeros((H, n, 3), complex)
    buses = net.m + np.arange(n_nl)
    rhs[:, buses, :] = -np.swapaxes(I, 0, 1).swapaxes(0, 1)
    rhs = rhs.reshape(H, 3 * n)
    Yfold = Yabc.reshape(H, n, 3, n, 3).copy()
    for k, b in enumerate(buses):
        for p in range(3):
            Yfold[:, b, p, b, p] -= yn[k]
    Yfold = Yfold.reshape(H, 3 * n, 3 * n)
    ref = np.zeros((H, 3 * n), complex)
    ref[:, 3:] = np.linalg.solve(Yfold[:, 3:, 3:], rhs[:, 3:, None])[..., 0]
    got = _c(res.V).reshape(H, 3 * n)
    np.testing.assert_allclose(got, ref, atol=1e-10)
    # the unbalance genuinely excites foreign sequences
    u0, u2 = unbalance_factors(res)
    assert float(np.asarray(u0)[1:].max()) > 1e-3
    assert float(np.asarray(u2)[1:].max()) > 1e-3


def test_delta_device_injects_no_zero_sequence():
    """A delta (3-wire) device's balanced TRIPLEN injection is pure
    zero-sequence; projecting it out means those orders see no source
    at all: V_h = 0 exactly.  Non-triplen orders are untouched by the
    projection (their balanced injection has no zero-sequence part)."""
    s, net, dev = _load("net2")
    tri = np.asarray([h % 3 == 0 for h in s.harmonics])
    bal = solve_unbalanced(net, dev, s, net0=net)
    dlt = solve_unbalanced(net, dev, s, net0=net, delta=[0])
    Vb, Vd = _c(bal.V), _c(dlt.V)
    assert np.abs(Vd[tri]).max() < 1e-14          # no triplen source left
    nontri = ~tri & (np.asarray(s.harmonics) != 1)
    np.testing.assert_allclose(Vd[nontri], Vb[nontri], atol=1e-12)
    # the injections themselves: delta triplen rows vanish
    I = _c(phase_injections(dev, s, delta=[0]))
    assert np.abs(I[tri]).max() < 1e-14
    I_bal = _c(phase_injections(dev, s))
    np.testing.assert_allclose(I[nontri], I_bal[nontri], atol=1e-14)


def test_single_phase_injection_spreads_sequences():
    """Loading only phase a (mag = (1,0,0) style) splits the injection
    equally across all three sequence networks at every order — the
    textbook single-phase-source decomposition — and the zero-sequence
    part must vanish when the device is delta-connected."""
    s, net, dev = _load("net2")
    mag = np.asarray([[3.0, 0.0, 0.0]])          # one device, phase a only
    res = solve_unbalanced(net, dev, s, net0=net, mag=mag)
    v0, v1, v2 = sequence_voltages(res)
    # a phase-a-only current has equal sequence components; on the
    # balanced network (net0=net) each sequence sees the SAME impedance,
    # so the three sequence voltages coincide at every order
    m0, m1, m2 = (np.asarray(v.abs()) for v in (v0, v1, v2))
    nz = m1[1:] > 1e-12
    np.testing.assert_allclose(m0[1:][nz], m1[1:][nz], rtol=1e-8)
    np.testing.assert_allclose(m2[1:][nz], m1[1:][nz], rtol=1e-8)


def test_ground_slack_zeroes_slack_phases():
    s, net, dev = _load("net2")
    res = solve_unbalanced(net, dev, s, net0=net)
    V = _c(res.V)
    assert np.abs(V[:, 0, :]).max() == 0.0


def test_coupled_devices_use_h_diagonal():
    """Coupled NE: the fold uses the h-diagonal of Y_N (first-order
    operational picture, as in impedance_scan) — gate the plumbing by
    reproducing it with a manually diagonalized uncoupled device set."""
    import dataclasses
    s, net, dev = _load("net2", coupled=True)
    assert dev.coupled
    yn_diag = hpfx.cx.Cx(
        jnp.diagonal(dev.Y_N.re, axis1=-2, axis2=-1),
        jnp.diagonal(dev.Y_N.im, axis1=-2, axis2=-1))
    dev_u = dataclasses.replace(dev, Y_N=yn_diag, coupled=False)
    a = solve_unbalanced(net, dev, s, net0=net)
    b = solve_unbalanced(net, dev_u, s, net0=net)
    np.testing.assert_allclose(_c(a.V), _c(b.V), atol=1e-14)


def test_allocation_study_quantiles():
    """Monte-Carlo phase allocation: quantiles are ordered, the leakage
    is nonzero for spread > 0, and a zero-spread study collapses to the
    balanced case (leakage 0)."""
    s, net, dev = _load("net2")
    st = hpfx.allocation_study(net, dev, s, n_draws=32, sigma_mag=0.3,
                               sigma_ang=0.15, seed=1, q=(0.5, 0.95),
                               r0_scale=2.5, x0_scale=3.0)
    assert st.u0_q.shape == (2, len(s.harmonics), net.n)
    # p95 >= p50 everywhere
    assert bool(jnp.all(st.u0_q[1] >= st.u0_q[0] - 1e-12))
    assert bool(jnp.all(st.vmag_q[1] >= st.vmag_q[0] - 1e-12))
    assert float(jnp.max(st.u0_q[1][1:])) > 1e-3
    flat = hpfx.allocation_study(net, dev, s, n_draws=4, sigma_mag=0.0,
                                 sigma_ang=0.0, net0=net)
    assert float(jnp.max(flat.u0_q[:, 1:])) < 1e-12
    assert float(jnp.max(flat.u2_q[:, 1:])) < 1e-12


def test_line_phase_flows_numpy_oracle():
    """Per-line phase currents match an explicit numpy application of the
    blended 3x3 per-line blocks, and a blocked line carries zero
    residual current even under heavy unbalance."""
    s, net, dev = _load("net1")
    rng = np.random.default_rng(11)
    mag = 1.0 + 0.4 * rng.standard_normal((dev.n_devices, 3))
    net0 = zero_sequence_network(net, r0_scale=2.5, x0_scale=3.0)
    blocked = [2]
    res = solve_unbalanced(net, dev, s, net0=net0, blocked=blocked,
                           bus_Xg={0: 0.1}, mag=mag)
    pf = hpfx.line_phase_flows(net, s, res, net0=net0, blocked=blocked)
    # numpy oracle: y_abc = y1·(I - M0) + y0·M0 per line coefficient
    h = np.asarray(s.harmonics, float)[:, None]
    M0 = np.full((3, 3), 1.0 / 3.0)

    def ys(nn, keep=None):
        Xh = np.asarray(nn.line_X) * h
        d = np.asarray(nn.line_R) ** 2 + Xh ** 2
        y = np.asarray(nn.line_R) / d - 1j * Xh / d
        sh = np.asarray(nn.line_G) / 2.0 + 1j * h * np.asarray(nn.line_B) / 2
        if keep is not None:
            y, sh = y * keep, sh * keep
        return y, sh

    keep = np.ones(net.n_lines)
    keep[2] = 0.0
    y1, sh1 = ys(net)
    y0, sh0 = ys(net0, keep)
    tau = np.asarray(net.line_tau)
    shft = np.asarray(net.line_shift)
    V = _c(res.V)
    f, t = np.asarray(net.line_from), np.asarray(net.line_to)
    Vf, Vt = V[:, f, :], V[:, t, :]
    eye = np.eye(3)

    def blend(c1, c0):
        return (c1[..., None, None] * (eye - M0)
                + c0[..., None, None] * M0)

    c_ff = blend((y1 + sh1) / tau ** 2, (y0 + sh0) / tau ** 2)
    d_ft = blend(y1 * np.exp(1j * shft) / tau, y0 * np.exp(1j * shft) / tau)
    I_ref = (np.einsum("hlpq,hlq->hlp", c_ff, Vf)
             - np.einsum("hlpq,hlq->hlp", d_ft, Vt))
    np.testing.assert_allclose(_c(pf.I_f), I_ref, atol=1e-12)
    # blocked line: no zero-sequence path, residual identically ~0
    assert float(np.asarray(pf.residual_f)[:, 2].max()) < 1e-12
    # unbalance drives residual current somewhere else
    assert float(np.asarray(pf.residual_f).max()) > 1e-4


def test_balanced_flows_residual_only_on_triplens():
    """Balanced case: the residual (3·I0) vanishes on non-triplen orders
    and is exactly 3x the per-phase magnitude on triplens."""
    s, net, dev = _load("net2")
    net0 = zero_sequence_network(net, r0_scale=2.0, x0_scale=2.0)
    res = solve_unbalanced(net, dev, s, net0=net0)
    pf = hpfx.line_phase_flows(net, s, res, net0=net0)
    tri = np.asarray([h % 3 == 0 for h in s.harmonics])
    resid = np.asarray(pf.residual_f)
    Imag = np.abs(_c(pf.I_f))
    assert resid[~tri].max() < 1e-12
    np.testing.assert_allclose(resid[tri], 3.0 * Imag[tri, :, 0],
                               atol=1e-12)
    np.testing.assert_allclose(Imag[tri, :, 0], Imag[tri, :, 1],
                               atol=1e-12)
