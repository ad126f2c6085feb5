"""Per-line harmonic flows/losses + IEEE-519 checks (hpfx/flows.py).

The load-bearing oracle is energy balance: per harmonic, the real power
the buses inject into the network (V ∘ conj(Y·V), the same Y the solver
used) must equal the total per-line loss — line_flows reconstructs
branch currents from the branch algebra, NOT from dense Y, so agreement
gates both the reconstruction and the sign conventions.
"""
import numpy as np
import pytest

import jax.numpy as jnp

import hpfx
from conftest import make_setup
from hpfx.network import NONLINEAR, PQ, SLACK


def _solved(net_name="net2", h_max=25):
    s, net, dev = make_setup((net_name, h_max, True))
    res = hpfx.hpf(net, dev, s)
    assert bool(res.converged)
    return s, net, dev, res


def _bus_injections(net, s, V_m, V_a):
    """Per-harmonic real power injected at the buses: Re(V ∘ conj(YV))."""
    Y = hpfx.build_ybus(net, s)
    V = np.asarray(V_m) * np.exp(1j * np.asarray(V_a))
    Yc = np.asarray(Y.re) + 1j * np.asarray(Y.im)
    I = np.einsum("hij,hj->hi", Yc, V)
    return (V * I.conj()).real                     # (H, n)


@pytest.mark.parametrize("net_name", ["net2", "net3", "net1"])
def test_energy_balance_per_harmonic(net_name):
    s, net, dev, res = _solved(net_name)
    fl = hpfx.line_flows(net, s, res.V_m, res.V_a)
    inj = _bus_injections(net, s, res.V_m, res.V_a).sum(axis=1)  # (H,)
    line_loss = np.asarray(fl.loss).sum(axis=1)                  # (H,)
    # bus-shunt Xsh is lossless; everything real must land on the lines
    np.testing.assert_allclose(inj, line_loss, rtol=1e-9, atol=1e-12)
    assert float(fl.total_loss) == pytest.approx(inj.sum(), rel=1e-9)


def test_losses_positive_and_terminal_currents_balance():
    s, net, dev, res = _solved("net2")
    fl = hpfx.line_flows(net, s, res.V_m, res.V_a)
    # passive branches: per-line per-harmonic loss >= 0
    assert (np.asarray(fl.loss) >= -1e-15).all()
    # with no pi shunt and no tap, I_f = -I_t exactly; net2's lines have
    # B=0, G=0, tau=1 (check the data premise first)
    assert float(np.abs(np.asarray(net.line_B)).max()) == 0.0
    assert float(np.abs(np.asarray(net.line_G)).max()) == 0.0
    np.testing.assert_allclose(np.asarray(fl.I_f.re),
                               -np.asarray(fl.I_t.re), atol=1e-12)
    np.testing.assert_allclose(np.asarray(fl.I_f.im),
                               -np.asarray(fl.I_t.im), atol=1e-12)


def test_trafo_branch_flow_conservation():
    """Tap/shift branch: energy balance must hold through the ideal
    transformer (lossless tap: P_f + P_t = series-R loss only)."""
    s = hpfx.settings_for_hmax(9, coupled=True)
    net = hpfx.network_from_arrays(
        bus_types=(SLACK, PQ, NONLINEAR),
        components=("generator", "lin_load", "SMPS"),
        P=[0, 100, 250], Q=[0, 50, 100], X_sh=[0.005, 0, 0],
        line_from=[0, 1], line_to=[1, 2],
        R=[0.5, 1.0], X=[2.0, 4.0],
        tau=[1.05, 1.0], phase_shift=[30.0, 0.0],
        settings=s, per_unit=False)
    dev = hpfx.load_device_set(net, s)
    res = hpfx.hpf(net, dev, s)
    assert bool(res.converged)
    fl = hpfx.line_flows(net, s, res.V_m, res.V_a)
    inj = _bus_injections(net, s, res.V_m, res.V_a).sum(axis=1)
    np.testing.assert_allclose(inj, np.asarray(fl.loss).sum(axis=1),
                               rtol=1e-9, atol=1e-12)
    # the loss the flow decomposition reports per line is R|I_series|^2
    # (series current = current into the to-side here, B=G=0)
    r_i2 = np.asarray(net.line_R) * np.asarray(fl.I_t.abs2())
    np.testing.assert_allclose(np.asarray(fl.loss), r_i2,
                               rtol=1e-9, atol=1e-12)


def test_ieee519_classes_and_compliance():
    s, net, dev, res = _solved("net2")
    rep = hpfx.check_ieee519(res, s)              # 400 V -> <=1 kV class
    assert rep.limit_individual == 5.0 and rep.limit_thd == 8.0
    # net2's solved distortion is huge (maxTHD ~ 0.59): must flag
    assert not bool(np.asarray(rep.compliant).all())
    # slack bus is stiff and clean here
    assert bool(np.asarray(rep.compliant)[0])
    # ratio/worst bookkeeping is self-consistent
    thd_direct = 100 * np.asarray(hpfx.get_thd(res.V_m).THD_F)
    np.testing.assert_allclose(np.asarray(rep.thd), thd_direct, rtol=1e-12)
    k = int(np.argmax(np.asarray(rep.ratio)[:, 3]))
    assert int(rep.worst_order[3]) == s.harmonics[1:][k]
    # higher voltage class applies tighter limits
    rep69 = hpfx.check_ieee519(res, s, v_kv=30.0)
    assert rep69.limit_individual == 3.0 and rep69.limit_thd == 5.0
    rep500 = hpfx.check_ieee519(res, s, v_kv=500.0)
    assert rep500.limit_individual == 1.0 and rep500.limit_thd == 1.5
    # compliance is monotone in the class limits
    assert int(np.asarray(rep.compliant).sum()) >= \
        int(np.asarray(rep500.compliant).sum())


def test_filtered_network_flow_accounting():
    """End-to-end story the flows module exists to surface: the tuned
    filter cuts THD, but it does so by DIVERTING harmonic current
    through the feeder into itself — harmonic line losses go UP
    (measured ~3.4x here), a tradeoff invisible from bus THD alone.
    The energy-balance oracle must hold on the modified network too
    (bus injections computed with the filtered Y)."""
    s, net, dev, res = _solved("net2")
    fl0 = hpfx.line_flows(net, s, res.V_m, res.V_a)
    out = hpfx.optimize_filter(net, dev, s, bus=2, x_cap0=0.05, steps=8)
    res_f = hpfx.hpf(net, dev, s, Y=out.Y)
    assert bool(res_f.converged)
    assert out.value < float(
        np.max(np.asarray(hpfx.get_thd(res.V_m).THD_F)))  # THD improved
    fl1 = hpfx.line_flows(net, s, res_f.V_m, res_f.V_a)
    harm0 = float(np.asarray(fl0.loss)[1:].sum())
    harm1 = float(np.asarray(fl1.loss)[1:].sum())
    assert harm1 > harm0, (harm1, harm0)   # the diversion cost is real

    # balance on the filtered network: bus injections (filtered Y) =
    # line losses + power into the filter branch (= its own real draw)
    V = np.asarray(res_f.V_m) * np.exp(1j * np.asarray(res_f.V_a))
    Yc = np.asarray(out.Y.re) + 1j * np.asarray(out.Y.im)
    inj = (V * np.einsum("hij,hj->hi", Yc, V).conj()).real.sum(axis=1)
    yf = hpfx.tuned_filter_admittance(
        s, float(out.params.h_tune), float(out.params.x_cap))
    yfc = np.asarray(yf.re) + 1j * np.asarray(yf.im)
    p_filter = (np.abs(V[:, 2]) ** 2 * yfc.conj()).real
    np.testing.assert_allclose(
        inj, np.asarray(fl1.loss).sum(axis=1) + p_filter,
        rtol=1e-9, atol=1e-12)


def test_ieee519_screen_matches_per_scenario_loop():
    """The vmapped sweep screen must agree with check_ieee519 applied
    scenario by scenario, and its violation fraction must count only
    converged scenarios."""
    from hpfx.solve import Scenarios, hpf_sweep

    s, net, dev = make_setup(("net2", 25, True))
    # injection spread straddling the compliance knee (measured: net2
    # crosses the <=1 kV limits between injection 0.01 and 0.02)
    scen = Scenarios(p_scale=jnp.ones(8),
                     injection_scale=jnp.asarray(
                         [1e-4, 1e-3, 5e-3, 0.01, 0.02, 0.05, 0.5, 1.5]))
    sweep = hpf_sweep(net, dev, s, scen)
    assert bool(np.asarray(sweep.converged).all())

    summ = hpfx.ieee519_screen(sweep, s)
    assert summ.compliant.shape == (8,)
    from hpfx.harmonic import HPFResult
    for b in range(8):
        rb = HPFResult(V_m=sweep.V_m[b], V_a=sweep.V_a[b],
                       err=sweep.err[b], n_iter=sweep.n_iter[b],
                       err_hist=sweep.err_hist[b],
                       converged=sweep.converged[b])
        rep = hpfx.check_ieee519(rb, s)
        assert bool(summ.compliant[b]) == bool(
            np.asarray(rep.compliant).all())
        np.testing.assert_allclose(float(summ.thd[b]),
                                   float(np.max(np.asarray(rep.thd))),
                                   rtol=1e-12)
    # low injections comply, high ones do not (the screen discriminates)
    ok = np.asarray(summ.compliant)
    assert ok[0] and not ok[-1]
    assert float(summ.frac_violating) == pytest.approx((~ok).mean())


def test_k_factor_analytic_cases():
    """K=1 for pure fundamental; analytic two-harmonic case; batched
    shapes pass through."""
    harms = (1, 3, 5)
    I = jnp.asarray([1.0, 0.0, 0.0])
    np.testing.assert_allclose(float(hpfx.k_factor(I, harms)), 1.0)
    # I1=1, I3=0.5: K = (1*1 + 0.25*9)/(1 + 0.25) = 3.25/1.25 = 2.6
    I = jnp.asarray([1.0, 0.5, 0.0])
    np.testing.assert_allclose(float(hpfx.k_factor(I, harms)), 2.6,
                               rtol=1e-12)
    # batched (H, L): per-column results
    I2 = jnp.stack([jnp.asarray([1.0, 0.0, 0.0]),
                    jnp.asarray([1.0, 0.5, 0.0])], axis=1)
    np.testing.assert_allclose(np.asarray(hpfx.k_factor(I2, harms)),
                               [1.0, 2.6], rtol=1e-12)


def test_k_factor_on_solved_feeder_exceeds_one():
    s, net, dev, res = _solved("net2")
    fl = hpfx.line_flows(net, s, res.V_m, res.V_a)
    K = np.asarray(hpfx.k_factor(fl.I_f.abs(), s.harmonics))
    assert K.shape == (net.n_lines,)
    assert (K > 1.0).all()          # distorted currents on every line


def test_ieee519_current_limits_and_classes():
    harms = (1, 3, 5, 7, 11, 13, 17, 25, 35, 49)
    I = np.zeros(len(harms)); I[0] = 1.0
    rep = hpfx.check_ieee519_current(jnp.asarray(I), harms, 15.0)
    assert bool(rep.compliant) and float(rep.tdd) == 0.0
    assert rep.limit_tdd == 5.0                   # Isc/IL < 20 class
    # odd-range limits land correctly per order
    lim = dict(zip(rep.harmonics, np.asarray(rep.limits)))
    assert lim[3] == 4.0 and lim[5] == 4.0 and lim[7] == 4.0
    assert lim[11] == 2.0 and lim[13] == 2.0
    assert lim[17] == 1.5 and lim[25] == 0.6
    assert lim[35] == 0.3 and lim[49] == 0.3
    # a 5% 5th harmonic violates the <20 class but passes the <100 class
    I[2] = 0.05
    bad = hpfx.check_ieee519_current(jnp.asarray(I), harms, 15.0)
    ok = hpfx.check_ieee519_current(jnp.asarray(I), harms, 80.0)
    assert not bool(bad.compliant) and bool(ok.compliant)
    # even harmonics carry 25% of the range limit
    harms_e = (1, 2, 4)
    repe = hpfx.check_ieee519_current(
        jnp.asarray([1.0, 0.0, 0.0]), harms_e, 15.0)
    np.testing.assert_allclose(np.asarray(repe.limits), [1.0, 1.0])


def test_ieee519_current_on_solved_feeder():
    """The slack feeder current of net2 at full distortion must violate
    Table 2 at a stiff PCC; the same current normalized against a much
    larger demand current passes (TDD is demand-relative)."""
    s, net, dev, res = _solved("net2")
    fl = hpfx.line_flows(net, s, res.V_m, res.V_a)
    I_slack = fl.I_f.abs()[:, 0]                  # line 0 leaves bus 0
    rep = hpfx.check_ieee519_current(I_slack, s.harmonics, 15.0)
    assert not bool(rep.compliant)
    big_load = 100.0 * float(I_slack[0])
    rep2 = hpfx.check_ieee519_current(I_slack, s.harmonics, 15.0,
                                      i_load=big_load)
    assert bool(rep2.compliant)


def test_en50160_limit_vector():
    hs = (1, 2, 3, 5, 9, 25, 27, 49)
    lim = np.asarray(hpfx.flows.en50160_limit_vector(hs))
    np.testing.assert_allclose(
        lim, [2.0, 5.0, 6.0, 1.5, 1.5, np.inf, np.inf])
    # every tabulated order: evens 0.5-2, triplens tighter than 5th/7th
    T = hpfx.flows.EN50160_LIMITS
    assert T[5] == 6.0 and T[7] == 5.0 and T[3] == 5.0
    assert all(T[h] <= 2.0 for h in range(2, 25, 2))
    assert T[15] == 0.5 and T[21] == 0.5


def test_en50160_check_per_order_binding():
    s, net, dev, res = _solved("net2")
    rep = hpfx.check_en50160(res, s)
    # hand-checked bookkeeping against the raw distortion ratios
    ratio = 100 * np.asarray(res.V_m[1:]) / np.asarray(res.V_m[0])
    np.testing.assert_allclose(np.asarray(rep.ratio), ratio, rtol=1e-12)
    lim = np.asarray(hpfx.flows.en50160_limit_vector(s.harmonics))
    np.testing.assert_allclose(np.asarray(rep.margin),
                               lim[:, None] - ratio, rtol=1e-10)
    # compliance = all tabulated margins >= 0 and THD <= 8 %
    tab = np.isfinite(lim)
    thd = 100 * np.asarray(hpfx.get_thd(res.V_m).THD_F)
    expect = np.all(lim[tab, None] - ratio[tab] >= 0, axis=0) & (thd <= 8.0)
    np.testing.assert_array_equal(np.asarray(rep.compliant), expect)
    # net2's solved distortion violates; the stiff slack passes
    assert not bool(np.asarray(rep.compliant).all())
    assert bool(np.asarray(rep.compliant)[0])
    # worst_order picks the min-margin tabulated order
    m = lim[:, None] - ratio
    m[~tab] = np.inf
    k = int(np.argmin(m[:, 3]))
    assert int(rep.worst_order[3]) == s.harmonics[1:][k]
    # EN 50160 binds per order: an IEEE-flat 5 % check and the EN check
    # can disagree (e.g. a 1 % 15th violates EN, passes IEEE <=1 kV)
    assert np.isfinite(np.asarray(rep.limits)[np.asarray(
        s.harmonics[1:]) <= 25].max())


def test_en50160_screen_matches_per_scenario():
    from hpfx.harmonic import HPFResult
    from hpfx.solve import Scenarios, hpf_sweep

    s, net, dev = make_setup(("net2", 25, True))
    scen = Scenarios(p_scale=jnp.ones(4),
                     injection_scale=jnp.asarray([1e-4, 5e-3, 0.05, 1.0]))
    sweep = hpf_sweep(net, dev, s, scen)
    assert bool(np.asarray(sweep.converged).all())
    summ = hpfx.en50160_screen(sweep, s)
    for b in range(4):
        rb = HPFResult(V_m=sweep.V_m[b], V_a=sweep.V_a[b],
                       err=sweep.err[b], n_iter=sweep.n_iter[b],
                       err_hist=sweep.err_hist[b],
                       converged=sweep.converged[b])
        rep = hpfx.check_en50160(rb, s)
        assert bool(summ.compliant[b]) == bool(
            np.asarray(rep.compliant).all())
    ok = np.asarray(summ.compliant)
    assert ok[0] and not ok[-1]
    assert float(summ.frac_violating) == pytest.approx((~ok).mean())


def test_power_indices_analytic():
    """IEEE 1459 decomposition vs a hand-computed complex-arithmetic
    oracle, plus the exact identity S^2 = S1^2 + D_I^2 + D_V^2 + S_H^2."""
    from hpfx.cx import Cx

    Vc = np.array([1.0 * np.exp(0j),
                   0.08 * np.exp(1j * np.deg2rad(30.0)),
                   0.03 * np.exp(1j * np.deg2rad(-75.0))])
    Ic = np.array([2.0 * np.exp(-1j * np.deg2rad(25.0)),
                   0.6 * np.exp(1j * np.deg2rad(100.0)),
                   0.25 * np.exp(1j * np.deg2rad(10.0))])
    pi = hpfx.power_indices(Cx(jnp.asarray(Vc.real), jnp.asarray(Vc.imag)),
                            Cx(jnp.asarray(Ic.real), jnp.asarray(Ic.imag)))

    s_h = Vc * Ic.conj()
    P = s_h.real.sum()
    V1, I1 = abs(Vc[0]), abs(Ic[0])
    V_H = np.sqrt((np.abs(Vc[1:]) ** 2).sum())
    I_H = np.sqrt((np.abs(Ic[1:]) ** 2).sum())
    S = np.sqrt((np.abs(Vc) ** 2).sum() * (np.abs(Ic) ** 2).sum())

    assert float(pi.P) == pytest.approx(P, rel=1e-12)
    assert float(pi.P1) == pytest.approx(s_h.real[0], rel=1e-12)
    assert float(pi.P_H) == pytest.approx(s_h.real[1:].sum(), rel=1e-12)
    assert float(pi.Q1) == pytest.approx(s_h.imag[0], rel=1e-12)
    assert float(pi.S) == pytest.approx(S, rel=1e-12)
    assert float(pi.S1) == pytest.approx(V1 * I1, rel=1e-12)
    assert float(pi.S_H) == pytest.approx(V_H * I_H, rel=1e-12)
    assert float(pi.D_I) == pytest.approx(V1 * I_H, rel=1e-12)
    assert float(pi.D_V) == pytest.approx(V_H * I1, rel=1e-12)
    assert float(pi.N) == pytest.approx(np.sqrt(S * S - P * P), rel=1e-12)
    assert float(pi.pf) == pytest.approx(P / S, rel=1e-12)
    assert float(pi.dpf) == pytest.approx(
        s_h.real[0] / (V1 * I1), rel=1e-12)
    assert float(pi.thd_v) == pytest.approx(V_H / V1, rel=1e-12)
    assert float(pi.thd_i) == pytest.approx(I_H / I1, rel=1e-12)

    # the exact apparent-power resolution (IEEE 1459 eq. for S^2)
    lhs = float(pi.S) ** 2
    rhs = (float(pi.S1) ** 2 + float(pi.D_I) ** 2
           + float(pi.D_V) ** 2 + float(pi.S_H) ** 2)
    assert lhs == pytest.approx(rhs, rel=1e-12)
    # under distortion the true pf is strictly below the displacement pf
    assert float(pi.pf) < float(pi.dpf)

    # fundamental-only input collapses: N = |Q1|, pf = dpf, zero D terms
    z = np.zeros(2, complex)
    pi1 = hpfx.power_indices(
        Cx(jnp.asarray(np.r_[Vc[:1], z].real),
           jnp.asarray(np.r_[Vc[:1], z].imag)),
        Cx(jnp.asarray(np.r_[Ic[:1], z].real),
           jnp.asarray(np.r_[Ic[:1], z].imag)))
    assert float(pi1.N) == pytest.approx(abs(s_h.imag[0]), rel=1e-12)
    assert float(pi1.pf) == pytest.approx(float(pi1.dpf), rel=1e-12)
    assert float(pi1.S_H) == 0.0 and float(pi1.D_I) == 0.0
    assert float(pi1.thd_i) == 0.0 and float(pi1.P_H) == 0.0


def test_line_power_indices_on_solved_network():
    """Metering-point view of a solved net2 state: terminal powers must
    match line_flows, the S^2 identity must hold per line, and the
    feeder sees pf < dpf under the solved distortion."""
    s, net, dev, res = _solved("net2")
    fl = hpfx.line_flows(net, s, res.V_m, res.V_a)
    pf_idx = hpfx.line_power_indices(net, s, res.V_m, res.V_a, side="from")
    pt_idx = hpfx.line_power_indices(net, s, res.V_m, res.V_a, side="to")

    # total active power at each terminal = sum over harmonics of P_f/P_t
    np.testing.assert_allclose(np.asarray(pf_idx.P),
                               np.asarray(fl.P_f).sum(axis=0),
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(pt_idx.P),
                               np.asarray(fl.P_t).sum(axis=0),
                               rtol=1e-12, atol=1e-15)
    # both-terminals active power = per-line loss (all harmonics)
    np.testing.assert_allclose(
        np.asarray(pf_idx.P) + np.asarray(pt_idx.P),
        np.asarray(fl.loss).sum(axis=0), rtol=1e-9, atol=1e-15)
    # fundamental quantities match the h=1 row of the flow decomposition
    np.testing.assert_allclose(np.asarray(pf_idx.P1), np.asarray(fl.P_f)[0],
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(pf_idx.Q1), np.asarray(fl.Q_f)[0],
                               rtol=1e-12, atol=1e-15)
    # S^2 resolution holds on every line
    lhs = np.asarray(pf_idx.S) ** 2
    rhs = (np.asarray(pf_idx.S1) ** 2 + np.asarray(pf_idx.D_I) ** 2
           + np.asarray(pf_idx.D_V) ** 2 + np.asarray(pf_idx.S_H) ** 2)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)
    # thd_v at the from-terminal equals the bus THD_F of the solved state
    thd = np.asarray(hpfx.get_thd(res.V_m).THD_F)
    np.testing.assert_allclose(np.asarray(pf_idx.thd_v),
                               thd[np.asarray(net.line_from)], rtol=1e-12)
    # distortion strictly inflates apparent power wherever harmonic
    # current actually flows (lines here carry reverse flow, so compare
    # S against S1 and the factors in magnitude, not signed pf < dpf)
    distorted = np.asarray(pf_idx.thd_i) > 1e-3
    assert distorted.any()
    assert (np.asarray(pf_idx.S)[distorted]
            > np.asarray(pf_idx.S1)[distorted]).all()
    assert (np.abs(np.asarray(pf_idx.P) / np.asarray(pf_idx.S))[distorted]
            <= np.abs(np.asarray(pf_idx.P)
                      / np.asarray(pf_idx.S1))[distorted]).all()

    with pytest.raises(ValueError):
        hpfx.line_power_indices(net, s, res.V_m, res.V_a, side="mid")


def test_waveform_metrics_analytic():
    """Crest/form/rms against closed-form sine + flat-top/peaked cases."""
    import jax

    hs = (1, 3)
    # pure sine: crest = sqrt(2), form = pi/(2 sqrt(2)), rms = V1
    V_m = jnp.asarray([[0.97], [0.0]])
    V_a = jnp.zeros((2, 1))
    wm = hpfx.waveform_metrics(V_m, V_a, hs)
    assert float(wm.rms[0]) == pytest.approx(0.97, rel=1e-12)
    assert float(wm.crest[0]) == pytest.approx(np.sqrt(2), rel=1e-5)
    assert float(wm.form[0]) == pytest.approx(np.pi / (2 * np.sqrt(2)),
                                              rel=1e-4)
    # 3rd in antiphase at the peak flattens the top (crest < sqrt2);
    # in phase it peaks the wave (crest > sqrt2)
    flat = hpfx.waveform_metrics(jnp.asarray([[1.0], [0.1]]),
                                 jnp.asarray([[0.0], [np.pi]]), hs)
    peaky = hpfx.waveform_metrics(jnp.asarray([[1.0], [0.1]]),
                                  jnp.asarray([[0.0], [0.0]]), hs)
    assert float(flat.crest[0]) < np.sqrt(2) < float(peaky.crest[0])
    # Parseval rms
    assert float(flat.rms[0]) == pytest.approx(np.hypot(1.0, 0.1),
                                               rel=1e-12)
    # dense numpy oracle for the peak
    th = np.linspace(0, 2 * np.pi, 1 << 16, endpoint=False)
    v = np.sqrt(2) * (np.cos(th) + 0.1 * np.cos(3 * th))
    assert float(peaky.peak[0]) == pytest.approx(np.abs(v).max(), rel=1e-6)
    # jit-safety (batched)
    f = jax.jit(lambda m, a: hpfx.waveform_metrics(m, a, hs))
    out = f(jnp.ones((2, 5)), jnp.zeros((2, 5)))
    assert out.crest.shape == (5,)


def test_waveform_on_solved_network():
    s, net, dev, res = _solved("net2")
    theta, v = hpfx.waveform(res.V_m, res.V_a, s.harmonics, 512)
    assert v.shape == (512, net.n)
    wm = hpfx.waveform_metrics(res.V_m, res.V_a, s.harmonics)
    # distorted buses deviate from the clean-sine crest; slack stays clean
    assert abs(float(wm.crest[0]) - np.sqrt(2)) < 1e-3
    assert np.abs(np.asarray(wm.crest[2:]) - np.sqrt(2)).min() > 0.01
    # true rms >= fundamental rms everywhere
    assert (np.asarray(wm.rms) >= np.asarray(res.V_m[0]) - 1e-12).all()
