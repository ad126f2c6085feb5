"""Gradient-based design optimization (hpfx/optimize.py).

The optimizer composes pieces that are each parity/oracle-gated
elsewhere (hpf: test_harmonic.py; line_sensitivity FD-oracle:
test_sensitivity.py); these tests gate the composition: the first-order
loop must actually find the minimum a brute-force parameter scan finds,
respect bounds/masks, and only ever return converged operating points.
"""
import numpy as np
import pytest

import jax.numpy as jnp

import hpfx
from hpfx.network import NONLINEAR, PQ, SLACK
from hpfx.sensitivity import LineParams


def trafo_feeder(h_max=9):
    s = hpfx.settings_for_hmax(h_max, coupled=True)
    net = hpfx.network_from_arrays(
        bus_types=(SLACK, PQ, NONLINEAR),
        components=("generator", "lin_load", "SMPS"),
        P=[0, 100, 250], Q=[0, 50, 100], X_sh=[0.005, 0, 0],
        line_from=[0, 1], line_to=[1, 2],
        R=[0.5, 1.0], X=[2.0, 4.0],
        tau=[1.05, 1.0], phase_shift=[30.0, 0.0],
        settings=s, per_unit=False)
    dev = hpfx.load_device_set(net, s)
    return s, net, dev


def max_thd_at_tau(net, dev, s, tau0):
    net_t = hpfx.apply_line_params(
        net, LineParams(z_scale=jnp.ones(net.n_lines),
                        tau=jnp.asarray([tau0, 1.0]),
                        shift_rad=net.line_shift))
    res = hpfx.hpf(net_t, dev, s)
    assert bool(res.converged), tau0
    return float(jnp.max(hpfx.get_thd(res.V_m).THD_F))


def test_tap_optimization_matches_grid_minimum():
    """One free tap: the gradient loop must land on the same minimum a
    brute-force tau scan finds (1-D global check of the whole loop)."""
    s, net, dev = trafo_feeder()
    out = hpfx.optimize_line_params(
        net, dev, s, vary=("tau",), fixed_lines=[1],
        steps=40, learning_rate=0.01)
    grid = np.linspace(0.85, 1.15, 61)
    vals = np.array([max_thd_at_tau(net, dev, s, t) for t in grid])
    assert out.value <= vals.min() + 5e-4, (out.value, vals.min())
    assert abs(float(out.params.tau[0]) - grid[vals.argmin()]) < 0.02
    # improvement over the as-loaded network and a converged optimum
    assert out.value < out.value0
    res = hpfx.hpf(out.net, dev, s)
    assert bool(res.converged)
    # cold re-solve of out.net reproduces the reported optimum to NR
    # tolerance (the loop's solves are warm-started)
    assert abs(float(jnp.max(hpfx.get_thd(res.V_m).THD_F))
               - out.value) < 1e-6


def test_interior_optimum_voltage_deviation():
    """Voltage-regulation objective (|V1| - 1)^2 on the PQ bus has an
    interior optimum in tau (the secondary voltage crosses 1.0 pu as the
    tap moves) — the loop must find it, not a bound."""
    s, net, dev = trafo_feeder()

    def regulation(V_m, V_a):
        return (V_m[0, 1] - 1.0) ** 2

    out = hpfx.optimize_line_params(
        net, dev, s, vary=("tau",), fixed_lines=[1],
        steps=50, learning_rate=0.01, functional=regulation)

    def flat_at(t):
        net_t = hpfx.apply_line_params(
            net, LineParams(z_scale=jnp.ones(2),
                            tau=jnp.asarray([t, 1.0]),
                            shift_rad=net.line_shift))
        res = hpfx.hpf(net_t, dev, s)
        assert bool(res.converged)
        return float((res.V_m[0, 1] - 1.0) ** 2)

    grid = np.linspace(0.85, 1.15, 61)
    vals = np.array([flat_at(t) for t in grid])
    t_star = grid[vals.argmin()]
    assert 0.86 < t_star < 1.14, "fixture lost its interior optimum"
    assert out.value <= vals.min() + 5e-4, (out.value, vals.min())
    assert abs(float(out.params.tau[0]) - t_star) < 0.02
    assert out.value < out.value0


def test_masks_freeze_everything_not_varied():
    s, net, dev = trafo_feeder()
    out = hpfx.optimize_line_params(
        net, dev, s, vary=("tau",), fixed_lines=[1], steps=6)
    np.testing.assert_allclose(np.asarray(out.params.z_scale), 1.0)
    np.testing.assert_allclose(np.asarray(out.params.shift_rad),
                               np.asarray(net.line_shift))
    assert float(out.params.tau[1]) == pytest.approx(1.0)  # frozen line
    assert float(out.params.tau[0]) != pytest.approx(1.05)  # free tap moved


def test_bounds_projection():
    s, net, dev = trafo_feeder()
    out = hpfx.optimize_line_params(
        net, dev, s, vary=("tau",), steps=12,
        learning_rate=0.05, bounds={"tau": (1.0, 1.02)})
    tau = np.asarray(out.params.tau)
    assert (tau >= 1.0 - 1e-12).all() and (tau <= 1.02 + 1e-12).all()


def test_reinforcement_drives_z_down():
    """Stiffening the feeder (smaller series Z) reduces distortion, so a
    free z_scale must move DOWN and the objective must improve."""
    s, net, dev = trafo_feeder()
    out = hpfx.optimize_line_params(
        net, dev, s, vary=("z_scale",), steps=15, learning_rate=0.05,
        bounds={"z_scale": (0.5, 2.0)})
    assert out.value < out.value0
    assert (np.asarray(out.params.z_scale) < 1.0).any()
    # taps untouched
    np.testing.assert_allclose(np.asarray(out.params.tau),
                               np.asarray(net.line_tau))


def test_unknown_vary_leaf_raises():
    s, net, dev = trafo_feeder()
    with pytest.raises(ValueError, match="unknown"):
        hpfx.optimize_line_params(net, dev, s, vary=("taps",), steps=1)


# ---------------------------------------------------------------------------
# Tuned-filter design loop (filter_sensitivity + optimize_filter)
# ---------------------------------------------------------------------------

def resonant_feeder(h_max=25, target_h=7):
    """slack—(R, X_L, line-charging B)—SMPS feeder whose passive parallel
    resonance sits at target_h (same construction as test_impedance.py's
    fixture, built programmatically)."""
    s = hpfx.settings_for_hmax(h_max, coupled=True)
    X = 0.1
    B = 2.0 / (X * target_h ** 2)
    net = hpfx.network_from_arrays(
        bus_types=(SLACK, NONLINEAR),
        components=("generator", "SMPS"),
        P=[0, 250], Q=[0, 100],
        line_from=[0], line_to=[1], R=[0.02], X=[X], B=[B],
        settings=s, per_unit=False)
    return s, net, hpfx.load_device_set(net, s)


def _filtered_solve(net, dev, s, h_tune, x_cap, quality=30.0):
    Yf = hpfx.install_shunt(
        hpfx.build_ybus(net, s), 1,
        hpfx.tuned_filter_admittance(s, h_tune, x_cap, quality))
    res = hpfx.hpf(net, dev, s, Y=Yf)
    assert bool(res.converged), (h_tune, x_cap)
    return res


def test_filter_sensitivity_fd_oracle():
    """IFT gradients wrt (h_tune, x_cap) match central finite differences
    of the full re-solved HPF (2e-4 relative — the FD oracle's floor is
    the NR tolerance, same as the other sensitivity oracles)."""
    from hpfx.sensitivity import FilterParams, filter_sensitivity

    s, net, dev = resonant_feeder()
    fp = FilterParams(h_tune=6.7, x_cap=0.05)
    res = _filtered_solve(net, dev, s, fp.h_tune, fp.x_cap)
    sens = filter_sensitivity(net, dev, s, res, 1, fp)

    def thd_at(h_tune, x_cap):
        r = _filtered_solve(net, dev, s, h_tune, x_cap)
        return float(jnp.max(hpfx.get_thd(r.V_m).THD_F))

    assert float(sens.value) == pytest.approx(
        thd_at(fp.h_tune, fp.x_cap), rel=1e-9)
    eps = 1e-5
    fd_h = (thd_at(fp.h_tune + eps, fp.x_cap)
            - thd_at(fp.h_tune - eps, fp.x_cap)) / (2 * eps)
    fd_c = (thd_at(fp.h_tune, fp.x_cap + eps)
            - thd_at(fp.h_tune, fp.x_cap - eps)) / (2 * eps)
    np.testing.assert_allclose(float(sens.grad.h_tune), fd_h, rtol=2e-4)
    np.testing.assert_allclose(float(sens.grad.x_cap), fd_c, rtol=2e-4)


def test_optimize_filter_beats_tune_grid():
    """The gradient loop must land in a LOCAL minimum of its own h_tune
    slice (first-order methods guarantee local optimality — the filter
    landscape here is genuinely multimodal: the start's self-created
    resonance, an h~5 basin and an h~8.6 basin), massively improve on
    the default start, and reproduce from the returned Y from cold."""
    s, net, dev = resonant_feeder()
    out = hpfx.optimize_filter(net, dev, s, bus=1, x_cap0=0.05,
                               steps=120, learning_rate=0.05)
    # the start sits on the filter's own resonance (maxTHD ~ 0.6); the
    # loop must escape it decisively
    assert out.value < 0.25 * out.value0, (out.value, out.value0)

    def thd_at(h_tune, x_cap):
        r = _filtered_solve(net, dev, s, h_tune, x_cap)
        return float(jnp.max(hpfx.get_thd(r.V_m).THD_F))

    h_star = float(np.asarray(out.params.h_tune))
    x_star = float(np.asarray(out.params.x_cap))
    local = np.linspace(h_star - 0.5, h_star + 0.5, 21)
    vals = np.array([thd_at(h, x_star) for h in local])
    # local-slice optimality: nothing in the found basin's neighborhood
    # beats the returned point by more than adam's oscillation tail
    assert out.value <= vals.min() + 2e-3, (out.value, vals.min())

    # the returned Y reproduces the reported optimum from cold
    res = hpfx.hpf(net, dev, s, Y=out.Y)
    assert bool(res.converged)
    assert float(jnp.max(hpfx.get_thd(res.V_m).THD_F)) == pytest.approx(
        out.value, abs=1e-7)


def test_optimize_filter_default_start_is_operational_resonance():
    """h_tune0 defaults to the worst OPERATIONAL resonance order (the
    device-inclusive scan — the converter's Norton admittance damps the
    passive h=7 peak, so the two scans disagree on this feeder)."""
    s, net, dev = resonant_feeder()
    out = hpfx.optimize_filter(net, dev, s, bus=1, x_cap0=0.05, steps=0)
    zop = hpfx.driving_point_impedance(net, s, devices=dev)
    _, worst_h, _ = hpfx.resonance_peaks(zop, s)
    assert float(np.asarray(out.params.h_tune)) == pytest.approx(
        float(worst_h[1]))
    zp = hpfx.driving_point_impedance(net, s)
    _, worst_hp, _ = hpfx.resonance_peaks(zp, s)
    assert int(worst_hp[1]) == 7          # fixture's passive peak
    assert int(worst_h[1]) != 7           # ... which the device damps away
    assert out.value == out.value0


def test_sweep_filter_sensitivity_matches_per_scenario_loop():
    """The vmapped sweep gradients must equal a loop of single-scenario
    filter_sensitivity calls at the matching operating points."""
    from hpfx.sensitivity import (FilterParams, ScenarioParams,
                                  filter_sensitivity,
                                  sweep_filter_sensitivity)
    from hpfx.solve import Scenarios, hpf_sweep

    s, net, dev = resonant_feeder()
    fp = FilterParams(h_tune=6.7, x_cap=0.05)
    Yf = hpfx.install_shunt(
        hpfx.build_ybus(net, s), 1,
        hpfx.tuned_filter_admittance(s, fp.h_tune, fp.x_cap, 30.0))
    B = 4
    scen = Scenarios(p_scale=jnp.asarray([0.8, 1.0, 1.1, 1.2]),
                     q_scale=jnp.asarray([1.0, 1.0, 0.9, 1.1]),
                     injection_scale=jnp.asarray([0.7, 1.0, 1.0, 1.3]))
    sweep = hpf_sweep(net, dev, s, scen, Y=Yf)
    assert bool(np.asarray(sweep.converged).all())

    sens = sweep_filter_sensitivity(net, dev, s, sweep, scen, 1, fp)
    assert sens.value.shape == (B,)
    for b in range(B):
        from hpfx.harmonic import HPFResult
        res_b = HPFResult(V_m=sweep.V_m[b], V_a=sweep.V_a[b],
                          err=sweep.err[b], n_iter=sweep.n_iter[b],
                          err_hist=sweep.err_hist[b],
                          converged=sweep.converged[b])
        sp = ScenarioParams(p_scale=scen.p_scale[b],
                            q_scale=scen.q_scale[b],
                            injection_scale=scen.injection_scale[b])
        one = filter_sensitivity(net, dev, s, res_b, 1, fp,
                                 scenario_params=sp)
        np.testing.assert_allclose(float(sens.value[b]), float(one.value),
                                   rtol=1e-12)
        np.testing.assert_allclose(float(sens.grad.h_tune[b]),
                                   float(one.grad.h_tune), rtol=1e-9)
        np.testing.assert_allclose(float(sens.grad.x_cap[b]),
                                   float(one.grad.x_cap), rtol=1e-9)


def test_optimize_filter_robust_over_scenarios():
    """Robust mode: one filter tuned against a scenario spread must
    improve the aggregate objective, return all-converged scenarios, and
    reduce='max' must report the worst scenario's objective."""
    from hpfx.solve import Scenarios, hpf_sweep

    s, net, dev = resonant_feeder()
    scen = Scenarios(p_scale=jnp.asarray([0.8, 1.0, 1.2]),
                     injection_scale=jnp.asarray([0.7, 1.0, 1.3]))
    out = hpfx.optimize_filter(net, dev, s, bus=1, x_cap0=0.05,
                               steps=40, learning_rate=0.05,
                               scenarios=scen, reduce="mean")
    assert out.value < out.value0

    # cold sweep at the returned Y reproduces the aggregate to NR noise
    sweep = hpf_sweep(net, dev, s, scen, Y=out.Y)
    assert bool(np.asarray(sweep.converged).all())
    per_scen = np.asarray(
        [float(jnp.max(hpfx.get_thd(sweep.V_m[b]).THD_F))
         for b in range(scen.batch)])
    assert abs(per_scen.mean() - out.value) < 1e-6

    out_max = hpfx.optimize_filter(net, dev, s, bus=1, x_cap0=0.05,
                                   steps=8, learning_rate=0.05,
                                   scenarios=scen, reduce="max")
    sweep_m = hpf_sweep(net, dev, s, scen, Y=out_max.Y)
    per_m = np.asarray(
        [float(jnp.max(hpfx.get_thd(sweep_m.V_m[b]).THD_F))
         for b in range(scen.batch)])
    assert abs(per_m.max() - out_max.value) < 1e-6


def _net2():
    from conftest import make_setup
    return make_setup(("net2", 25, True))


def test_filter_bank_fd_oracle():
    """(K=2)-bank gradients (filters at net2 buses 2 and 3) match central
    finite differences parameter by parameter."""
    from hpfx.sensitivity import FilterParams, filter_sensitivity

    s, net, dev = _net2()
    buses = (2, 3)
    fp = FilterParams(h_tune=jnp.asarray([24.8, 11.0]),
                      x_cap=jnp.asarray([0.1, 0.2]))

    def solve_at(fp_):
        Yf = hpfx.install_shunts(
            hpfx.build_ybus(net, s), buses,
            hpfx.tuned_filter_admittance(s, fp_.h_tune, fp_.x_cap, 30.0))
        res = hpfx.hpf(net, dev, s, Y=Yf)
        assert bool(res.converged)
        return res

    def thd_at(fp_):
        r = solve_at(fp_)
        return float(jnp.max(hpfx.get_thd(r.V_m).THD_F))

    res = solve_at(fp)
    sens = filter_sensitivity(net, dev, s, res, buses, fp)
    assert sens.grad.h_tune.shape == (2,)
    eps = 1e-5
    for leaf in ("h_tune", "x_cap"):
        for k in range(2):
            def at(delta):
                d = {f: getattr(fp, f) for f in fp._fields}
                d[leaf] = d[leaf].at[k].add(delta)
                return FilterParams(**d)
            fd = (thd_at(at(eps)) - thd_at(at(-eps))) / (2 * eps)
            got = float(getattr(sens.grad, leaf)[k])
            np.testing.assert_allclose(got, fd, rtol=2e-4,
                                       err_msg=f"{leaf}[{k}]")


def test_optimize_filter_bank_beats_single():
    """Co-optimized two-bus bank must do at least as well as the single
    filter at the worse bus (more degrees of freedom), improve on its
    start, and reproduce from the returned Y."""
    s, net, dev = _net2()
    single = hpfx.optimize_filter(net, dev, s, bus=2, x_cap0=0.05,
                                  steps=25, learning_rate=0.05)
    bank = hpfx.optimize_filter(net, dev, s, bus=[2, 3], x_cap0=0.05,
                                steps=25, learning_rate=0.05)
    assert bank.value < bank.value0
    assert bank.value <= single.value + 1e-4, (bank.value, single.value)
    assert np.asarray(bank.params.h_tune).shape == (2,)

    res = hpfx.hpf(net, dev, s, Y=bank.Y)
    assert bool(res.converged)
    assert float(jnp.max(hpfx.get_thd(res.V_m).THD_F)) == pytest.approx(
        bank.value, abs=1e-7)


def test_install_shunts_matches_sequential_single():
    s, net, dev = _net2()
    Y0 = hpfx.build_ybus(net, s)
    yf = hpfx.tuned_filter_admittance(s, jnp.asarray([7.0, 11.0]),
                                      jnp.asarray([0.1, 0.3]))
    assert yf.re.shape == (2, s.n_harmonics)
    Ya = hpfx.install_shunts(Y0, (1, 3), yf)
    Yb = hpfx.install_shunt(
        hpfx.install_shunt(Y0, 1, hpfx.tuned_filter_admittance(s, 7.0, 0.1)),
        3, hpfx.tuned_filter_admittance(s, 11.0, 0.3))
    np.testing.assert_allclose(np.asarray(Ya.re), np.asarray(Yb.re),
                               rtol=1e-15)
    np.testing.assert_allclose(np.asarray(Ya.im), np.asarray(Yb.im),
                               rtol=1e-15)
    # repeated bus accumulates (a 2-branch bank at one bus)
    Yc = hpfx.install_shunts(Y0, (1, 1), yf)
    np.testing.assert_allclose(
        np.asarray(Yc.re[:, 1, 1]),
        np.asarray(Y0.re[:, 1, 1] + yf.re[0] + yf.re[1]), rtol=1e-15)


def test_tuned_filter_admittance_broadcasts_mixed_rank():
    """Scalar h_tune + vector x_cap (and vice versa) must broadcast to a
    (K, H) bank — regression: the reshape used only h_tune's shape and
    crashed on this input."""
    s = hpfx.settings_for_hmax(9, coupled=True)
    H = s.n_harmonics
    mixed = hpfx.tuned_filter_admittance(s, 7.0, jnp.asarray([0.1, 0.3]))
    assert mixed.re.shape == (2, H)
    mixed2 = hpfx.tuned_filter_admittance(s, jnp.asarray([5.0, 7.0]), 0.1)
    assert mixed2.re.shape == (2, H)
    # rows equal the scalar-by-scalar calls
    for k, xc in enumerate([0.1, 0.3]):
        one = hpfx.tuned_filter_admittance(s, 7.0, xc)
        np.testing.assert_allclose(np.asarray(mixed.re[k]),
                                   np.asarray(one.re), rtol=1e-15)
    # _filter_Y takes the bank branch for mixed-rank params too
    from hpfx.sensitivity import FilterParams, _filter_Y
    net = resonant_feeder()[1]
    Y0 = hpfx.build_ybus(net, s)
    Yb = _filter_Y(Y0, s, (0, 1), FilterParams(7.0, jnp.asarray([0.1, 0.3])),
                   30.0)
    assert Yb.re.shape == Y0.re.shape


def test_filter_sensitivity_fd_oracle_pv_bus():
    """net3 carries a PV bus (c=2 cropping): the IFT machinery's state
    cropping must stay consistent through the filter-parameter columns
    — FD oracle on the full re-solved HPF."""
    from conftest import make_setup
    from hpfx.sensitivity import FilterParams, filter_sensitivity

    s, net, dev = make_setup(("net3", 25, True))
    bus = net.n - 1
    fp = FilterParams(h_tune=6.5, x_cap=0.08)

    def solve_at(h_tune, x_cap):
        Yf = hpfx.install_shunt(
            hpfx.build_ybus(net, s), bus,
            hpfx.tuned_filter_admittance(s, h_tune, x_cap))
        r = hpfx.hpf(net, dev, s, Y=Yf)
        assert bool(r.converged)
        return r

    def thd_at(h_tune, x_cap):
        r = solve_at(h_tune, x_cap)
        return float(jnp.max(hpfx.get_thd(r.V_m).THD_F))

    res = solve_at(fp.h_tune, fp.x_cap)
    sens = filter_sensitivity(net, dev, s, res, bus, fp)
    eps = 1e-5
    fd_h = (thd_at(fp.h_tune + eps, fp.x_cap)
            - thd_at(fp.h_tune - eps, fp.x_cap)) / (2 * eps)
    fd_c = (thd_at(fp.h_tune, fp.x_cap + eps)
            - thd_at(fp.h_tune, fp.x_cap - eps)) / (2 * eps)
    np.testing.assert_allclose(float(sens.grad.h_tune), fd_h, rtol=2e-4)
    np.testing.assert_allclose(float(sens.grad.x_cap), fd_c, rtol=2e-4)
