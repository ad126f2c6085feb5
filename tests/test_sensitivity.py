"""Implicit-differentiation sensitivity tests: the IFT gradient matches
central finite differences through full re-solves."""
import dataclasses

import jax.numpy as jnp
import numpy as np

import hpfx
from hpfx.sensitivity import (ScenarioParams, injection_sensitivity,
                              scenario_sensitivity)

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


def _solve_params(net, dev, s, p, q, inj):
    net_s = dataclasses.replace(
        net, bus_P=net.bus_P * jnp.asarray(p, s.real_dtype),
        bus_Q=net.bus_Q * jnp.asarray(q, s.real_dtype))
    return hpfx.hpf(net_s, dev.scale(jnp.asarray(inj, s.real_dtype)), s)


def test_scenario_params_gradients_match_fd():
    """Joint (p_scale, q_scale, per-device injection) gradients of worst
    THD_F vs central finite differences through full re-solves."""
    cfg = ("net2", 5, True)
    s, net, dev = make_setup(cfg)
    inj0 = np.array([1.0])                  # net2: one device
    res = _solve_params(net, dev, s, 1.0, 1.0, inj0)
    sens = scenario_sensitivity(
        net, dev, s, res,
        params=ScenarioParams(1.0, 1.0, jnp.asarray(inj0)))

    def thd(r):
        return float(np.max(np.asarray(hpfx.get_thd(r.V_m).THD_F)))

    eps = 1e-5
    fd_p = (thd(_solve_params(net, dev, s, 1 + eps, 1.0, inj0))
            - thd(_solve_params(net, dev, s, 1 - eps, 1.0, inj0))) / (2 * eps)
    fd_q = (thd(_solve_params(net, dev, s, 1.0, 1 + eps, inj0))
            - thd(_solve_params(net, dev, s, 1.0, 1 - eps, inj0))) / (2 * eps)
    fd_i = (thd(_solve_params(net, dev, s, 1.0, 1.0, inj0 + eps))
            - thd(_solve_params(net, dev, s, 1.0, 1.0, inj0 - eps))) / (2 * eps)
    np.testing.assert_allclose(float(sens.grad.p_scale), fd_p, rtol=5e-4)
    np.testing.assert_allclose(float(sens.grad.q_scale), fd_q, rtol=5e-4)
    np.testing.assert_allclose(float(sens.grad.injection_scale[0]), fd_i,
                               rtol=5e-4)


def test_per_device_gradients_arrow_matches_dense_net1():
    """Per-device injection gradients on net1 (7 devices, H<=25, dim 518):
    the arrow-solver column solves equal the dense-LU ones, and the
    per-device components match finite differences."""
    cfg = ("net1", 25, True)
    s, net, dev = make_setup(cfg)
    n_nl = net.n_nonlinear
    inj0 = np.ones(n_nl)
    res = _solve_params(net, dev, s, 1.0, 1.0, inj0)
    params = ScenarioParams(1.0, 1.0, jnp.asarray(inj0))
    sens_d = scenario_sensitivity(net, dev, s, res, params=params)
    sens_a = scenario_sensitivity(net, dev, s.with_(solver="arrow"), res,
                                  params=params)
    np.testing.assert_allclose(np.asarray(sens_a.grad.injection_scale),
                               np.asarray(sens_d.grad.injection_scale),
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(float(sens_a.grad.p_scale),
                               float(sens_d.grad.p_scale), rtol=1e-8)

    def thd(r):
        return float(np.max(np.asarray(hpfx.get_thd(r.V_m).THD_F)))

    # spot-check two devices against FD
    eps = 1e-5
    for d in (0, n_nl - 1):
        e = np.zeros(n_nl)
        e[d] = eps
        fd = (thd(_solve_params(net, dev, s, 1, 1, inj0 + e))
              - thd(_solve_params(net, dev, s, 1, 1, inj0 - e))) / (2 * eps)
        np.testing.assert_allclose(
            float(sens_d.grad.injection_scale[d]), fd, rtol=1e-3, atol=1e-9)


def test_injection_sensitivity_backcompat_and_vector():
    """The scalar wrapper still returns scalar grad/(dim,) dx; a vector
    theta returns per-device components summing against the scalar one
    (chain rule: scalar scale = all devices moving together)."""
    cfg = ("net3", 5, True)
    s, net, dev = make_setup(cfg)
    res = _solve_scaled(net, dev, s, 1.0)
    sc = injection_sensitivity(net, dev, s, res, theta=1.0)
    assert sc.grad.shape == ()
    assert sc.dx.ndim == 1
    vec = injection_sensitivity(net, dev, s, res,
                                theta=jnp.ones(net.n_nonlinear))
    np.testing.assert_allclose(float(jnp.sum(vec.grad)), float(sc.grad),
                               rtol=1e-8)


def test_mix_sensitivity_matches_fd():
    """d(maxTHD)/d(mix weight) vs finite differences through full mix
    re-solves (net4, 3 types x 3 buses)."""
    from conftest import DATA
    from hpfx.sensitivity import mix_sensitivity
    from hpfx.solve import Scenarios, hpf_sweep

    s = hpfx.settings_for_hmax(9, coupled=True)
    net = hpfx.load_network(f"{DATA}/net4_buses.csv",
                            f"{DATA}/net4_lines.csv", s)
    lib = hpfx.load_device_library(("SMPS", "ev_1", "ev_4"), s)
    rng = np.random.default_rng(2)
    w = rng.uniform(0.2, 1.0, (net.n_nonlinear, lib.n_types))

    def solve(w_):
        scen = Scenarios(p_scale=jnp.ones(1), q_scale=jnp.ones(1),
                         device_mix=jnp.asarray(w_[None]))
        return hpf_sweep(net, lib, settings=s, scenarios=scen)

    res = solve(w)
    assert bool(res.converged[0])
    one = hpfx.HPFResult(V_m=res.V_m[0], V_a=res.V_a[0], err=res.err[0],
                         n_iter=res.n_iter[0], err_hist=res.err_hist[0],
                         converged=res.converged[0])
    sens = mix_sensitivity(net, lib, s, one, w)
    assert sens.grad.shape == w.shape

    def thd(r):
        return float(np.max(np.asarray(hpfx.get_thd(r.V_m[0]).THD_F)))

    eps = 1e-5
    for (d, t) in [(0, 0), (1, 2), (2, 1)]:
        wp, wm = w.copy(), w.copy()
        wp[d, t] += eps
        wm[d, t] -= eps
        fd = (thd(solve(wp)) - thd(solve(wm))) / (2 * eps)
        np.testing.assert_allclose(float(sens.grad[d, t]), fd,
                                   rtol=2e-3, atol=1e-8)


def test_line_sensitivity_matches_fd():
    """d(maxTHD)/d(line params) via IFT-through-build_ybus vs central finite
    differences through full re-solves: per-line series-impedance scale,
    transformer tap, and phase shift."""
    from hpfx.sensitivity import LineParams, line_sensitivity

    cfg = ("net2", 5, True)
    s, net, dev = make_setup(cfg)
    res = hpfx.hpf(net, dev, s)
    assert bool(res.converged)
    L = net.n_lines
    sens = line_sensitivity(
        net, dev, s, res, line_params=LineParams(z_scale=jnp.ones(L)))
    assert sens.grad.z_scale.shape == (L,)
    assert sens.grad.tau.shape == (L,)
    assert sens.grad.shift_rad.shape == (L,)

    def thd(r):
        return float(np.max(np.asarray(hpfx.get_thd(r.V_m).THD_F)))

    def solve_net(**line_fields):
        return hpfx.hpf(dataclasses.replace(net, **line_fields), dev, s)

    eps = 1e-6
    # per-line impedance scale on two lines
    for k in (0, L - 1):
        grads = []
        for sgn in (+1.0, -1.0):
            z = np.ones(L)
            z[k] += sgn * eps
            z = jnp.asarray(z, net.line_R.dtype)
            grads.append(thd(solve_net(line_R=net.line_R * z,
                                       line_X=net.line_X * z)))
        fd = (grads[0] - grads[1]) / (2 * eps)
        np.testing.assert_allclose(float(sens.grad.z_scale[k]), fd,
                                   rtol=2e-3, atol=1e-9)

    # transformer tap on line 1 (tau=1 in the base net)
    k = 1
    tau_hi = np.asarray(net.line_tau, float).copy()
    tau_lo = tau_hi.copy()
    tau_hi[k] += eps
    tau_lo[k] -= eps
    fd = (thd(solve_net(line_tau=jnp.asarray(tau_hi))) -
          thd(solve_net(line_tau=jnp.asarray(tau_lo)))) / (2 * eps)
    np.testing.assert_allclose(float(sens.grad.tau[k]), fd,
                               rtol=2e-3, atol=1e-9)

    # phase shift on line 0 (0 rad in the base net)
    k = 0
    sh_hi = np.asarray(net.line_shift, float).copy()
    sh_lo = sh_hi.copy()
    sh_hi[k] += eps
    sh_lo[k] -= eps
    fd = (thd(solve_net(line_shift=jnp.asarray(sh_hi))) -
          thd(solve_net(line_shift=jnp.asarray(sh_lo)))) / (2 * eps)
    np.testing.assert_allclose(float(sens.grad.shift_rad[k]), fd,
                               rtol=2e-3, atol=1e-9)


def test_line_sensitivity_arrow_matches_dense():
    """The arrow-solver column path gives the same line gradients as the
    dense-LU path (the solver only changes the linear solve)."""
    from hpfx.sensitivity import LineParams, line_sensitivity

    cfg = ("net2", 5, True)
    s, net, dev = make_setup(cfg)
    res = hpfx.hpf(net, dev, s)
    lp = LineParams(z_scale=jnp.ones(net.n_lines))
    dense = line_sensitivity(net, dev, s, res, line_params=lp)
    s_arrow = s.with_(solver="arrow")
    res_a = hpfx.hpf(net, dev, s_arrow)
    arrow = line_sensitivity(net, dev, s_arrow, res_a, line_params=lp)
    for g_d, g_a in zip(dense.grad, arrow.grad):
        np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_d),
                                   rtol=1e-6, atol=1e-12)


def test_tap_descent_reduces_thd():
    """The tap-optimization use case line_sensitivity exists for: a few
    gradient-descent steps on the transformer tap ratio, re-solving at each
    step, must monotonically reduce worst-bus THD (the demo feeder, where
    d(maxTHD)/d(tau) is nonzero)."""
    from hpfx.network import NONLINEAR, PQ, SLACK
    from hpfx.sensitivity import LineParams, line_sensitivity

    s = hpfx.settings_for_hmax(9, coupled=True)
    tau0 = 1.05

    def solve_at(tau):
        net = hpfx.network_from_arrays(
            bus_types=(SLACK, PQ, NONLINEAR),
            components=("generator", "lin_load", "SMPS"),
            P=[0, 100, 250], Q=[0, 50, 100], X_sh=[0.005, 0, 0],
            line_from=[0, 1], line_to=[1, 2],
            R=[0.5, 1.0], X=[2.0, 4.0],
            tau=[tau, 1.0], phase_shift=[30.0, 0.0],
            settings=s, per_unit=False)
        dev = hpfx.load_device_set(net, s)
        res = hpfx.hpf(net, dev, s)
        assert bool(res.converged)
        return net, dev, res

    thds, tau = [], tau0
    for _ in range(4):
        net, dev, res = solve_at(tau)
        sens = line_sensitivity(net, dev, s, res)
        thds.append(float(sens.value))
        tau -= 0.02 * float(jnp.sign(sens.grad.tau[0]))
    assert all(b < a for a, b in zip(thds, thds[1:])), thds
    # a real reduction, not fp noise
    assert thds[-1] < thds[0] - 1e-3


def test_sweep_sensitivity_matches_per_scenario_loop():
    """The vmapped batch gradients equal a Python loop of per-scenario
    scenario_sensitivity calls, on both the dense and arrow solvers."""
    from hpfx.sensitivity import sweep_sensitivity
    from hpfx.solve import Scenarios, hpf_sweep

    cfg = ("net2", 5, True)
    s, net, dev = make_setup(cfg)
    B = 4
    rng = np.random.default_rng(7)
    scen = Scenarios(
        p_scale=jnp.asarray(rng.uniform(0.9, 1.1, B), s.real_dtype),
        q_scale=jnp.asarray(rng.uniform(0.9, 1.1, B), s.real_dtype),
        injection_scale=jnp.asarray(rng.uniform(0.5, 1.2, B), s.real_dtype))

    for s_v in (s, s.with_(solver="arrow")):
        res = hpf_sweep(net, dev, settings=s_v, scenarios=scen)
        assert bool(jnp.all(res.converged))
        sens = sweep_sensitivity(net, dev, s_v, res, scen)
        assert sens.value.shape == (B,)
        assert sens.grad.p_scale.shape == (B,)
        for b in range(B):
            one = hpfx.HPFResult(
                V_m=res.V_m[b], V_a=res.V_a[b], err=res.err[b],
                n_iter=res.n_iter[b], err_hist=res.err_hist[b],
                converged=res.converged[b])
            ref = scenario_sensitivity(
                net, dev.scale(scen.injection_scale[b]), s_v, one,
                params=ScenarioParams(scen.p_scale[b], scen.q_scale[b], 1.0))
            np.testing.assert_allclose(float(sens.value[b]),
                                       float(ref.value), rtol=1e-10)
            np.testing.assert_allclose(float(sens.grad.p_scale[b]),
                                       float(ref.grad.p_scale), rtol=1e-8)
            np.testing.assert_allclose(float(sens.grad.q_scale[b]),
                                       float(ref.grad.q_scale), rtol=1e-8)
            # chain rule: the loop solved at inj pre-scaled into the device
            # set, so d/d(theta) there = inj_b * d/d(inj_b) here
            np.testing.assert_allclose(
                float(sens.grad.injection_scale[b])
                * float(scen.injection_scale[b]),
                float(ref.grad.injection_scale), rtol=1e-8)


def test_sweep_sensitivity_with_device_mix():
    """Batched gradients through a device-mix sweep (mix carried through
    the blend, p/q/inj differentiated) match finite differences."""
    from conftest import DATA
    from hpfx.sensitivity import sweep_sensitivity
    from hpfx.solve import Scenarios, hpf_sweep

    s = hpfx.settings_for_hmax(9, coupled=True)
    net = hpfx.load_network(f"{DATA}/net4_buses.csv",
                            f"{DATA}/net4_lines.csv", s)
    lib = hpfx.load_device_library(("SMPS", "ev_1", "ev_4"), s)
    rng = np.random.default_rng(3)
    B = 3
    w = rng.uniform(0.2, 1.0, (B, net.n_nonlinear, lib.n_types))

    def scen_at(p):
        return Scenarios(p_scale=jnp.asarray(p, s.real_dtype),
                         q_scale=jnp.ones(B, s.real_dtype),
                         injection_scale=jnp.ones(B, s.real_dtype),
                         device_mix=jnp.asarray(w, s.real_dtype))

    p0 = rng.uniform(0.95, 1.05, B)
    res = hpf_sweep(net, lib, settings=s, scenarios=scen_at(p0))
    assert bool(jnp.all(res.converged))
    sens = sweep_sensitivity(net, lib, s, res, scen_at(p0))

    def thd_b(r, b):
        return float(np.max(np.asarray(hpfx.get_thd(r.V_m[b]).THD_F)))

    eps = 1e-5
    for b in range(B):
        e = np.zeros(B)
        e[b] = eps
        fd = (thd_b(hpf_sweep(net, lib, settings=s,
                              scenarios=scen_at(p0 + e)), b)
              - thd_b(hpf_sweep(net, lib, settings=s,
                                scenarios=scen_at(p0 - e)), b)) / (2 * eps)
        np.testing.assert_allclose(float(sens.grad.p_scale[b]), fd,
                                   rtol=2e-3, atol=1e-9)


def test_sweep_sensitivity_per_bus_scales():
    """(B, n) per-bus p/q arms: the vmapped gradients carry the per-bus
    shape and match the per-scenario scenario_sensitivity loop."""
    from hpfx.sensitivity import sweep_sensitivity
    from hpfx.solve import Scenarios, hpf_sweep

    cfg = ("net2", 5, True)
    s, net, dev = make_setup(cfg)
    B, n = 3, net.n
    rng = np.random.default_rng(9)
    scen = Scenarios(
        p_scale=jnp.asarray(rng.uniform(0.95, 1.05, (B, n)), s.real_dtype),
        q_scale=jnp.asarray(rng.uniform(0.95, 1.05, (B, n)), s.real_dtype),
        injection_scale=jnp.ones(B, s.real_dtype))
    res = hpf_sweep(net, dev, settings=s, scenarios=scen)
    assert bool(jnp.all(res.converged))
    sens = sweep_sensitivity(net, dev, s, res, scen)
    assert sens.grad.p_scale.shape == (B, n)
    assert sens.grad.q_scale.shape == (B, n)
    for b in range(B):
        one = hpfx.HPFResult(V_m=res.V_m[b], V_a=res.V_a[b], err=res.err[b],
                             n_iter=res.n_iter[b], err_hist=res.err_hist[b],
                             converged=res.converged[b])
        ref = scenario_sensitivity(
            net, dev, s, one,
            params=ScenarioParams(scen.p_scale[b], scen.q_scale[b], 1.0))
        np.testing.assert_allclose(np.asarray(sens.grad.p_scale[b]),
                                   np.asarray(ref.grad.p_scale), rtol=1e-8,
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(sens.grad.q_scale[b]),
                                   np.asarray(ref.grad.q_scale), rtol=1e-8,
                                   atol=1e-12)


def test_sweep_sensitivity_none_defaults_match_sweep():
    """Scenarios with q_scale=None solve at q==p (solve.py's default);
    sweep_sensitivity must differentiate at that same operating point."""
    from hpfx.sensitivity import sweep_sensitivity
    from hpfx.solve import Scenarios, hpf_sweep

    cfg = ("net2", 5, True)
    s, net, dev = make_setup(cfg)
    B = 3
    p = jnp.asarray(np.linspace(0.95, 1.05, B), s.real_dtype)
    scen = Scenarios(p_scale=p)                  # q_scale/inj default
    res = hpf_sweep(net, dev, settings=s, scenarios=scen)
    assert bool(jnp.all(res.converged))
    sens = sweep_sensitivity(net, dev, s, res, scen)
    for b in range(B):
        one = hpfx.HPFResult(V_m=res.V_m[b], V_a=res.V_a[b], err=res.err[b],
                             n_iter=res.n_iter[b], err_hist=res.err_hist[b],
                             converged=res.converged[b])
        ref = scenario_sensitivity(
            net, dev, s, one,
            params=ScenarioParams(p[b], p[b], 1.0))   # q follows p
        np.testing.assert_allclose(float(sens.value[b]), float(ref.value),
                                   rtol=1e-10)
        np.testing.assert_allclose(float(sens.grad.p_scale[b]),
                                   float(ref.grad.p_scale), rtol=1e-8)
        np.testing.assert_allclose(float(sens.grad.q_scale[b]),
                                   float(ref.grad.q_scale), rtol=1e-8)
