"""Transformer end-to-end solves (closing SURVEY §2.4 pi_trafo).

The reference's only transformer support is pi_trafo_pf_test.py — a full
571-line solver variant whose tau/phase-shift Ybus (:117-145) carries
explicit FIXMEs (unresolved pu/phase-shift semantics) and the off-by-one
shunt indexing quirk; its third-party companions (pypsa_transformer_example
.py, pandapower_power_flow.py) print values at runtime but record none, and
neither library is available here.  hpfx therefore validates its
(PyPSA-convention, from-side tap) transformer model against ORACLES THE
TEST OWNS:

1. an analytic two-bus closed form (quadratic in |V2|²) for the
   fundamental solve with tap AND phase shift,
2. physics invariants (no-load ratio/angle, active-power conservation
   through a lossless branch) that pin the sign/side conventions,
3. an independently written numpy complex-arithmetic HCNE solver with
   finite-difference Jacobians (no shared solver code with hpfx; shares
   only the problem statement) for the full 4-bus fundamental + coupled
   harmonic case incl. the tau²-scaled line shunts and harmonic bus
   shunts that pi_trafo_pf_test.py:117-145 flags as FIXME.
"""
import numpy as np
import pytest

import hpfx
from hpfx.network import NONLINEAR, PQ, SLACK

from conftest import DATA

TAU, SHIFT_DEG = 1.05, 30.0


def _settings(h_max=9, **kw):
    kw.setdefault("coupled", True)
    return hpfx.settings_for_hmax(h_max, **kw)


def trafo_net(s, G=2e-5, B=5e-5, X_sh=0.005):
    """4-bus radial fixture: slack —(trafo tau/shift, with pi-shunts)— PQ
    load — PQ — nonlinear SMPS.  SI units against the settings' bases."""
    return hpfx.network_from_arrays(
        bus_types=(SLACK, PQ, PQ, NONLINEAR),
        components=("generator", "lin_load", "nothing", "SMPS"),
        P=[0, 100, 0, 250], Q=[0, 50, 0, 100],
        X_sh=[X_sh, 0, 0, 0],
        line_from=[0, 1, 2], line_to=[1, 2, 3],
        R=[0.5, 1.0, 0.5], X=[2.0, 4.0, 1.0],
        G=[G, 0, 0], B=[B, 0, 0],
        tau=[TAU, 1.0, 1.0], phase_shift=[SHIFT_DEG, 0.0, 0.0],
        settings=s, per_unit=False)


# ---------------------------------------------------------------------------
# independent numpy oracle (complex arithmetic, FD Jacobians)
# ---------------------------------------------------------------------------

def numpy_ybus(net, harmonics):
    """Complex (H, n, n) Ybus, straight loops (hpfx's documented
    transformer convention: from-side tap, PyPSA-style)."""
    n = net.n
    out = []
    for h in harmonics:
        Y = np.zeros((n, n), complex)
        for ll in range(net.n_lines):
            f, t = int(net.line_from[ll]), int(net.line_to[ll])
            Ys = 1.0 / (float(net.line_R[ll]) + 1j * float(net.line_X[ll]) * h)
            tau = float(net.line_tau[ll])
            phi = float(net.line_shift[ll])
            Ysh = (float(net.line_G[ll]) + 1j * h * float(net.line_B[ll])) / 2
            Y[f, t] += -Ys / (tau * np.exp(-1j * phi))
            Y[t, f] += -Ys / (tau * np.exp(1j * phi))
            Y[f, f] += (Ys + Ysh) / tau ** 2
            Y[t, t] += Ys + Ysh
        for b in range(n):
            xsh = float(net.bus_Xsh[b])
            if xsh != 0 and h != 1:
                Y[b, b] += 1.0 / (1j * xsh * h)
        out.append(Y)
    return np.stack(out)


def _newton_fd(x0, residual, thresh=1e-11, max_iter=80, step=1e-7):
    """Plain NR with a central-difference Jacobian — no analytic
    derivatives shared with hpfx."""
    x = np.asarray(x0, float).copy()
    for _ in range(max_iter):
        f = residual(x)
        if np.max(np.abs(f)) < thresh:
            return x, True
        J = np.empty((len(f), len(x)))
        for j in range(len(x)):
            xp, xm = x.copy(), x.copy()
            xp[j] += step
            xm[j] -= step
            J[:, j] = (residual(xp) - residual(xm)) / (2 * step)
        x = x - np.linalg.solve(J, f)
    return x, np.max(np.abs(residual(x))) < thresh


def numpy_fund_pf(Y1, S, n, c):
    """Fundamental PF: mismatch V∘conj(Y1·V) + S, state [Va[1:], Vm[c:]]."""
    def residual(x):
        Va = np.concatenate([[0.0], x[: n - 1]])
        Vm = np.concatenate([np.ones(c), x[n - 1:]])
        V = Vm * np.exp(1j * Va)
        mis = V * np.conj(Y1 @ V) + S
        return np.concatenate([mis.real[1:], mis.imag[c:]])

    x0 = np.concatenate([np.zeros(n - 1), np.ones(n - c)])
    x, ok = _newton_fd(x0, residual)
    assert ok
    Va = np.concatenate([[0.0], x[: n - 1]])
    Vm = np.concatenate([np.ones(c), x[n - 1:]])
    return Vm * np.exp(1j * Va)


def numpy_hpf(Yh, S, n, m, c, I_N, Y_N, V1):
    """Coupled-HCNE harmonic solve (reference problem statement,
    hcne_generalized.py:313-560): FD-Jacobian NR on the full
    [Va.flat[1:], Vm.flat[c:]] state.  I_N (n_nl, H), Y_N (n_nl, H, H)."""
    H = Yh.shape[0]
    D = H * n

    def unpack(x):
        Va = np.concatenate([[0.0], x[: D - 1]]).reshape(H, n)
        Vm = np.concatenate([np.ones(c), x[D - 1:]]).reshape(H, n)
        return Vm, Va

    def residual(x):
        Vm, Va = unpack(x)
        V = Vm * np.exp(1j * Va)                     # (H, n)
        I_inj = np.stack([I_N[d] - Y_N[d] @ V[:, m + d]
                          for d in range(n - m)])    # (n_nl, H)
        dS = V[0, 1:m] * np.conj(Yh[0, 1:m] @ V[0]) + S[1:m]
        dI_f = (Yh[0, m:] @ V[0]) + I_inj[:, 0]
        dI_h = np.einsum("hij,hj->hi", Yh[1:], V[1:])
        dI_h[:, m:] += I_inj[:, 1:].T
        f_c = np.concatenate([dS, dI_f, dI_h.reshape(-1)])
        return np.concatenate([f_c.real, f_c[c - 1:].imag])

    Vm0 = np.full((H, n), 0.1)
    Vm0[0] = np.abs(V1)
    Va0 = np.zeros((H, n))
    Va0[0] = np.angle(V1)
    x0 = np.concatenate([Va0.reshape(-1)[1:], Vm0.reshape(-1)[c:]])
    x, ok = _newton_fd(x0, residual, thresh=1e-11, max_iter=120)
    assert ok, "numpy HCNE oracle did not converge"
    Vm, Va = unpack(x)
    return Vm * np.exp(1j * Va)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_two_bus_analytic_closed_form():
    """Slack —trafo(tau, shift)— PQ load: |V2|² solves a quadratic in
    closed form; hpfx's fundamental NR must hit it to 1e-10."""
    s = _settings(h_max=1)
    net = hpfx.network_from_arrays(
        bus_types=(SLACK, PQ), components=("generator", "load"),
        P=[0, 150], Q=[0, 60],
        line_from=[0], line_to=[1], R=[0.5], X=[2.0],
        tau=[TAU], phase_shift=[SHIFT_DEG], settings=s, per_unit=False)
    Ys = 1.0 / ((0.5 + 2.0j) / s.base_impedance)
    S = (150 + 60j) / s.base_power
    phi = np.deg2rad(SHIFT_DEG)
    # row 2 of Ybus · V = -conj(S)/conj(V2)  =>  quadratic in u = |V2|²:
    # tau²·|Ys|²·u² + (2·tau²·Re(Ys·S) - |Ys|²)·u + tau²·|S|² = 0
    a = TAU ** 2 * abs(Ys) ** 2
    b = 2 * TAU ** 2 * (Ys * S).real - abs(Ys) ** 2
    cq = TAU ** 2 * abs(S) ** 2
    roots = np.roots([a, b, cq])
    u = float(max(roots.real))                  # high-voltage solution
    W = TAU * np.exp(1j * phi) * (Ys * u + np.conj(S)) / Ys   # V1·conj(V2)
    V2 = np.conj(W)                             # V1 = 1
    # sanity: |W|² == u (the root condition)
    np.testing.assert_allclose(abs(W) ** 2, u, rtol=1e-12)

    fund = hpfx.solve_fundamental(hpfx.build_ybus(net, s)[0], net, s)
    V2_hpfx = float(fund.V_m[1]) * np.exp(1j * float(fund.V_a[1]))
    assert bool(fund.converged)
    np.testing.assert_allclose(V2_hpfx, V2, atol=1e-10)


def test_no_load_ratio_and_angle():
    """Unloaded trafo: V_t = V_f·e^{-j·shift}/tau exactly (pins the
    tap-side and shift-sign conventions)."""
    s = _settings(h_max=1)
    net = hpfx.network_from_arrays(
        bus_types=(SLACK, PQ), components=("generator", "nothing"),
        P=[0, 0], Q=[0, 0],
        line_from=[0], line_to=[1], R=[0.5], X=[2.0],
        tau=[TAU], phase_shift=[SHIFT_DEG], settings=s, per_unit=False)
    fund = hpfx.solve_fundamental(hpfx.build_ybus(net, s)[0], net, s)
    np.testing.assert_allclose(float(fund.V_m[1]), 1.0 / TAU, atol=1e-10)
    np.testing.assert_allclose(float(fund.V_a[1]) % (2 * np.pi),
                               (-np.deg2rad(SHIFT_DEG)) % (2 * np.pi),
                               atol=1e-10)


def test_lossless_trafo_conserves_active_power():
    """R=0 trafo branch: P into the branch from both ends sums to zero for
    the solved state (convention-independent physics check)."""
    s = _settings(h_max=1)
    net = hpfx.network_from_arrays(
        bus_types=(SLACK, PQ), components=("generator", "load"),
        P=[0, 150], Q=[0, 60],
        line_from=[0], line_to=[1], R=[0.0], X=[2.0],
        tau=[TAU], phase_shift=[SHIFT_DEG], settings=s, per_unit=False)
    fund = hpfx.solve_fundamental(hpfx.build_ybus(net, s)[0], net, s)
    V = np.asarray(fund.V_m) * np.exp(1j * np.asarray(fund.V_a))
    Ys = 1.0 / (2.0j / s.base_impedance)
    phi = np.deg2rad(SHIFT_DEG)
    I_f = Ys / TAU ** 2 * V[0] - Ys / (TAU * np.exp(-1j * phi)) * V[1]
    I_t = Ys * V[1] - Ys / (TAU * np.exp(1j * phi)) * V[0]
    P_f = (V[0] * np.conj(I_f)).real
    P_t = (V[1] * np.conj(I_t)).real
    np.testing.assert_allclose(P_f + P_t, 0.0, atol=1e-10)
    assert P_f > 1e-3          # power actually flows


def test_fundamental_vs_numpy_oracle():
    """4-bus trafo net fundamental: hpfx vs the FD-Jacobian numpy solver."""
    s = _settings()
    net = trafo_net(s)
    Y = numpy_ybus(net, s.harmonics)
    S = np.asarray(net.bus_P) + 1j * np.asarray(net.bus_Q)
    V_np = numpy_fund_pf(Y[0], S, net.n, net.c)
    fund = hpfx.hpf_single(net, hpfx.load_device_set(net, s),
                           settings=s).fund
    V_hp = np.asarray(fund.V_m) * np.exp(1j * np.asarray(fund.V_a))
    np.testing.assert_allclose(V_hp, V_np, atol=1e-9)


@pytest.mark.parametrize("solver", ["dense", "arrow"])
def test_harmonic_vs_numpy_oracle(solver):
    """Full coupled harmonic solve through the transformer (incl. the
    tau²-scaled pi shunts and harmonic bus shunt the reference FIXMEs):
    hpfx (dense and arrow Newton steps) vs the independent numpy HCNE."""
    s = _settings(solver=solver)
    net = trafo_net(s)
    dev = hpfx.load_device_set(net, s)
    res = hpfx.hpf_single(net, dev, settings=s)
    assert bool(res.converged)
    V_hp = np.asarray(res.V_m) * np.exp(1j * np.asarray(res.V_a))

    Y = numpy_ybus(net, s.harmonics)
    S = np.asarray(net.bus_P) + 1j * np.asarray(net.bus_Q)
    V1 = numpy_fund_pf(Y[0], S, net.n, net.c)
    I_N, Y_N = dev.I_N.to_numpy(), dev.Y_N.to_numpy()
    V_np = numpy_hpf(Y, S, net.n, net.m, net.c, I_N, Y_N, V1)
    np.testing.assert_allclose(V_hp, V_np, atol=1e-8)
    thd = hpfx.get_thd(res.V_m)
    assert np.all(np.isfinite(np.asarray(thd.THD_F)))


def test_stable_mismatch_same_fixed_point():
    """The cancellation-free line-difference mismatch (whose tap/shift
    handling folds the coupling into polar form) reaches the same trafo
    fixed point as the dense mismatch."""
    s = _settings()
    net = trafo_net(s)
    dev = hpfx.load_device_set(net, s)
    r_dense = hpfx.hpf_single(net, dev, settings=s)
    r_stable = hpfx.hpf_single(net, dev,
                               settings=s.with_(stable_mismatch=True))
    assert bool(r_dense.converged) and bool(r_stable.converged)
    np.testing.assert_allclose(np.asarray(r_stable.V_m),
                               np.asarray(r_dense.V_m), atol=1e-10)
    np.testing.assert_allclose(np.asarray(r_stable.V_a),
                               np.asarray(r_dense.V_a), atol=1e-10)


def test_trafo_csv_roundtrip(tmp_path):
    """The CSV loader accepts tau/phase_shift columns; the loaded net
    solves to the same state as the array-constructed one."""
    s = _settings()
    buses = tmp_path / "b.csv"
    lines = tmp_path / "l.csv"
    buses.write_text(
        "ID;type;component;S;P;Q;X_sh\n"
        "1;slack;generator;0;0;0;0.005\n"
        "2;PQ;lin_load;0;100;50;0\n"
        "3;PQ;nothing;0;0;0;0\n"
        "4;nonlinear;SMPS;0;250;100;0\n")
    lines.write_text(
        "ID;fromID;toID;R;X;G;B;tau;phase_shift\n"
        f"1;1;2;0.5;2.0;0.00002;0.00005;{TAU};{SHIFT_DEG}\n"
        "2;2;3;1.0;4.0;0;0;1;0\n"
        "3;3;4;0.5;1.0;0;0;1;0\n")
    net_csv = hpfx.load_network(str(buses), str(lines), s)
    net_arr = trafo_net(s)
    np.testing.assert_allclose(np.asarray(net_csv.line_tau),
                               np.asarray(net_arr.line_tau))
    np.testing.assert_allclose(np.asarray(net_csv.line_shift),
                               np.asarray(net_arr.line_shift))
    dev = hpfx.load_device_set(net_csv, s)
    r1 = hpfx.hpf_single(net_csv, dev, settings=s)
    r2 = hpfx.hpf_single(net_arr, dev, settings=s)
    np.testing.assert_allclose(np.asarray(r1.V_m), np.asarray(r2.V_m),
                               atol=1e-12)


def test_trafo_sweep_lanes_matches_vmap():
    """Scenario sweeps run through the transformer on both layouts."""
    import jax.numpy as jnp
    from hpfx.solve import Scenarios, hpf_sweep
    s = _settings(solver="arrow")
    net = trafo_net(s)
    dev = hpfx.load_device_set(net, s)
    scen = Scenarios(p_scale=jnp.linspace(0.95, 1.05, 4),
                     q_scale=jnp.ones(4),
                     injection_scale=jnp.linspace(0.9, 1.1, 4))
    r_v = hpf_sweep(net, dev, settings=s.with_(layout="vmap"),
                    scenarios=scen)
    r_l = hpf_sweep(net, dev, settings=s.with_(layout="lanes"),
                    scenarios=scen)
    np.testing.assert_array_equal(np.asarray(r_l.n_iter),
                                  np.asarray(r_v.n_iter))
    conv = np.asarray(r_v.converged)
    np.testing.assert_array_equal(np.asarray(r_l.converged), conv)
    assert conv.all()
    np.testing.assert_allclose(np.asarray(r_l.V_m), np.asarray(r_v.V_m),
                               atol=2e-9)
