"""Arrow (block + Woodbury) Newton-step solver vs the dense Jacobian."""
import numpy as np
import pytest

import hpfx
from hpfx import harmonic
from hpfx.arrow import arrow_solve, build_arrow_pieces, make_arrow_index
from hpfx.cx import Cx

from conftest import ALL_CONFIGS, config_id, make_setup


def _setup_state(cfg):
    s, net, dev = make_setup(cfg)
    Y = hpfx.build_ybus(net, s)
    fund = hpfx.pf(Y, net, s)
    V_m, V_a = harmonic.init_harmonic_voltages(fund, net, s)
    return s, net, dev, Y, V_m, V_a


@pytest.mark.parametrize(
    "cfg", [("net2", 5, True), ("net2", 25, True), ("net3", 5, True),
            ("net3", 25, True), ("net1", 5, True), ("net2", 5, False),
            ("net3", 25, False), ("net1", 25, True)],
    ids=config_id)
def test_arrow_matches_dense_step(cfg):
    """The Woodbury solve reproduces the dense Newton step to fp noise."""
    s, net, dev, Y, V_m, V_a = _setup_state(cfg)
    m, n, c, H = net.m, net.n, net.c, s.n_harmonics
    S = Cx(net.bus_P, net.bus_Q)
    f, _ = harmonic.harmonic_mismatch(V_m, V_a, Y, S, dev, m, n, c)
    J = np.asarray(harmonic.build_harmonic_jacobian(V_m, V_a, Y, dev, m, n, c))
    dx_dense = np.linalg.solve(J, np.asarray(f))

    idx = make_arrow_index(H, n, m, c)
    pieces = build_arrow_pieces(V_m, V_a, Y, dev, idx)
    dx_arrow = np.asarray(arrow_solve(pieces, f, idx))
    np.testing.assert_allclose(dx_arrow, dx_dense, atol=1e-9 * max(
        1.0, np.abs(dx_dense).max()))


def test_arrow_pieces_reconstruct_jacobian():
    """Permuting the dense Jacobian into harmonic-grouped form reproduces
    the D blocks exactly, with the Woodbury term accounting for the rest."""
    cfg = ("net3", 5, True)
    s, net, dev, Y, V_m, V_a = _setup_state(cfg)
    m, n, c, H = net.m, net.n, net.c, s.n_harmonics
    J = np.asarray(harmonic.build_harmonic_jacobian(V_m, V_a, Y, dev, m, n, c))
    idx = make_arrow_index(H, n, m, c)
    pieces = build_arrow_pieces(V_m, V_a, Y, dev, idx)

    dim = J.shape[0]
    P_r = np.zeros((dim, dim)); P_r[idx.f_perm, np.arange(dim)] = 1
    P_c = np.zeros((dim, dim)); P_c[idx.x_perm, np.arange(dim)] = 1
    J_pi = P_r @ J @ P_c.T

    d0 = idx.d0
    np.testing.assert_allclose(J_pi[:d0, :d0], np.asarray(pieces.D0),
                               atol=1e-12)
    K = H - 1
    for k in range(K):
        blk = slice(d0 + 2 * n * k, d0 + 2 * n * (k + 1))
        np.testing.assert_allclose(J_pi[blk, blk], np.asarray(pieces.Dh[k]),
                                   atol=1e-12)
    # off-diagonal harmonic blocks contain exactly the Woodbury coupling
    n_nl = n - m
    r_blk = 2 * n_nl
    C = np.asarray(pieces.C)
    # entry check: ReI(h=1, first nl bus) wrt angle(h=0, same bus)
    row = d0 + 0 * 2 * n + m            # local ReI row of bus m in block 1
    col = (m - 1)                       # block-0 angle col of bus m
    u_row = 1 * r_blk + 0 * n_nl + 0
    u_col = 0 * r_blk + 0 * n_nl + 0
    np.testing.assert_allclose(J_pi[row, col], C[u_row, u_col], atol=1e-12)


def test_arrow_uncoupled_is_block_diagonal():
    cfg = ("net2", 5, False)
    s, net, dev, Y, V_m, V_a = _setup_state(cfg)
    idx = make_arrow_index(s.n_harmonics, net.n, net.m, net.c)
    pieces = build_arrow_pieces(V_m, V_a, Y, dev, idx)
    assert np.abs(np.asarray(pieces.C)).max() == 0.0


@pytest.mark.parametrize("cfg", [("net2", 25, True), ("net1", 25, True),
                                 ("net3", 51, True)], ids=config_id)
def test_arrow_end_to_end_parity(cfg):
    """Full HPF with solver='arrow' reproduces the dense-path solution
    (and hence the reference golden) with the same iteration count."""
    s, net, dev = make_setup(cfg)
    dense = hpfx.hpf(net, dev, s)
    arrow = hpfx.hpf(net, dev, s.with_(solver="arrow"))
    assert int(arrow.n_iter) == int(dense.n_iter)
    np.testing.assert_allclose(np.asarray(arrow.V_m), np.asarray(dense.V_m),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(arrow.V_a), np.asarray(dense.V_a),
                               atol=1e-8)


def test_arrow_with_analytic_devices():
    """solver='arrow' works with an AnalyticDeviceSet (coupling blocks from
    injection autodiff) and matches the dense path — the crash reported in
    round-1 review (devices.Y_N access on a device type without Y_N)."""
    from hpfx.devices import AnalyticDeviceSet, norton_inject
    s, net, dev = make_setup(("net2", 5, True))
    adev = AnalyticDeviceSet(params=(dev.I_N, dev.Y_N),
                             inject=norton_inject, n_nl=net.n_nonlinear)
    dense = hpfx.hpf(net, adev, s)
    arrow = hpfx.hpf(net, adev, s.with_(solver="arrow"))
    assert int(arrow.n_iter) == int(dense.n_iter)
    np.testing.assert_allclose(np.asarray(arrow.V_m), np.asarray(dense.V_m),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(arrow.V_a), np.asarray(dense.V_a),
                               atol=1e-9)


def test_sweep_with_analytic_devices():
    """Batched scenario sweeps accept an AnalyticDeviceSet: the scale()
    penetration hook is a data-leaf multiplier on injections, matching
    DeviceSet's I_N/Y_N scaling semantics (round-2 fix: _solve_scenario
    used to assume DeviceSet attributes)."""
    import jax.numpy as jnp
    from hpfx.devices import AnalyticDeviceSet, norton_inject
    from hpfx.solve import Scenarios, hpf_sweep
    s, net, dev = make_setup(("net2", 5, True))
    adev = AnalyticDeviceSet(params=(dev.I_N, dev.Y_N),
                             inject=norton_inject, n_nl=net.n_nonlinear)
    scen = Scenarios(p_scale=jnp.linspace(0.9, 1.1, 3),
                     q_scale=jnp.linspace(0.9, 1.1, 3),
                     injection_scale=jnp.array([0.0, 0.7, 1.3]))
    for solver in ("dense", "arrow"):
        ra = hpf_sweep(net, adev, settings=s.with_(solver=solver),
                       scenarios=scen)
        rd = hpf_sweep(net, dev, settings=s.with_(solver=solver),
                       scenarios=scen)
        np.testing.assert_array_equal(np.asarray(ra.n_iter),
                                      np.asarray(rd.n_iter))
        np.testing.assert_allclose(np.asarray(ra.V_m), np.asarray(rd.V_m),
                                   atol=1e-10)


def test_arrow_under_vmap_sweep():
    """The arrow Newton step vmaps: a batched sweep with solver='arrow'
    matches the dense-path sweep scenario-for-scenario."""
    import jax.numpy as jnp
    from hpfx.solve import Scenarios, hpf_sweep
    s, net, dev = make_setup(("net2", 25, True))
    scen = Scenarios(p_scale=jnp.linspace(0.9, 1.1, 4),
                     q_scale=jnp.linspace(0.9, 1.1, 4),
                     injection_scale=jnp.linspace(0.8, 1.2, 4))
    dense = hpf_sweep(net, dev, settings=s, scenarios=scen)
    arrow = hpf_sweep(net, dev, settings=s.with_(solver="arrow"),
                      scenarios=scen)
    np.testing.assert_array_equal(np.asarray(arrow.n_iter),
                                  np.asarray(dense.n_iter))
    np.testing.assert_allclose(np.asarray(arrow.V_m),
                               np.asarray(dense.V_m), atol=1e-8)
