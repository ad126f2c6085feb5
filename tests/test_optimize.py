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
