"""Hosting-capacity search (hpfx/capacity.py).

The solver under the search is parity-gated elsewhere; these gate the
study logic: common-random-number scaling, compliance accounting
(non-converged = non-compliant), bisection bracket invariants, the
device-mask scoping, and the CLI plumbing.
"""
import math
import os

import jax.numpy as jnp
import numpy as np
import pytest

import hpfx
from hpfx.capacity import (compliance_fraction, find_hosting_capacity,
                           monte_carlo_scenarios, scale_scenarios)
from hpfx.solve import Scenarios

from conftest import DATA, make_setup


def test_scale_scenarios_semantics():
    base = Scenarios(p_scale=jnp.ones(3),
                     injection_scale=jnp.array([1.0, 2.0, 0.5]))
    up = scale_scenarios(base, 2.0)
    np.testing.assert_allclose(np.asarray(up.injection_scale),
                               [2.0, 4.0, 1.0])
    # p/q draws are untouched — the level is an injection axis only
    np.testing.assert_allclose(np.asarray(up.p_scale), 1.0)
    # missing injection_scale means an implicit all-ones base
    none = Scenarios(p_scale=jnp.ones(2))
    np.testing.assert_allclose(
        np.asarray(scale_scenarios(none, 3.0).injection_scale), 3.0)


def test_scale_scenarios_device_mask():
    base = Scenarios(p_scale=jnp.ones(2),
                     injection_scale=jnp.array([[1.0, 2.0], [0.5, 1.0]]))
    out = scale_scenarios(base, 3.0, device_mask=jnp.array([0.0, 1.0]))
    # device 0 keeps its draw, device 1 scales by the level
    np.testing.assert_allclose(np.asarray(out.injection_scale),
                               [[1.0, 6.0], [0.5, 3.0]])
    # a scalar-per-scenario base broadcasts over the device axis first
    scal = Scenarios(p_scale=jnp.ones(2),
                     injection_scale=jnp.array([1.0, 2.0]))
    out = scale_scenarios(scal, 2.0, device_mask=jnp.array([1.0, 0.0]))
    np.testing.assert_allclose(np.asarray(out.injection_scale),
                               [[2.0, 1.0], [4.0, 2.0]])


def test_monte_carlo_scenarios_shapes_and_determinism():
    s, net, dev = make_setup(("net1", 5, False))
    a = monte_carlo_scenarios(7, 5, net, s, per_device=True)
    b = monte_carlo_scenarios(7, 5, net, s, per_device=True)
    assert a.injection_scale.shape == (5, net.n_nonlinear)
    np.testing.assert_array_equal(np.asarray(a.injection_scale),
                                  np.asarray(b.injection_scale))
    c = monte_carlo_scenarios(8, 5, net, s, per_device=False)
    assert c.injection_scale.shape == (5,)
    assert not np.array_equal(np.asarray(a.p_scale), np.asarray(c.p_scale))
    # draws live inside the spread bands around 1.0
    assert np.all(np.abs(np.asarray(a.p_scale) - 1.0) <= 0.2)
    assert np.all(np.abs(np.asarray(a.injection_scale) - 1.0) <= 0.2)


def test_compliance_dose_response():
    """Measured coupled-NE dose-response (module docstring): U-shaped
    with the minimum near nominal — compliance is non-increasing on the
    super-nominal tail and eventually crossed, while the exact-zero
    level is singular and honestly counts as non-compliant."""
    s, net, dev = make_setup(("net2", 5, True))
    scen = monte_carlo_scenarios(0, 6, net, s)
    # pick the limit from the nominal solve so level 1 is compliant
    frac1, sm1 = compliance_fraction(net, dev, s, scen, thd_limit=1.0)
    assert frac1 == 1.0
    limit = 1.5 * float(np.max(np.asarray(sm1.max_thd_f)))
    fracs = [compliance_fraction(net, dev, s,
                                 scale_scenarios(scen, lvl),
                                 thd_limit=limit)[0]
             for lvl in (1.0, 2.0, 4.0, 8.0, 16.0)]
    assert fracs[0] == fracs[1] == 1.0
    # super-nominal tail: more penetration can only hurt
    assert all(a >= b for a, b in zip(fracs[1:], fracs[2:]))
    assert fracs[-1] < 1.0
    # level 0 exactly: zero harmonic phasors -> singular Jacobian -> the
    # sweep reports non-convergence, which counts as non-compliant
    frac0, sm0 = compliance_fraction(
        net, dev, s, scale_scenarios(scen, 0.0), thd_limit=1.0)
    assert frac0 == 0.0
    assert not np.any(np.asarray(sm0.converged))


def test_find_hosting_capacity_bracket_invariants():
    s, net, dev = make_setup(("net2", 5, True))
    scen = monte_carlo_scenarios(1, 4, net, s)
    _, sm = compliance_fraction(net, dev, s, scen, thd_limit=1.0)
    limit = 1.5 * float(np.max(np.asarray(sm.max_thd_f)))
    out = find_hosting_capacity(net, dev, s, scen, confidence=1.0,
                                thd_limit=limit, lo=1.0, hi=16.0, tol=0.5)
    assert out.feasible and not out.bracket_open
    assert 1.0 <= out.level < 16.0
    assert out.frac_at_level == 1.0
    # the returned level was actually probed compliant, and the bracket
    # is tight: some probed level within tol above it failed
    probed = dict(zip(out.levels, out.fracs))
    assert probed[out.level] == 1.0
    fails = [l for l, f in probed.items() if f < 1.0]
    assert min(fails) - out.level <= 0.5 + 1e-12
    # re-probing the returned level reproduces the compliance claim
    f_chk, _ = compliance_fraction(
        net, dev, s, scale_scenarios(scen, out.level), thd_limit=limit)
    assert f_chk == 1.0


def test_find_hosting_capacity_infeasible_and_open():
    s, net, dev = make_setup(("net2", 5, True))
    scen = monte_carlo_scenarios(2, 3, net, s)
    out = find_hosting_capacity(net, dev, s, scen, confidence=1.0,
                                thd_limit=1e-9, lo=1.0, hi=2.0)
    assert not out.feasible and math.isnan(out.level)
    assert len(out.levels) == 1          # stopped after the lo probe
    out = find_hosting_capacity(net, dev, s, scen, confidence=1.0,
                                thd_limit=1.0, lo=1.0, hi=1.5)
    assert out.feasible and out.bracket_open and out.level == 1.5
    assert len(out.levels) == 2          # lo + hi only


def test_device_mask_capacity_weakly_larger():
    """Growing one device while six stay at base supports at least the
    lockstep capacity (net1: 7 smps buses)."""
    s, net, dev = make_setup(("net1", 5, False))
    scen = monte_carlo_scenarios(3, 3, net, s)
    _, sm = compliance_fraction(net, dev, s, scen, thd_limit=1.0)
    limit = 1.2 * float(np.max(np.asarray(sm.max_thd_f)))
    kw = dict(confidence=1.0, thd_limit=limit, lo=1.0, hi=16.0, tol=0.5)
    all_dev = find_hosting_capacity(net, dev, s, scen, **kw)
    mask = jnp.zeros(net.n_nonlinear).at[0].set(1.0)
    one_dev = find_hosting_capacity(net, dev, s, scen, device_mask=mask,
                                    **kw)
    assert all_dev.feasible and one_dev.feasible
    assert one_dev.level >= all_dev.level - 1e-12


def test_ieee519_criterion_path():
    s, net, dev = make_setup(("net2", 25, True))
    scen = monte_carlo_scenarios(4, 3, net, s)
    frac, summary = compliance_fraction(net, dev, s, scen,
                                        criterion="ieee519", v_kv=10.0)
    assert isinstance(summary, hpfx.IEEE519Summary)
    assert 0.0 <= frac <= 1.0
    with pytest.raises(ValueError, match="criterion"):
        compliance_fraction(net, dev, s, scen, criterion="nope")


def test_cli_capacity(capsys):
    from hpfx.__main__ import main
    net2 = ("--buses", os.path.join(DATA, "net2_buses.csv"),
            "--lines", os.path.join(DATA, "net2_lines.csv"))
    rc = main(["capacity", *net2, "--hmax", "5", "--batch", "4",
               "--limit", "0.5", "--hi", "6.0", "--tol", "0.25",
               "--confidence", "1.0"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "hosting capacity" in out
    assert "compliant" in out
    # scoping to a non-nonlinear bus is rejected cleanly
    rc = main(["capacity", *net2, "--hmax", "5", "--batch", "2",
               "--bus", "0"])
    assert rc == 2
