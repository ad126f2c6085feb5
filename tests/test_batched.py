"""Batched (vmapped) solve tests: per-scenario convergence isolation."""
import jax.numpy as jnp
import numpy as np

import hpfx
from hpfx.solve import Scenarios, hosting_capacity_sweep, hpf_single, hpf_sweep

from conftest import make_setup


def test_batch_element_matches_single():
    """Scenario 0 (all multipliers 1) of a batch equals the single solve,
    bit-for-bit semantics aside from batching."""
    cfg = ("net2", 5, True)
    s, net, dev = make_setup(cfg)
    single = hpf_single(net, dev, settings=s)
    scen = Scenarios(
        p_scale=jnp.array([1.0, 1.3, 0.7]),
        q_scale=jnp.array([1.0, 1.1, 0.9]),
        injection_scale=jnp.array([1.0, 1.5, 0.5]))
    batch = hpf_sweep(net, dev, settings=s, scenarios=scen)
    np.testing.assert_allclose(np.asarray(batch.V_m[0]),
                               np.asarray(single.V_m), atol=1e-12)
    np.testing.assert_allclose(np.asarray(batch.V_a[0]),
                               np.asarray(single.V_a), atol=1e-12)
    assert int(batch.n_iter[0]) == int(single.n_iter)


def test_batch_matches_independent_runs():
    """Every scenario in a batch reproduces its own independent solve —
    iteration counts included (the while-loop batching predication works)."""
    cfg = ("net2", 5, False)
    s, net, dev = make_setup(cfg)
    p = jnp.array([0.5, 1.0, 1.5, 2.0])
    scen = Scenarios(p_scale=p, q_scale=p, injection_scale=jnp.ones_like(p))
    batch = hpf_sweep(net, dev, settings=s, scenarios=scen)
    for k in range(4):
        import dataclasses
        net_k = dataclasses.replace(
            net, bus_P=net.bus_P * p[k], bus_Q=net.bus_Q * p[k])
        single = hpf_single(net_k, dev, settings=s)
        assert int(batch.n_iter[k]) == int(single.n_iter), k
        np.testing.assert_allclose(np.asarray(batch.V_m[k]),
                                   np.asarray(single.V_m), atol=1e-10)


def test_diverged_scenario_does_not_poison_batch():
    """A pathological scenario saturates at max_iter while its neighbors
    converge normally (SURVEY §5.3 requirement)."""
    cfg = ("net2", 5, True)
    s, net, dev = make_setup(cfg)
    scen = Scenarios(
        p_scale=jnp.array([1.0, 500.0, 1.0]),  # 500x load: no solution
        q_scale=jnp.array([1.0, 500.0, 1.0]),
        injection_scale=jnp.array([1.0, 1.0, 1.0]))
    batch = hpf_sweep(net, dev, settings=s, scenarios=scen)
    conv = np.asarray(batch.converged)
    assert conv[0] and conv[2] and not conv[1]
    single = hpf_single(net, dev, settings=s)
    np.testing.assert_allclose(np.asarray(batch.V_m[0]),
                               np.asarray(single.V_m), atol=1e-10)
    np.testing.assert_allclose(np.asarray(batch.V_m[2]),
                               np.asarray(single.V_m), atol=1e-10)
    assert np.all(np.isfinite(np.asarray(batch.V_m[0])))


def test_hosting_capacity_summary():
    cfg = ("net2", 25, True)
    s, net, dev = make_setup(cfg)
    inj = jnp.linspace(0.1, 2.0, 8)
    scen = Scenarios(p_scale=jnp.ones(8), q_scale=jnp.ones(8),
                     injection_scale=inj)
    summary = hosting_capacity_sweep(net, dev, settings=s, scenarios=scen,
                                     thd_limit=0.5)
    assert summary.max_thd_f.shape == (8,)
    # summary math is self-consistent (note: THD is NOT monotonic in the
    # injection scale — scaling Y_N moves network resonances)
    thd = np.asarray(summary.max_thd_f)
    assert np.all(np.isfinite(thd[np.asarray(summary.converged)]))
    frac = float(summary.frac_over_limit)
    expect = np.mean((thd > 0.5) & np.asarray(summary.converged))
    np.testing.assert_allclose(frac, expect)


def test_adaptive_sweep_matches_plain():
    """The two-phase adaptive sweep reaches the same solutions (and total
    per-scenario iteration counts) as the plain lockstep sweep."""
    from hpfx.solve import hpf_sweep_adaptive
    cfg = ("net2", 25, True)
    s, net, dev = make_setup(cfg)
    scen = Scenarios(p_scale=jnp.linspace(0.8, 1.2, 12),
                     q_scale=jnp.linspace(0.8, 1.2, 12),
                     injection_scale=jnp.linspace(0.6, 1.6, 12))
    plain = hpf_sweep(net, dev, settings=s, scenarios=scen)
    adaptive = hpf_sweep_adaptive(net, dev, s, scen, phase_iters=8)
    conv_p = np.asarray(plain.converged)
    conv_a = np.asarray(adaptive.converged)
    np.testing.assert_array_equal(conv_a, conv_p)
    sel = conv_p
    np.testing.assert_allclose(np.asarray(adaptive.V_m)[sel],
                               np.asarray(plain.V_m)[sel], atol=1e-9)
    # warm-started phase 2 may need one fewer/more trip at the boundary;
    # allow a small difference but require the same order
    np.testing.assert_allclose(np.asarray(adaptive.n_iter)[sel],
                               np.asarray(plain.n_iter)[sel], atol=2)
    # err_hist semantics match the plain sweep: full (B, max_iter_h) width,
    # phase-2 histories spliced in at the phase-1 offset (the phase-2 warm
    # start resumes from a sign/angle-normalized but numerically equivalent
    # voltage representation, so residuals agree to fp noise, not exactly)
    hist_a = np.asarray(adaptive.err_hist)
    hist_p = np.asarray(plain.err_hist)
    assert hist_a.shape == hist_p.shape == (12, s.max_iter_h)
    both = np.isfinite(hist_a) & np.isfinite(hist_p)
    assert both.any()
    # phase-1 entries come from the same math on the same start: exact
    np.testing.assert_array_equal(hist_a[:, :8][both[:, :8]],
                                  hist_p[:, :8][both[:, :8]])
    # phase-2 trajectories amplify the warm start's fp-level representation
    # change through the NR transient: loose value check only
    np.testing.assert_allclose(hist_a[both], hist_p[both],
                               rtol=5e-2, atol=1e-8)
    # per-scenario: history has exactly n_iter finite entries
    n_fin = np.isfinite(hist_a).sum(axis=1)
    np.testing.assert_array_equal(n_fin[sel], np.asarray(adaptive.n_iter)[sel])


def test_continuation_sweep_matches_plain():
    """Warm-start continuation: same fixed points and convergence as the
    plain sweep, with a measured mean-iteration reduction on a wide
    scenario spread (each stage seeds from the nearest solved neighbor
    instead of the 0.1-pu flat start)."""
    from hpfx.solve import hpf_sweep_continuation
    cfg = ("net2", 25, True)
    s, net, dev = make_setup(cfg)
    B = 24
    scen = Scenarios(p_scale=jnp.linspace(0.8, 1.2, B),
                     q_scale=jnp.linspace(0.8, 1.2, B),
                     injection_scale=jnp.linspace(0.5, 1.6, B))
    plain = hpf_sweep(net, dev, settings=s, scenarios=scen)
    cont = hpf_sweep_continuation(net, dev, s, scen, n_stages=4)
    conv_p = np.asarray(plain.converged)
    conv_c = np.asarray(cont.converged)
    assert conv_p.all() and conv_c.all()
    # both converged below thresh_h from different starts: agreement is
    # bounded by the stopping tolerance, not fp noise
    np.testing.assert_allclose(np.asarray(cont.V_m), np.asarray(plain.V_m),
                               atol=1e-5)
    # the measured win: warm-started stages take fewer NR trips
    mean_p = float(np.mean(np.asarray(plain.n_iter)))
    mean_c = float(np.mean(np.asarray(cont.n_iter)))
    assert mean_c < mean_p, (mean_c, mean_p)


def test_continuation_with_device_axes_and_adaptive():
    """Continuation composes with per-device scales and the adaptive
    straggler re-solve; scenario order is restored exactly."""
    from hpfx.solve import hpf_sweep_continuation
    cfg = ("net2", 25, True)
    s, net, dev = make_setup(cfg)
    B = 10
    rng = np.random.default_rng(0)
    scen = Scenarios(
        p_scale=jnp.asarray(rng.uniform(0.9, 1.1, B)),
        q_scale=jnp.ones(B),
        injection_scale=jnp.asarray(
            rng.uniform(0.6, 1.4, (B, net.n_nonlinear))))
    plain = hpf_sweep(net, dev, settings=s, scenarios=scen)
    cont = hpf_sweep_continuation(net, dev, s, scen, n_stages=3,
                                  phase_iters=10)
    np.testing.assert_array_equal(np.asarray(cont.converged),
                                  np.asarray(plain.converged))
    sel = np.asarray(plain.converged)
    np.testing.assert_allclose(np.asarray(cont.V_m)[sel],
                               np.asarray(plain.V_m)[sel], atol=1e-5)


def test_continuation_divergent_scenario_does_not_poison_neighbors():
    """A truly divergent scenario (500x load) inside a continuation sweep
    must not seed its key-neighbors with its NaN/runaway state: only
    converged states seed later stages, and the rescue flat-starts
    non-finite states instead of no-op'ing on them."""
    from hpfx.solve import hpf_sweep_continuation
    cfg = ("net2", 25, True)
    s, net, dev = make_setup(cfg)
    B = 12
    p = np.ones(B)
    p[5] = 500.0                      # no solution at this load
    scen = Scenarios(p_scale=jnp.asarray(p), q_scale=jnp.asarray(p),
                     injection_scale=jnp.linspace(0.6, 1.4, B))
    plain = hpf_sweep(net, dev, settings=s, scenarios=scen)
    cont = hpf_sweep_continuation(net, dev, s, scen, n_stages=3)
    np.testing.assert_array_equal(np.asarray(cont.converged),
                                  np.asarray(plain.converged))
    assert not bool(cont.converged[5])
    sel = np.asarray(plain.converged)
    assert sel.sum() == B - 1
    np.testing.assert_allclose(np.asarray(cont.V_m)[sel],
                               np.asarray(plain.V_m)[sel], atol=1e-5)
