"""hpfx.studies — percentile assessment + quasi-static time series.

Statistics are checked against hand-computed numpy reductions on
fabricated results (fast), and the study entry points end-to-end on net2
(small batches).  The key invariant throughout: non-converged rows never
shift a percentile (NaN-masking), and the converged fraction is reported.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hpfx
from hpfx.harmonic import HPFResult
from hpfx.studies import _masked_rows

from conftest import make_setup


@pytest.fixture(scope="module")
def net2():
    return make_setup(("net2", 25, True))


def _fake_result(V_m, converged):
    B = V_m.shape[0]
    z = jnp.zeros((B,))
    return HPFResult(V_m=jnp.asarray(V_m), V_a=jnp.zeros_like(V_m),
                     err=z, n_iter=z.astype(jnp.int32),
                     err_hist=jnp.zeros((B, 1)),
                     converged=jnp.asarray(converged))


def test_summarize_quantiles_matches_numpy_and_masks_nonconverged():
    rng = np.random.default_rng(7)
    B, H, n = 40, 4, 3
    V_m = rng.uniform(0.9, 1.1, (B, H, n))
    V_m[:, 1:] *= 0.05                       # harmonic content ~5%
    conv = rng.uniform(size=B) > 0.25
    # poison every non-converged row: must not move any statistic
    V_m[~conv] = 1e6
    s = hpfx.settings_for_hmax(7, coupled=True)  # 4 odd orders 1,3,5,7
    qa = hpfx.summarize_quantiles(_fake_result(V_m, conv), s,
                                  quantiles=(0.5, 0.95),
                                  thd_limit=0.08)

    kept = V_m[conv]
    thd = np.sqrt((kept[:, 1:] ** 2).sum(1)) / kept[:, 0]
    np.testing.assert_allclose(np.asarray(qa.thd_q),
                               np.quantile(thd, [0.5, 0.95], axis=0),
                               rtol=1e-12)
    ratio = 100.0 * kept[:, 1:] / kept[:, :1]
    np.testing.assert_allclose(np.asarray(qa.vh_pct_q),
                               np.quantile(ratio, [0.5, 0.95], axis=0),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(qa.v1_q),
                               np.quantile(kept[:, 0], [0.5, 0.95], axis=0),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(qa.exceed_prob),
                               (thd > 0.08).mean(0), rtol=1e-12)
    assert qa.converged_frac == pytest.approx(conv.mean())
    assert qa.n_samples == B
    assert qa.worst_bus == int(np.argmax(np.quantile(thd, 0.95, axis=0)))
    assert qa.harmonics == (3, 5, 7)


def test_masked_rows_shapes():
    v = jnp.ones((4, 2, 3))
    m = jnp.asarray([True, False, True, True])
    out = _masked_rows(v, m)
    assert bool(jnp.all(jnp.isnan(out[1]))) and bool(
        jnp.all(out[jnp.asarray([0, 2, 3])] == 1.0))


def test_assess_quantiles_end_to_end(net2):
    s, net, dev = net2
    scen = hpfx.monte_carlo_scenarios(3, 32, net, s,
                                      p_spread=0.15, inj_spread=0.25)
    qa = hpfx.assess_quantiles(net, dev, s, scen,
                               quantiles=(0.5, 0.95, 0.99))
    assert qa.converged_frac == 1.0
    # quantiles are monotone in q, everywhere
    assert bool(jnp.all(qa.thd_q[0] <= qa.thd_q[1] + 1e-15))
    assert bool(jnp.all(qa.thd_q[1] <= qa.thd_q[2] + 1e-15))
    assert bool(jnp.all(qa.vh_pct_q[0] <= qa.vh_pct_q[2] + 1e-12))
    # net2's downstream buses carry heavy distortion at full penetration
    assert float(qa.thd_q[1, qa.worst_bus]) > 0.3
    assert np.asarray(qa.exceed_prob).min() >= 0.0
    assert np.asarray(qa.exceed_prob).max() <= 1.0


def test_check_planning_levels(net2):
    s, net, dev = net2
    scen = hpfx.monte_carlo_scenarios(3, 16, net, s)
    qa = hpfx.assess_quantiles(net, dev, s, scen, quantiles=(0.5, 0.95))
    # generous levels -> compliant; tight -> binding margin negative
    loose = hpfx.check_planning_levels(qa, default_pct=1e3)
    assert loose.compliant and bool(jnp.all(loose.margin_pct >= 0))
    tight = hpfx.check_planning_levels(qa, {5: 0.01}, default_pct=1e3)
    assert not tight.compliant and tight.binding_order == 5
    # margin equals level minus assessed p95, order by order
    np.testing.assert_allclose(
        np.asarray(tight.margin_pct),
        np.asarray(tight.levels_pct)[:, None] - np.asarray(qa.vh_pct_q[1]),
        rtol=1e-12)
    with pytest.raises(ValueError, match="not among the assessed"):
        hpfx.check_planning_levels(qa, quantile=0.99)
    with pytest.raises(ValueError, match="planning level for order"):
        hpfx.check_planning_levels(qa, {2: 1.0})


def test_profile_scenarios_validation():
    s = hpfx.settings_for_hmax(7)
    scen = hpfx.profile_scenarios(s, np.ones(5), inj_profile=np.ones((5, 2)))
    assert scen.batch == 5 and scen.injection_scale.shape == (5, 2)
    with pytest.raises(ValueError, match="time steps"):
        hpfx.profile_scenarios(s, np.ones(5), q_profile=np.ones(4))


def test_run_timeseries_chunking(net2):
    s, net, dev = net2
    prof = hpfx.daily_profile(10, base=0.8, peak=1.1)
    full = hpfx.run_timeseries(net, dev, s, prof)
    parts = hpfx.run_timeseries(net, dev, s, prof, chunk=4)  # 4+4+2
    assert full.V_m.shape == parts.V_m.shape == (10,
                                                 s.n_harmonics, net.n)
    np.testing.assert_allclose(np.asarray(parts.V_m), np.asarray(full.V_m),
                               atol=1e-12)
    assert bool(jnp.all(full.converged))


def test_percentile_compliance(net2):
    s, net, dev = net2
    prof = hpfx.daily_profile(12)
    ts = hpfx.run_timeseries(net, dev, s, prof)
    pc = hpfx.percentile_compliance(ts, s, percentile=100.0)
    # p100 == max over steps, bus by bus
    ratio = 100.0 * np.asarray(ts.V_m)[:, 1:] / np.asarray(ts.V_m)[:, :1]
    thd = 100.0 * np.asarray(
        jax.vmap(hpfx.get_thd)(ts.V_m).THD_F)
    np.testing.assert_allclose(np.asarray(pc.vh_p), ratio.max(0),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(pc.thd_p), thd.max(0), rtol=1e-12)
    # net2 at full penetration violates the <=1kV class limits
    assert not pc.compliant
    assert np.asarray(pc.frac_steps_over).max() == 1.0
    assert pc.converged_frac == 1.0
    # poisoned non-converged step must not move the percentiles
    bad_vm = jnp.concatenate([ts.V_m, jnp.full_like(ts.V_m[:1], 37.0)])
    bad = _fake_result(bad_vm, jnp.concatenate(
        [ts.converged, jnp.asarray([False])]))
    pc2 = hpfx.percentile_compliance(bad, s, percentile=100.0)
    np.testing.assert_allclose(np.asarray(pc2.vh_p), np.asarray(pc.vh_p),
                               rtol=1e-12)
    assert pc2.converged_frac == pytest.approx(12 / 13)


def test_daily_profile_shape():
    prof = hpfx.daily_profile(96, base=0.7, peak=1.15, peak_hour=19.0)
    assert prof.shape == (96,)
    assert prof.min() >= 0.7 - 1e-12 and prof.max() <= 1.15 + 1e-12
    # the peak lands at the requested hour (t = hour/24*T)
    assert abs(int(np.argmax(prof)) - int(19.0 / 24 * 96)) <= 1


def test_metric_quantiles_generic(net2):
    """Crest-factor quantiles over a sweep: vmapped metric + convergence
    masking must agree with a per-scenario numpy loop."""
    s, net, dev = net2
    B = 12
    rng = np.random.default_rng(5)
    scen = hpfx.Scenarios(
        p_scale=jnp.asarray(rng.uniform(0.9, 1.1, B), s.real_dtype),
        injection_scale=jnp.asarray(rng.uniform(0.3, 1.2, B),
                                    s.real_dtype))
    sweep = hpfx.solve.hpf_sweep(net, dev, s, scen)
    metric = lambda m, a: hpfx.waveform_metrics(m, a, s.harmonics).crest
    q = hpfx.metric_quantiles(sweep, s, metric, quantiles=(0.5, 0.95))
    assert q.shape == (2, net.n)
    conv = np.asarray(sweep.converged, bool)
    rows = np.stack([np.asarray(metric(sweep.V_m[b], sweep.V_a[b]))
                     for b in range(B) if conv[b]])
    np.testing.assert_allclose(np.asarray(q)[0],
                               np.quantile(rows, 0.5, axis=0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(q)[1],
                               np.quantile(rows, 0.95, axis=0),
                               rtol=1e-12)
    # quantile of a clean-sine bus stays at sqrt(2)
    assert abs(float(q[1, 0]) - np.sqrt(2)) < 1e-3
