"""Exact-linear Norton warm start (hpfx.warmstart).

The seed must zero the harmonic current-balance rows exactly at the
solved fundamental (they are linear in rectangular coordinates,
hcne_generalized.py:326-357), and a seeded solve must reach the SAME
fixed point as the reference's flat start (hcne_generalized.py:174-184)
in no more Newton iterations.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import hpfx
from hpfx.cx import Cx
from hpfx.harmonic import current_balance
from hpfx.solve import Scenarios, hpf_sweep
from hpfx.warmstart import norton_warm_start
from hpfx import cx

from conftest import make_setup

CASES = [("net2", 5, True), ("net2", 5, False), ("net3", 25, True)]


@pytest.mark.parametrize("cfg", CASES, ids=lambda c: f"{c[0]}_h{c[1]}_{'c' if c[2] else 'uc'}")
def test_seed_zeroes_harmonic_rows(cfg):
    s, net, dev = make_setup(cfg)
    sc = Scenarios.uniform(1, jnp.float64)
    V_m, V_a = norton_warm_start(net, dev, s, sc)
    from hpfx.ybus import resolve_ybus
    Y, _, _ = resolve_ybus(net, s, None)
    Vc = cx.polar(V_m[0], V_a[0])
    dI = current_balance(Vc, Y, dev, net.m, net.n, V_m[0], V_a[0])
    K, n = s.n_harmonics - 1, net.n
    tail = dI[-(K * n):]
    res = float(jnp.max(jnp.sqrt(tail.re ** 2 + tail.im ** 2)))
    assert res < 1e-9


@pytest.mark.parametrize("cfg", CASES, ids=lambda c: f"{c[0]}_h{c[1]}_{'c' if c[2] else 'uc'}")
def test_seeded_solve_same_fixed_point_fewer_iters(cfg):
    s, net, dev = make_setup(cfg)
    sc = Scenarios.uniform(1, jnp.float64)
    r_flat = hpf_sweep(net, dev, s, sc)
    V0 = norton_warm_start(net, dev, s, sc)
    r_warm = hpf_sweep(net, dev, s, sc, V0=V0)
    assert bool(r_flat.converged[0]) and bool(r_warm.converged[0])
    # both runs stop once err < thresh; the two truncation points straddle
    # the same fixed point to ~|dV| ≈ err/|J| — compare at that level, not
    # the golden-parity 1e-8 (which gates identical iteration SEQUENCES)
    np.testing.assert_allclose(np.asarray(r_warm.V_m), np.asarray(r_flat.V_m),
                               rtol=0, atol=1e-6)
    # wrapped angle difference: a plain `% (2π)` comparison is flaky for
    # true angles within atol of the 0/2π seam (the two runs can land on
    # opposite sides of the modulus)
    da = np.asarray(r_warm.V_a) - np.asarray(r_flat.V_a)
    np.testing.assert_allclose(
        np.abs((da + np.pi) % (2 * np.pi) - np.pi), 0, rtol=0, atol=1e-5)
    assert int(r_warm.n_iter[0]) <= int(r_flat.n_iter[0])


def test_batched_scenarios_match_flat_start_solutions():
    s, net, dev = make_setup(("net2", 5, True))
    B = 3
    sc = Scenarios(p_scale=jnp.array([0.9, 1.0, 1.1]),
                   q_scale=jnp.array([1.0, 1.0, 0.95]),
                   injection_scale=jnp.array([0.8, 1.0, 1.2]))
    r_flat = hpf_sweep(net, dev, s, sc)
    V0 = norton_warm_start(net, dev, s, sc)
    assert V0[0].shape == (B, s.n_harmonics, net.n)
    r_warm = hpf_sweep(net, dev, s, sc, V0=V0)
    assert bool(jnp.all(r_warm.converged))
    np.testing.assert_allclose(np.asarray(r_warm.V_m), np.asarray(r_flat.V_m),
                               rtol=0, atol=1e-6)
    assert bool(jnp.all(r_warm.n_iter <= r_flat.n_iter))


def test_covers_converter_current_sources():
    """Y_N = 0 (converter_device_set) is a special case of the general
    seed — it must reproduce converter_warm_start's exact harmonic rows."""
    s, net, _ = make_setup(("net2", 5, False))
    from hpfx.converters import converter_device_set, converter_warm_start
    conv = converter_device_set(
        net, s, [{"kind": "six_pulse", "I1": 0.1}] * net.n_nonlinear)
    sc = Scenarios.uniform(1, jnp.float64)
    V_m, V_a = norton_warm_start(net, conv, s, sc)
    Vm_ref, Va_ref = converter_warm_start(net, s, conv)
    # harmonic rows agree (converter_warm_start keeps a flat fundamental,
    # the general seed uses the solved fundamental — compare h >= 2 only;
    # with Y_N = 0 the harmonic rows are decoupled from the fundamental)
    np.testing.assert_allclose(np.asarray(V_m[0, 1:]),
                               np.asarray(Vm_ref[1:]), rtol=0, atol=1e-10)


def test_device_sweep_warm_linear_matches_cold():
    """hpf_sweep_device(warm="linear") — the in-program lanes seed —
    reaches the cold schedule's fixed points with fewer trips."""
    from hpfx.solve import hpf_sweep_device
    s, net, dev = make_setup(("net2", 25, True))
    s = s.with_(solver="arrow", layout="lanes")
    B = 16
    rng = np.random.default_rng(3)
    sc = Scenarios(p_scale=jnp.asarray(rng.uniform(0.7, 1.3, B)),
                   q_scale=jnp.asarray(rng.uniform(0.7, 1.3, B)),
                   injection_scale=jnp.asarray(rng.uniform(0.5, 1.5, B)))
    rc = hpf_sweep_device(net, dev, s, sc)
    rw = hpf_sweep_device(net, dev, s, sc, warm="linear")
    assert bool(jnp.all(rc.converged)) and bool(jnp.all(rw.converged))
    np.testing.assert_allclose(np.asarray(rw.V_m), np.asarray(rc.V_m),
                               rtol=0, atol=1e-6)
    assert float(np.mean(rw.n_iter)) < float(np.mean(rc.n_iter))


def test_explicit_v0_threads_through_device_sweep():
    """hpf_sweep_adaptive_lanes(V0=...) takes the batch-major seed."""
    from hpfx.lanes import hpf_sweep_adaptive_lanes
    s, net, dev = make_setup(("net2", 5, True))
    s = s.with_(solver="arrow", layout="lanes")
    sc = Scenarios.uniform(4, jnp.float64)
    V0 = norton_warm_start(net, dev, s, sc)
    rc = hpf_sweep_adaptive_lanes(net, dev, s, sc)
    rw = hpf_sweep_adaptive_lanes(net, dev, s, sc, V0=V0)
    assert bool(jnp.all(rw.converged))
    np.testing.assert_allclose(np.asarray(rw.V_m), np.asarray(rc.V_m),
                               rtol=0, atol=1e-6)
    assert int(np.max(rw.n_iter)) <= int(np.max(rc.n_iter))


def test_rejects_non_device_set():
    s, net, dev = make_setup(("net2", 5, False))
    sc = Scenarios.uniform(1, jnp.float64)
    with pytest.raises(TypeError):
        norton_warm_start(net, object(), s, sc)


def test_lanes_seed_chunked_matches_unchunked(monkeypatch):
    """The lane-chunked seed assembly (memory guard for big dims x big
    batches) must produce the same seed/solution as the one-shot path —
    regression for the chunk-width reshape bug (the assemble closure
    reshaped to the full B instead of the chunk width)."""
    import jax
    from functools import partial

    import hpfx.lanes as lanes_mod
    from hpfx.lanes import hpf_sweep_adaptive_lanes
    from hpfx.solve import Scenarios

    s, net, dev = make_setup(("net2", 25, True))
    s = s.with_(solver="arrow", layout="lanes")
    B = 8
    sc = Scenarios(p_scale=jnp.linspace(0.9, 1.1, B),
                   q_scale=jnp.linspace(0.9, 1.1, B),
                   injection_scale=jnp.linspace(0.8, 1.2, B))
    run = lambda: jax.jit(partial(hpf_sweep_adaptive_lanes, settings=s,
                                  warm="linear"))(net, dev, scenarios=sc)
    one_shot = run()
    # 3 lanes per chunk (non-divisor of 8: exercises the padded tail)
    K, n = s.n_harmonics - 1, net.n
    per_lane = (2 * K * n) ** 2 * jnp.dtype(s.real_dtype).itemsize
    monkeypatch.setattr(lanes_mod, "SEED_CHUNK_BYTES", 3 * per_lane)
    jax.clear_caches()
    chunked = run()
    assert bool(np.all(np.asarray(chunked.converged)))
    np.testing.assert_allclose(np.asarray(chunked.V_m),
                               np.asarray(one_shot.V_m), rtol=0,
                               atol=1e-12)
    np.testing.assert_array_equal(np.asarray(chunked.n_iter),
                                  np.asarray(one_shot.n_iter))
